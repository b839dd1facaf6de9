"""Schema-evolution source: union-by-name conformance, projection
pruning, cache staleness, and the ★Q's DuckDB parity at sf0.001."""

import os

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_twin_layout_and_cache(tmp_path):
    from kgray.sources.evolve import events_to_evolved

    root = str(tmp_path / "evolved")
    out = events_to_evolved(SF, root=root)
    assert sorted(os.listdir(out)) == ["_DONE", "epoch=0", "epoch=1"]
    s0 = pq.read_schema(os.path.join(out, "epoch=0", "part-0000.parquet"))
    s1 = pq.read_schema(os.path.join(out, "epoch=1", "part-0000.parquet"))
    assert "props" not in s0.names and "props" in s1.names
    # second call is a cache hit (same dir, same _DONE content)
    fp = open(os.path.join(out, "_DONE")).read()
    assert events_to_evolved(SF, root=root) == out
    assert open(os.path.join(out, "_DONE")).read() == fp


def test_reader_conforms_union_schema(ray_session, tmp_path):
    from kgray.sources.evolve import events_to_evolved, read_events_evolved

    out = events_to_evolved(SF, root=str(tmp_path / "evolved"))
    df = read_events_evolved(out).to_pandas()
    src = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert len(df) == len(src)
    assert set(df.columns) == set(src.columns)
    # props is null exactly on epoch-0 rows (event_id % 3 == 0)
    null_ids = set(df.loc[df["props"].isna(), "event_id"])
    assert null_ids == set(src.loc[src["event_id"] % 3 == 0, "event_id"])
    # non-null props match the source byte-for-byte
    m = df.dropna(subset=["props"]).set_index("event_id")["props"]
    s = src.set_index("event_id")["props"]
    assert (m == s.loc[m.index]).all()


def test_reader_projection(ray_session, tmp_path):
    from kgray.sources.evolve import events_to_evolved, read_events_evolved

    out = events_to_evolved(SF, root=str(tmp_path / "evolved"))
    df = read_events_evolved(out, columns=["event_id", "props"]).to_pandas()
    assert list(df.columns) == ["event_id", "props"]


def test_evolved_event_stats_parity(ray_session):
    import __ray_entry__ as entrymod
    from kgray.pipelines.relational import evolved_event_stats

    got = evolved_event_stats(SF).to_pandas()
    got = got.reindex(sorted(got.columns), axis=1).sort_values(
        by=list(sorted(got.columns)), ignore_index=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    exp = con.sql(entrymod.oracle_sql()["evolved_event_stats"]).df()
    exp = exp.reindex(sorted(exp.columns), axis=1).sort_values(
        by=list(sorted(exp.columns)), ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                  check_exact=True)
