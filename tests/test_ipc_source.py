"""Arrow IPC source: round-trip parity with parquet + cache
fingerprint invalidation + atomic publish."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def test_ipc_twin_round_trip(ray_session, tmp_path):
    from kgray.sources.ipcsrc import documents_to_ipc, read_documents_ipc

    sf = "/root/testdata/sf0.001"
    d = documents_to_ipc(sf, root=str(tmp_path / "ipc"))
    got = read_documents_ipc(d).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    want = pq.read_table(f"{sf}/documents.parquet").to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert got.equals(want[got.columns.tolist()])
    # projection
    got2 = read_documents_ipc(d, columns=["doc_id"]).to_pandas()
    assert got2.columns.tolist() == ["doc_id"]
    assert len(got2) == len(want)


def test_ipc_cache_fingerprint(ray_session, tmp_path):
    """Regenerated source data at the same path invalidates the twin
    (the r2 ADVICE staleness rule)."""
    import pyarrow.parquet as pqw
    from kgray.sources.ipcsrc import documents_to_ipc, read_documents_ipc

    sf = tmp_path / "sfX"
    sf.mkdir()
    root = str(tmp_path / "ipc")
    t1 = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                   "text": pa.array(["a", "b"])})
    pqw.write_table(t1, sf / "documents.parquet")
    d = documents_to_ipc(str(sf), root=root)
    assert read_documents_ipc(d).count() == 2
    # overwrite source; twin must regenerate, not serve stale rows
    t2 = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                   "text": pa.array(["a", "b", "c"])})
    pqw.write_table(t2, sf / "documents.parquet")
    d = documents_to_ipc(str(sf), root=root)
    assert read_documents_ipc(d).count() == 3


def test_sqlite_source_parity(ray_session):
    """The SQLite twin parses back value-identical to the parquet
    events table (ids, types, and IEEE-exact REAL round-trip)."""
    import pyarrow.parquet as pq

    from kgray.sources.sqlitesrc import events_to_sqlite, read_events_sqlite

    sf = "/root/testdata/sf0.001"
    got = read_events_sqlite(events_to_sqlite(sf)).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    exp = pq.read_table(f"{sf}/events.parquet",
                        columns=["event_id", "user_id", "event_type",
                                 "value"]).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_orc_twin_round_trip(ray_session, tmp_path):
    """The ORC twin parses back value-identical to the parquet orders
    table; projection is pushed into the stripe read."""
    import pyarrow.parquet as pq

    from kgray.sources.orcsrc import orders_to_orc, read_orders_orc

    sf = "/root/testdata/sf0.001"
    d = orders_to_orc(sf, root=str(tmp_path / "orc"))
    got = read_orders_orc(d).to_pandas().sort_values(
        "o_orderkey", ignore_index=True)
    want = pq.read_table(f"{sf}/orders.parquet").to_pandas().sort_values(
        "o_orderkey", ignore_index=True)
    assert got.equals(want[got.columns.tolist()])
    got2 = read_orders_orc(d, columns=["o_orderkey"]).to_pandas()
    assert got2.columns.tolist() == ["o_orderkey"]
    assert len(got2) == len(want)


def test_orc_cache_fingerprint(ray_session, tmp_path):
    """Regenerated orders.parquet at the same path invalidates the ORC
    twin (fingerprint + atomic publish, the r2 ADVICE cache rule)."""
    import pyarrow.parquet as pqw

    from kgray.sources.orcsrc import orders_to_orc, read_orders_orc

    sf = tmp_path / "sfY"
    sf.mkdir()
    root = str(tmp_path / "orc")
    t1 = pa.table({"o_orderkey": pa.array([1, 2], type=pa.int64()),
                   "o_totalprice": pa.array([1.5, 2.5])})
    pqw.write_table(t1, sf / "orders.parquet")
    d = orders_to_orc(str(sf), root=root)
    assert read_orders_orc(d).count() == 2
    t2 = pa.table({"o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
                   "o_totalprice": pa.array([1.5, 2.5, 3.5])})
    pqw.write_table(t2, sf / "orders.parquet")
    d = orders_to_orc(str(sf), root=root)
    assert read_orders_orc(d).count() == 3


def test_hive_twin_round_trip_and_prune(ray_session, tmp_path):
    """The hive twin re-attaches the partition column value-identically
    to the flat parquet events table, and a partition predicate prunes
    at the DIRECTORY level: files of other partitions are never kept."""
    import pyarrow.parquet as pq

    from kgray.sources.hivesrc import (events_to_hive, pruned_files,
                                       read_events_hive)

    sf = "/root/testdata/sf0.001"
    d = events_to_hive(sf, root=str(tmp_path / "hive"))
    want = pq.read_table(f"{sf}/events.parquet").to_pandas().sort_values(
        "event_id", ignore_index=True)
    got = read_events_hive(d).to_pandas().sort_values(
        "event_id", ignore_index=True)
    assert got[want.columns.tolist()].equals(want)
    # the prune decision: one partition value keeps only its own files
    kept, total = pruned_files(d, values=["purchase"])
    n_parts = want["event_type"].nunique()
    assert total == n_parts * 4 and len(kept) == 4
    assert all("event_type=purchase" in f for f in kept)
    # pruned read == WHERE filter over the flat view
    got_p = read_events_hive(d, values=["purchase"]).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    want_p = want[want["event_type"] == "purchase"].reset_index(drop=True)
    assert got_p[want_p.columns.tolist()].equals(want_p)
    # projecting away the partition column skips the attach stage
    got2 = read_events_hive(d, values=["purchase"],
                            columns=["user_id", "value"]).to_pandas()
    assert got2.columns.tolist() == ["user_id", "value"]
    assert len(got2) == len(want_p)


def test_hive_cache_fingerprint(ray_session, tmp_path):
    """Regenerated events.parquet at the same path invalidates the hive
    twin (fingerprint + atomic publish, the r2 ADVICE cache rule)."""
    import pyarrow.parquet as pqw

    from kgray.sources.hivesrc import events_to_hive, read_events_hive

    sf = tmp_path / "sfZ"
    sf.mkdir()
    root = str(tmp_path / "hive")
    t1 = pa.table({"event_id": pa.array([1, 2], type=pa.int64()),
                   "event_type": pa.array(["a", "b"])})
    pqw.write_table(t1, sf / "events.parquet")
    d = events_to_hive(str(sf), root=root)
    assert read_events_hive(d).count() == 2
    t2 = pa.table({"event_id": pa.array([1, 2, 3], type=pa.int64()),
                   "event_type": pa.array(["a", "b", "a"])})
    pqw.write_table(t2, sf / "events.parquet")
    d = events_to_hive(str(sf), root=root)
    assert read_events_hive(d).count() == 3
