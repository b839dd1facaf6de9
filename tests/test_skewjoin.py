"""skew_split_join: value-identity vs the plain shuffle join for any
hot-key set, bag fan-out semantics, null keys, detection modes, the
broadcast cap, and the ★Q's DuckDB parity at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _skewed_frames(seed=7, n=20_000, hot_frac=0.35):
    """Left: one key holds ``hot_frac`` of all rows (the sort-partition
    killer); right: 0-3 rows per key (fan-out)."""
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 400, n).astype(np.int64)
    keys[: int(n * hot_frac)] = 77                      # the hot key
    left = pd.DataFrame({"k": keys,
                         "lv": rng.integers(0, 10**6, n).astype(np.int64)})
    rk, rv = [], []
    for key in range(420):                              # 400..419 dangle
        for j in range(int(rng.integers(0, 4))):
            rk.append(key)
            rv.append(key * 1000 + j)
    right = pd.DataFrame({"k": np.array(rk, dtype=np.int64),
                          "rv": np.array(rv, dtype=np.int64)})
    return left, right


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("detect", ["exact", "sketch"])
def test_matches_shuffle_join_on_skew(ray_session, detect):
    from kgray.stages.join import sorted_merge_join
    from kgray.stages.skewjoin import skew_split_join

    left, right = _skewed_frames()
    lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(16)
    rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(8)
    got = skew_split_join(lds, rds, on="k", hot_threshold=500,
                          detect=detect).to_pandas()
    lds2 = rd.from_arrow(pa.Table.from_pandas(left)).repartition(16)
    rds2 = rd.from_arrow(pa.Table.from_pandas(right)).repartition(8)
    exp = sorted_merge_join(lds2, rds2, on="k").to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp[got.columns.tolist()]))
    # the hot key must actually be in the broadcast set (non-vacuous)
    assert (left["k"] == 77).sum() >= 500


def test_duckdb_parity_with_nulls(ray_session):
    from kgray.stages.skewjoin import skew_split_join

    left, right = _skewed_frames(seed=3, n=5_000)
    left.loc[::97, "k"] = None                          # null keys match nothing
    left["k"] = left["k"].astype("Int64")
    lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(9)
    rds = rd.from_arrow(pa.Table.from_pandas(right))
    got = _norm(skew_split_join(lds, rds, on="k",
                                hot_threshold=200).to_pandas())
    got["k"] = got["k"].astype("Int64")   # joined keys are non-null
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = _norm(con.sql(
        "SELECT l.k, l.lv, r.rv FROM l JOIN r ON l.k = r.k").df())
    exp["k"] = exp["k"].astype("Int64")
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()])


def test_no_hot_keys_falls_back(ray_session):
    from kgray.stages.skewjoin import skew_split_join

    left = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                         "lv": np.arange(100, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 100, 2, dtype=np.int64),
                          "rv": np.arange(50, dtype=np.int64)})
    got = skew_split_join(rd.from_arrow(pa.Table.from_pandas(left)),
                          rd.from_arrow(pa.Table.from_pandas(right)),
                          on="k", hot_threshold=5).to_pandas()
    assert len(got) == 50
    assert set(got["k"]) == set(range(0, 100, 2))


def test_broadcast_cap_raises(ray_session):
    from kgray.stages.skewjoin import skew_split_join

    n = 3_000
    left = pd.DataFrame({"k": np.zeros(n, dtype=np.int64),
                         "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": np.zeros(n, dtype=np.int64),
                          "rv": np.arange(n, dtype=np.int64)})
    with pytest.raises(ValueError, match="max_broadcast"):
        skew_split_join(rd.from_arrow(pa.Table.from_pandas(left)),
                        rd.from_arrow(pa.Table.from_pandas(right)),
                        on="k", hot_threshold=10, max_broadcast=100)


def test_engagement_query_duckdb_parity(ray_session):
    import __ray_entry__ as entrymod
    from kgray.pipelines.relational import purchase_value_by_engagement

    sf = "/root/testdata/sf0.001"
    got = _norm(purchase_value_by_engagement(sf).to_pandas())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')")
    exp = _norm(con.sql(
        entrymod.oracle_sql()["purchase_value_by_engagement"]).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                  check_exact=True)
