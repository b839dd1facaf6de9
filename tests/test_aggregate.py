"""sorted_group_aggregate: exactness vs pandas reference, edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _check(df, keys, aggs, ray_session, n_blocks=7):
    import ray.data as rd
    from kgray.stages.aggregate import sorted_group_aggregate

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(n_blocks)
    got = sorted_group_aggregate(ds, keys, aggs).to_pandas()
    got = got.sort_values(keys, ignore_index=True)

    gb = df.groupby(keys, as_index=False).agg({c: f for c, f in aggs})
    exp = gb.sort_values(keys, ignore_index=True)[list(got.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_matches_pandas_int_keys(ray_session):
    rng = np.random.default_rng(0)
    df = pd.DataFrame({"k": rng.integers(0, 50, 2000),
                       "v": rng.integers(0, 100, 2000),
                       "s": [f"s{int(i)}" for i in rng.integers(0, 30, 2000)]})
    _check(df, ["k"], [("v", "sum"), ("s", "min")], ray_session)


def test_matches_pandas_multi_key(ray_session):
    rng = np.random.default_rng(1)
    df = pd.DataFrame({"a": rng.integers(0, 10, 3000),
                       "b": [f"b{int(i)}" for i in rng.integers(0, 7, 3000)],
                       "v": rng.integers(-50, 50, 3000),
                       "w": rng.integers(0, 1000, 3000)})
    _check(df, ["a", "b"], [("v", "sum"), ("w", "max")], ray_session)


def test_hot_key_spanning_blocks(ray_session):
    """One key holds 90% of rows — spans many sorted blocks; support
    must still be exact."""
    rng = np.random.default_rng(2)
    k = np.where(rng.random(5000) < 0.9, 7, rng.integers(0, 20, 5000))
    df = pd.DataFrame({"k": k, "v": np.ones(5000, dtype=np.int64)})
    _check(df, ["k"], [("v", "sum")], ray_session, n_blocks=16)


def test_single_key_single_block(ray_session):
    df = pd.DataFrame({"k": [1, 1, 1], "v": [1, 2, 3]})
    _check(df, ["k"], [("v", "sum")], ray_session, n_blocks=1)


def test_null_group_keys_not_dropped(ray_session):
    """Null keys form ONE group (SQL GROUP BY) — formerly the
    null-poisoned edge mask silently dropped them."""
    import ray.data as rd
    from kgray.stages.aggregate import sorted_group_aggregate

    df = pd.DataFrame({"k": pd.array([1, None, None, 2, None], dtype="Int64"),
                       "v": np.array([10, 1, 2, 20, 4], dtype=np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    got = sorted_group_aggregate(ds, ["k"], [("v", "sum")]).to_pandas()
    assert len(got) == 3
    assert int(got[got["k"].isna()]["v"].iloc[0]) == 7
    assert int(got[got["k"] == 1]["v"].iloc[0]) == 10


def test_rollup_matches_duckdb(ray_session):
    """rollup_aggregate == GROUP BY ROLLUP over two keys (subtotals at
    every prefix + grand total), exact sums/counts."""
    import duckdb
    import ray.data as rd
    from kgray.stages.aggregate import rollup_aggregate

    rng = np.random.default_rng(41)
    n = 4000
    df = pd.DataFrame({
        "a": [f"a{int(i)}" for i in rng.integers(0, 5, n)],
        "b": rng.integers(0, 11, n).astype(np.int64),
        "v": rng.integers(-30, 100, n).astype(np.int64),
        "n1": np.ones(n, dtype=np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(9)
    got = rollup_aggregate(ds, ["a", "b"],
                           [("n1", "sum"), ("v", "sum")]).to_pandas()
    exp = duckdb.sql(
        "SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n1, "
        "CAST(SUM(v) AS BIGINT) AS v FROM df GROUP BY ROLLUP(a, b)").df()

    def norm(d):
        d = d.copy()
        d["a"] = d["a"].fillna("<null>")
        d["b"] = d["b"].fillna(-999).astype(np.int64)
        return d.sort_values(["a", "b"], ignore_index=True)

    pd.testing.assert_frame_equal(norm(got)[["a", "b", "n1", "v"]],
                                  norm(exp)[["a", "b", "n1", "v"]],
                                  check_dtype=False)
