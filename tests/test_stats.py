"""Grouped second-moment statistics (stages/stats.py): semantic parity
with DuckDB's native aggregates, partitioning invariance (bit-for-bit),
SQL null/degenerate semantics, and the int64-product safety guard."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kgray.stages.stats import (grouped_corr, grouped_regression,
                                grouped_var_std)


def _mk(rows, cols):
    return rd.from_arrow(pa.table({c: pa.array(v) for c, v in
                                   zip(cols, zip(*rows))}))


def test_var_std_matches_duckdb_native(ray_session):
    rng = np.random.default_rng(7)
    g = rng.choice(list("abcd"), size=4000).tolist()
    x = rng.integers(-50_000, 50_000, size=4000).tolist()
    ds = rd.from_arrow(pa.table({"g": g, "x": pa.array(x, type=pa.int64())}))

    got = (grouped_var_std(ds.repartition(7), "g", "x")
           .to_pandas().set_index("g").sort_index())
    exp = duckdb.sql("""
        SELECT g, COUNT(*) AS n, SUM(x) AS sum_x,
               var_samp(x) AS v, stddev_samp(x) AS s
        FROM (SELECT UNNEST($g) AS g, UNNEST($x) AS x)
        GROUP BY g ORDER BY g
    """, params={"g": g, "x": x}).df().set_index("g")

    assert got["n"].tolist() == exp["n"].tolist()
    assert got["sum_x"].tolist() == exp["sum_x"].astype(int).tolist()
    np.testing.assert_allclose(got["var_x"], exp["v"], rtol=1e-12)
    np.testing.assert_allclose(got["std_x"], exp["s"], rtol=1e-12)


def test_corr_matches_duckdb_native(ray_session):
    rng = np.random.default_rng(11)
    g = rng.choice(list("ab"), size=3000).tolist()
    x = rng.integers(0, 10_000, size=3000)
    y = (3 * x + rng.integers(-5_000, 5_000, size=3000)).tolist()
    x = x.tolist()
    ds = rd.from_arrow(pa.table({"g": g, "x": pa.array(x, type=pa.int64()),
                                 "y": pa.array(y, type=pa.int64())}))

    got = (grouped_corr(ds.repartition(5), "g", "x", "y")
           .to_pandas().set_index("g").sort_index())
    exp = duckdb.sql("""
        SELECT g, covar_samp(x, y) AS cv, corr(x, y) AS cr
        FROM (SELECT UNNEST($g) AS g, UNNEST($x) AS x, UNNEST($y) AS y)
        GROUP BY g ORDER BY g
    """, params={"g": g, "x": x, "y": y}).df().set_index("g")

    np.testing.assert_allclose(got["covar_xy"], exp["cv"], rtol=1e-12)
    np.testing.assert_allclose(got["corr_xy"], exp["cr"], rtol=1e-12)


def test_partitioning_invariance_bitwise(ray_session):
    """Moment sums are exact integers, so the IEEE finalize sees the
    same operands regardless of block splits — outputs are bitwise
    identical across partitionings (the distributed-determinism claim)."""
    rng = np.random.default_rng(3)
    t = pa.table({"g": rng.choice(list("xyz"), size=999).tolist(),
                  "x": pa.array(rng.integers(-9999, 9999, size=999),
                                type=pa.int64())})
    outs = []
    for parts in (1, 4, 13):
        df = (grouped_var_std(rd.from_arrow(t).repartition(parts), "g", "x")
              .to_pandas().sort_values("g", ignore_index=True))
        outs.append(df)
    for df in outs[1:]:
        # struct-identical including float bit patterns
        assert df.equals(outs[0])


def test_null_and_degenerate_semantics(ray_session):
    ds = _mk([("a", 5, 1), ("a", None, 2), ("a", 7, None),
              ("b", 3, 3),                      # n == 1 -> NULL var
              ("c", 4, 9), ("c", 4, 9)],        # zero variance -> NULL corr
             ["g", "x", "y"])

    v = grouped_var_std(ds, "g", "x").to_pandas().set_index("g")
    # 'a': only non-null x rows counted (2 of 3)
    assert v.loc["a", "n"] == 2
    assert v.loc["b", "n"] == 1 and np.isnan(v.loc["b", "var_x"])
    assert v.loc["c", "var_x"] == 0.0 and v.loc["c", "std_x"] == 0.0

    c = grouped_corr(ds, "g", "x", "y").to_pandas().set_index("g")
    # 'a': rows with either null excluded -> n == 1 -> NULLs
    assert c.loc["a", "n"] == 1 and np.isnan(c.loc["a", "corr_xy"])
    assert np.isnan(c.loc["c", "corr_xy"])      # dx == 0
    assert c.loc["c", "covar_xy"] == 0.0


def test_element_magnitude_guard(ray_session):
    big = 4_000_000_000                          # > floor(sqrt(2^63-1))
    ds = _mk([("a", big), ("a", 1)], ["g", "x"])
    with pytest.raises(Exception, match="int64-safe product bound"):
        grouped_var_std(ds, "g", "x").to_pandas()


def test_regression_matches_duckdb_native(ray_session):
    """slope/intercept vs DuckDB's native regr_slope/regr_intercept
    (float tolerance — the exact-oracle bitwise check is the mirrored
    HUGEINT SQL in the driver gate), plus NULL semantics for n=1 and
    zero x-variance groups."""
    rng = np.random.default_rng(23)
    g = rng.choice(list("ab"), size=3000).tolist()
    x = rng.integers(0, 10_000, size=3000)
    y = (3 * x + rng.integers(-5_000, 5_000, size=3000)).tolist()
    x = x.tolist()
    # degenerate groups: single row, zero x-variance
    g += ["one", "flat", "flat", "flat"]
    x += [5, 7, 7, 7]
    y += [9, 1, 2, 3]
    ds = rd.from_arrow(pa.table({"g": g, "x": pa.array(x, type=pa.int64()),
                                 "y": pa.array(y, type=pa.int64())}))

    got = (grouped_regression(ds.repartition(5), "g", "x", "y")
           .to_pandas().set_index("g").sort_index())
    exp = duckdb.sql("""
        SELECT g, regr_slope(y, x) AS sl, regr_intercept(y, x) AS ic
        FROM (SELECT UNNEST($g) AS g, UNNEST($x) AS x, UNNEST($y) AS y)
        GROUP BY g ORDER BY g
    """, params={"g": g, "x": x, "y": y}).df().set_index("g")

    for grp in ("a", "b"):
        np.testing.assert_allclose(got.loc[grp, "slope"],
                                   exp.loc[grp, "sl"], rtol=1e-9)
        np.testing.assert_allclose(got.loc[grp, "intercept"],
                                   exp.loc[grp, "ic"], rtol=1e-9)
    assert got.loc["one", ["slope", "intercept"]].isna().all()
    assert got.loc["flat", ["slope", "intercept"]].isna().all()
