"""grouped_string_agg (ordered string aggregation) and unpivot:
exactness vs pandas references, hot keys spanning blocks, null keys,
null-cell skipping, pivot↔unpivot round trip."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _string_agg_expected(df, key, order_cols, value_col, sep):
    srt = df.sort_values([key] + order_cols, kind="mergesort")
    g = srt.groupby(key, dropna=False)
    return pd.DataFrame({
        key: list(g.groups.keys()),
        "n": g[value_col].count().to_numpy().astype(np.int64),
        "agg": g[value_col].agg(lambda s: sep.join(s)).to_numpy(),
    }).sort_values(key, ignore_index=True)


def _run_string_agg(df, ray_session, n_blocks=7, sep=","):
    import ray.data as rd
    from kgray.stages.stringagg import grouped_string_agg

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(n_blocks)
    got = grouped_string_agg(ds, key="k", order_cols=["o", "tb"],
                             value_col="v", sep=sep).to_pandas()
    return got.sort_values("k", ignore_index=True)


def test_string_agg_matches_pandas(ray_session):
    rng = np.random.default_rng(0)
    n = 3000
    df = pd.DataFrame({"k": rng.integers(0, 40, n),
                       "o": rng.integers(0, 10, n),
                       "tb": np.arange(n, dtype=np.int64),  # unique tiebreak
                       "v": [f"w{int(i)}" for i in rng.integers(0, 9, n)]})
    got = _run_string_agg(df, ray_session)
    exp = _string_agg_expected(df, "k", ["o", "tb"], "v", ",")
    got["agg"] = got["agg"].astype(str)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_string_agg_hot_key_spans_blocks(ray_session):
    """90% of rows share one key — its run crosses many sorted blocks;
    the per-block partials must concatenate in global order."""
    rng = np.random.default_rng(1)
    n = 5000
    k = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 15, n))
    df = pd.DataFrame({"k": k, "o": rng.integers(0, 1000, n),
                       "tb": np.arange(n, dtype=np.int64),
                       "v": [f"t{i % 11}" for i in range(n)]})
    got = _run_string_agg(df, ray_session, n_blocks=16)
    exp = _string_agg_expected(df, "k", ["o", "tb"], "v", ",")
    pd.testing.assert_frame_equal(got.astype({"agg": str}), exp,
                                  check_dtype=False)


def test_string_agg_single_key_and_custom_sep(ray_session):
    df = pd.DataFrame({"k": [1] * 5, "o": [5, 4, 3, 2, 1],
                       "tb": [0, 1, 2, 3, 4],
                       "v": ["e", "d", "c", "b", "a"]})
    got = _run_string_agg(df, ray_session, n_blocks=3, sep="|")
    assert got["agg"].tolist() == ["a|b|c|d|e"]
    assert got["n"].tolist() == [5]


def test_string_agg_null_keys_one_group(ray_session):
    import ray.data as rd
    from kgray.stages.stringagg import grouped_string_agg

    df = pd.DataFrame({"k": pd.array([1, None, None, 2], dtype="Int64"),
                       "o": np.array([0, 1, 0, 0], dtype=np.int64),
                       "tb": np.array([0, 1, 2, 3], dtype=np.int64),
                       "v": ["a", "y", "x", "b"]})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    got = grouped_string_agg(ds, "k", ["o", "tb"], "v").to_pandas()
    null_rows = got[got["k"].isna()]
    assert len(null_rows) == 1
    assert null_rows["agg"].iloc[0] == "x,y"


def test_unpivot_matches_melt_and_skips_nulls(ray_session):
    import ray.data as rd
    from kgray.stages.pivot import unpivot

    df = pd.DataFrame({"id": [1, 2, 3],
                       "a": pd.array([10, None, 30], dtype="Int64"),
                       "b": pd.array([40, 50, None], dtype="Int64")})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(2)
    got = (unpivot(ds, id_cols=["id"], value_cols=["a", "b"],
                   var_name="col", value_name="val")
           .to_pandas().sort_values(["id", "col"], ignore_index=True))
    exp = (df.melt(id_vars=["id"], value_vars=["a", "b"],
                   var_name="col", value_name="val")
           .dropna(subset=["val"])
           .sort_values(["id", "col"], ignore_index=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_pivot_unpivot_round_trip(ray_session):
    """unpivot(pivot(x)) recovers the per-(group, category) sums."""
    import ray.data as rd
    from kgray.stages.pivot import pivot_aggregate, unpivot

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({"g": rng.integers(0, 6, n),
                       "c": rng.choice(["F", "O", "P"], n),
                       "v": rng.integers(0, 100, n).astype(np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    wide = pivot_aggregate(ds, group="g", pivot_col="c",
                           categories=["F", "O", "P"], value_col="v")
    long = (unpivot(wide, id_cols=["g"],
                    value_cols=["sum_F", "sum_O", "sum_P"],
                    var_name="cat", value_name="v")
            .to_pandas())
    long["c"] = long["cat"].str.removeprefix("sum_")
    got = long[["g", "c", "v"]].sort_values(["g", "c"], ignore_index=True)
    exp = (df.groupby(["g", "c"], as_index=False)["v"].sum()
           .sort_values(["g", "c"], ignore_index=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
