"""Composite-key (multi-column) sorted_merge_join / auto_join (r3)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df, parts=1):
    import ray.data as rd
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return ds.repartition(parts) if parts > 1 else ds


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _assert_join_matches_pandas(left, right, on, how, parts=6):
    from kgray.stages.join import sorted_merge_join
    got = sorted_merge_join(_ds(left, parts), _ds(right, parts),
                            on=on, how=how).to_pandas()
    exp = left.merge(right, on=on, how=how)
    # pandas degrades unmatched ints to float64; rebuild as nullable
    for c in exp.columns:
        if exp[c].dtype == np.float64 and got[c].dtype != np.float64:
            exp[c] = exp[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


@pytest.fixture()
def two_key_frames():
    rng = np.random.default_rng(52)
    n = 4000
    left = pd.DataFrame({
        "k1": rng.integers(0, 25, n).astype(np.int64),
        "k2": rng.integers(0, 8, n).astype(np.int64),
        "x": rng.integers(0, 10**6, n).astype(np.int64)})
    # hot composite key spanning many blocks
    hot = pd.DataFrame({"k1": np.full(1500, 7, dtype=np.int64),
                        "k2": np.full(1500, 3, dtype=np.int64),
                        "x": np.arange(1500, dtype=np.int64)})
    left = pd.concat([left, hot], ignore_index=True)
    right = pd.DataFrame({
        "k1": rng.integers(0, 25, 600).astype(np.int64),
        "k2": rng.integers(0, 8, 600).astype(np.int64),
        "y": rng.integers(0, 10**6, 600).astype(np.int64)})
    return left, right


@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_composite_join_matches_pandas(ray_session, two_key_frames, how):
    left, right = two_key_frames
    _assert_join_matches_pandas(left, right, ["k1", "k2"], how)


def test_composite_join_null_semantics_per_key_column(ray_session):
    """A null in ANY key column disqualifies the row from matching;
    left/outer keep the unmatched row.  DuckDB is the oracle here —
    pandas merge (wrongly for SQL) matches NA keys to each other."""
    import duckdb

    from kgray.stages.join import sorted_merge_join

    left = pd.DataFrame({
        "k1": pd.array([1, 1, None, 2, None], dtype="Int64"),
        "k2": pd.array([10, None, 10, 20, None], dtype="Int64"),
        "x": pd.array([100, 101, 102, 103, 104], dtype="Int64")})
    right = pd.DataFrame({
        "k1": pd.array([1, 2, None], dtype="Int64"),
        "k2": pd.array([10, 20, 10], dtype="Int64"),
        "y": pd.array([7, 8, 9], dtype="Int64")})
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    sql = {
        "inner": """SELECT l.*, r.y FROM l JOIN r
                    ON l.k1 = r.k1 AND l.k2 = r.k2""",
        "left": """SELECT l.*, r.y FROM l LEFT JOIN r
                   ON l.k1 = r.k1 AND l.k2 = r.k2""",
        "outer": """SELECT COALESCE(l.k1, r.k1) AS k1,
                           COALESCE(l.k2, r.k2) AS k2, l.x, r.y
                    FROM l FULL OUTER JOIN r
                    ON l.k1 = r.k1 AND l.k2 = r.k2""",
    }
    for how in ("inner", "left", "outer"):
        got = sorted_merge_join(_ds(left, 2), _ds(right, 2),
                                on=["k1", "k2"], how=how).to_pandas()
        exp = con.sql(sql[how]).df()
        if how == "outer":
            # the engine emits each unmatched side's own key values;
            # COALESCE in the oracle reproduces that pairing only for
            # matched rows — compare on the full row multiset instead
            for df in (got, exp):
                df["k1"] = df["k1"].astype("Int64")
                df["k2"] = df["k2"].astype("Int64")
        for c in ("x", "y"):
            got[c] = got[c].astype("Int64")
            exp[c] = exp[c].astype("Int64")
        pd.testing.assert_frame_equal(_norm(got), _norm(exp))
    # explicit: (None,10) on either side matched nothing
    got = sorted_merge_join(_ds(left, 2), _ds(right, 2),
                            on=["k1", "k2"], how="inner").to_pandas()
    assert len(got) == 2                       # (1,10) and (2,20) only


def test_composite_join_three_keys_and_single_key_compat(ray_session):
    rng = np.random.default_rng(9)
    left = pd.DataFrame({
        "a": rng.integers(0, 4, 500).astype(np.int64),
        "b": [f"s{i % 3}" for i in range(500)],
        "c": rng.integers(0, 2, 500).astype(np.int64),
        "x": np.arange(500, dtype=np.int64)})
    right = pd.DataFrame({
        "a": rng.integers(0, 4, 60).astype(np.int64),
        "b": [f"s{i % 4}" for i in range(60)],
        "c": rng.integers(0, 2, 60).astype(np.int64),
        "y": np.arange(60, dtype=np.int64)})
    _assert_join_matches_pandas(left, right, ["a", "b", "c"], "inner")
    # the single-string form still works (back compat)
    _assert_join_matches_pandas(left[["a", "x"]].drop_duplicates("a"),
                                right[["a", "y"]].drop_duplicates("a"),
                                "a", "inner", parts=2)


def test_auto_join_composite_routes_to_shuffle(ray_session):
    from kgray.stages.join import auto_join
    left = pd.DataFrame({"k1": np.array([1, 1, 2], dtype=np.int64),
                         "k2": np.array([5, 6, 5], dtype=np.int64),
                         "x": np.array([10, 20, 30], dtype=np.int64)})
    right = pd.DataFrame({"k1": np.array([1, 2], dtype=np.int64),
                          "k2": np.array([5, 5], dtype=np.int64),
                          "y": np.array([7, 8], dtype=np.int64),
                          "z": ["a", "b"]})
    got = (auto_join(_ds(left), _ds(right), on=["k1", "k2"],
                     payload=["y"], broadcast_rows=10**6)
           .to_pandas().sort_values(["k1", "k2"], ignore_index=True))
    assert sorted(got.columns) == ["k1", "k2", "x", "y"]
    exp = (left.merge(right[["k1", "k2", "y"]], on=["k1", "k2"])
           .sort_values(["k1", "k2"], ignore_index=True))
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))
