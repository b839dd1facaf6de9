"""Distributed set ops (stages/setops.py): INTERSECT / EXCEPT / UNION
with DISTINCT semantics vs direct pandas set computations, including
multi-column rows, duplicates on both sides, and SQL set-op null
semantics (NULLs compare equal)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _mk(rows, cols=("x", "y")):
    arrs = {}
    for i, c in enumerate(cols):
        vals = [r[i] for r in rows]
        arrs[c] = pa.array(vals, type=pa.int64())
    return rd.from_arrow(pa.table(arrs))


def test_set_ops_match_pandas(ray_session):
    from kgray.stages.setops import set_op

    rng = np.random.default_rng(13)
    n_l, n_r = 4000, 3500
    left_df = pd.DataFrame({"x": rng.integers(0, 40, n_l),
                            "y": rng.integers(0, 6, n_l)}).astype(np.int64)
    right_df = pd.DataFrame({"x": rng.integers(0, 40, n_r),
                             "y": rng.integers(0, 6, n_r)}).astype(np.int64)
    left = rd.from_arrow(pa.Table.from_pandas(left_df)).repartition(7)
    right = rd.from_arrow(pa.Table.from_pandas(right_df)).repartition(5)

    l_set = set(map(tuple, left_df.itertuples(index=False)))
    r_set = set(map(tuple, right_df.itertuples(index=False)))
    for op, exp in (("intersect", l_set & r_set),
                    ("except", l_set - r_set),
                    ("union", l_set | r_set)):
        got = set(map(tuple, set_op(left, right, op)
                      .to_pandas().itertuples(index=False)))
        assert got == exp, op


def test_set_ops_null_rows_compare_equal(ray_session):
    """SQL set ops: (1, NULL) on both sides intersects; a NULL-only row
    absent on the right survives EXCEPT."""
    from kgray.stages.setops import set_op

    left = rd.from_arrow(pa.table({
        "x": pa.array([1, 1, None, 5], type=pa.int64()),
        "y": pa.array([None, None, 2, 5], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "x": pa.array([1, None], type=pa.int64()),
        "y": pa.array([None, 7], type=pa.int64())}))

    inter = set_op(left, right, "intersect").to_pandas()
    assert len(inter) == 1
    assert inter.iloc[0]["x"] == 1 and pd.isna(inter.iloc[0]["y"])

    exc = set_op(left, right, "except").to_pandas()
    got = {(None if pd.isna(r.x) else int(r.x),
            None if pd.isna(r.y) else int(r.y))
           for r in exc.itertuples(index=False)}
    assert got == {(None, 2), (5, 5)}


def test_pivot_matches_pandas(ray_session):
    """pivot_aggregate == pandas pivot_table over counts and sums,
    including out-of-category pivot values (counted nowhere) and null
    pivot values."""
    from kgray.stages.pivot import pivot_aggregate

    rng = np.random.default_rng(43)
    n = 3000
    cats = ["x", "y", "z"]
    pv = rng.choice(cats + ["other", None], n,
                    p=[0.3, 0.3, 0.2, 0.15, 0.05])
    df = pd.DataFrame({"g": rng.integers(0, 12, n).astype(np.int64),
                       "p": pv,
                       "v": rng.integers(-5, 50, n).astype(np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = pivot_aggregate(ds, group="g", pivot_col="p", categories=cats,
                          value_col="v") \
        .to_pandas().sort_values("g", ignore_index=True)

    for cat in cats:
        exp_n = df.assign(hit=(df["p"] == cat).astype(np.int64)) \
            .groupby("g")["hit"].sum()
        exp_s = df.assign(hv=np.where(df["p"] == cat, df["v"], 0)) \
            .groupby("g")["hv"].sum()
        assert got.set_index("g")[f"n_{cat}"].equals(exp_n)
        assert got.set_index("g")[f"sum_{cat}"].equals(exp_s)


def test_set_op_union_distinct(ray_session):
    from kgray.stages.setops import set_op

    left = _mk([(1, 1), (1, 1), (2, 2)])
    right = _mk([(2, 2), (3, 3)])
    got = set(map(tuple, set_op(left, right, "union")
                  .to_pandas().itertuples(index=False)))
    assert got == {(1, 1), (2, 2), (3, 3)}
