"""sorted_merge_join and user_sessions: exactness vs pandas references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_join_matches_pandas(ray_session):
    import ray.data as rd
    from kgray.stages.join import sorted_merge_join

    rng = np.random.default_rng(0)
    left = pd.DataFrame({"k": rng.integers(0, 200, 3000),
                         "lv": rng.integers(0, 1000, 3000)})
    right = pd.DataFrame({"k": rng.integers(0, 200, 150),
                          "rv": [f"r{i}" for i in range(150)]})
    lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(7)
    rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(3)
    got = sorted_merge_join(lds, rds, on="k").to_pandas()
    assert str(got["lv"].dtype) == "int64"        # no float degradation
    exp = left.merge(right, on="k", how="inner")
    key = ["k", "lv", "rv"]
    got = got[key].sort_values(key, ignore_index=True)
    exp = exp[key].sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_join_hot_key(ray_session):
    """A key with most of the left rows (spans sorted blocks)."""
    import ray.data as rd
    from kgray.stages.join import sorted_merge_join

    rng = np.random.default_rng(1)
    k = np.where(rng.random(4000) < 0.8, 5, rng.integers(0, 50, 4000))
    left = pd.DataFrame({"k": k, "lv": np.arange(4000)})
    right = pd.DataFrame({"k": np.arange(50), "rv": np.arange(50) * 10})
    got = sorted_merge_join(rd.from_arrow(pa.Table.from_pandas(left)).repartition(10),
                            rd.from_arrow(pa.Table.from_pandas(right)).repartition(2),
                            on="k").to_pandas()
    exp = left.merge(right, on="k", how="inner")
    assert len(got) == len(exp)
    assert got["lv"].sum() == exp["lv"].sum()
    assert got["rv"].sum() == exp["rv"].sum()


def test_user_sessions_matches_pandas(ray_session):
    import duckdb
    from kgray.pipelines.streaming import user_sessions

    got = user_sessions(SF).to_pandas().sort_values("user_id", ignore_index=True)
    exp = duckdb.sql(f"""
        WITH d AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM read_parquet('{SF}/events.parquet')
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        )
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(new_s) AS BIGINT) AS n_sessions
        FROM d GROUP BY user_id ORDER BY user_id
    """).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_join_left_preserves_int_dtypes_and_unmatched(ray_session):
    """how='left': unmatched right ints stay int64 (null-filled), not float64."""
    import ray.data as rd
    from kgray.stages.join import sorted_merge_join

    left = pd.DataFrame({"k": [1, 2, 3, 4, 5], "lv": [10, 20, 30, 40, 50]})
    right = pd.DataFrame({"k": [2, 4], "rv": [200, 400]})
    got = sorted_merge_join(rd.from_arrow(pa.Table.from_pandas(left)).repartition(3),
                            rd.from_arrow(pa.Table.from_pandas(right)),
                            on="k", how="left")
    assert got.schema().base_schema.field("rv").type == pa.int64()
    df = got.to_pandas().sort_values("k", ignore_index=True)
    assert len(df) == 5
    assert df.loc[df.k == 2, "rv"].iloc[0] == 200
    assert df.loc[df.k == 1, "rv"].isna().all()


def test_join_null_keys(ray_session):
    """Null keys never match; left join keeps null-key left rows."""
    import ray.data as rd
    from kgray.stages.join import sorted_merge_join

    left = pa.table({"k": pa.array([1, None, 2, None], type=pa.int64()),
                     "lv": pa.array([10, 11, 12, 13], type=pa.int64())})
    right = pa.table({"k": pa.array([1, 2, None], type=pa.int64()),
                      "rv": pa.array([100, 200, 999], type=pa.int64())})
    inner = sorted_merge_join(rd.from_arrow(left), rd.from_arrow(right),
                              on="k", how="inner").to_pandas()
    assert sorted(inner["lv"]) == [10, 12]          # null keys dropped
    lj = sorted_merge_join(rd.from_arrow(left), rd.from_arrow(right),
                           on="k", how="left").to_pandas()
    assert len(lj) == 4                              # null-key left rows kept
    assert lj.loc[lj["lv"].isin([11, 13]), "rv"].isna().all()


def test_join_full_outer_matches_pandas(ray_session):
    """how='outer': unmatched rows on BOTH sides survive with null
    padding at declared int types; null-key rows of both sides are
    kept unmatched (SQL FULL JOIN); keys span sorted blocks."""
    import numpy as np
    import ray.data as rd
    from kgray.stages.join import sorted_merge_join

    rng = np.random.default_rng(47)
    left = pd.DataFrame({"k": rng.integers(0, 50, 800).astype(np.int64),
                         "lv": np.arange(800, dtype=np.int64)})
    right = pd.DataFrame({"k": rng.integers(25, 75, 700).astype(np.int64),
                          "rv": np.arange(700, dtype=np.int64)})
    got = sorted_merge_join(
        rd.from_arrow(pa.Table.from_pandas(left)).repartition(6),
        rd.from_arrow(pa.Table.from_pandas(right)).repartition(4),
        on="k", how="outer")
    assert got.schema().base_schema.field("lv").type == pa.int64()
    assert got.schema().base_schema.field("rv").type == pa.int64()
    gdf = got.to_pandas()
    exp = left.merge(right, on="k", how="outer")
    key = lambda d: sorted(map(tuple, d.fillna(-1).to_numpy().tolist()))
    assert key(gdf[["k", "lv", "rv"]]) == key(exp[["k", "lv", "rv"]])

    # null keys: both sides' null-key rows survive unmatched
    lt = pa.table({"k": pa.array([1, None], type=pa.int64()),
                   "lv": pa.array([10, 11], type=pa.int64())})
    rt = pa.table({"k": pa.array([2, None], type=pa.int64()),
                   "rv": pa.array([20, 21], type=pa.int64())})
    oj = sorted_merge_join(rd.from_arrow(lt), rd.from_arrow(rt),
                           on="k", how="outer").to_pandas()
    assert len(oj) == 4
    assert oj.loc[oj["lv"] == 11, "rv"].isna().all()
    assert oj.loc[oj["rv"] == 21, "lv"].isna().all()
    assert oj.loc[oj["lv"] == 10, "rv"].isna().all()   # k=1 unmatched
    assert oj.loc[oj["rv"] == 20, "lv"].isna().all()   # k=2 unmatched


def test_join_many_to_many_output_streams(ray_session):
    """k² fan-out per key: output (40k rows) >> input (600 rows) stays exact.
    The operator materializes only the sorted *input*; the joined output
    streams (kgray/stages/join.py scale note)."""
    import ray.data as rd
    from kgray.stages.join import sorted_merge_join

    k = np.repeat(np.arange(10), 20)                # 10 keys × 20 rows each side
    left = pd.DataFrame({"k": k, "lv": np.arange(200)})
    right = pd.DataFrame({"k": k, "rv": np.arange(200) * 3})
    got = sorted_merge_join(rd.from_arrow(pa.Table.from_pandas(left)).repartition(5),
                            rd.from_arrow(pa.Table.from_pandas(right)).repartition(4),
                            on="k").to_pandas()
    exp = left.merge(right, on="k", how="inner")
    assert len(got) == len(exp) == 10 * 20 * 20
    assert got["lv"].sum() == exp["lv"].sum() and got["rv"].sum() == exp["rv"].sum()


def test_broadcast_range_join_kernels(ray_session):
    """Both range-join kernels (disjoint searchsorted / overlapping
    per-interval mask) and both join modes vs a pandas brute force."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kgray.stages.rangejoin import broadcast_range_join

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"id": np.arange(500, dtype="int64"),
                       "v": rng.uniform(-5, 120, 500)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(7)

    def brute(intervals, how):
        rows = []
        for _, r in df.iterrows():
            hits = [iv for iv in intervals if iv[1] <= r.v < iv[2]]
            if hits:
                rows += [(r.id, r.v, iv[0]) for iv in hits]
            elif how == "left":
                rows.append((r.id, r.v, None))
        return sorted(rows, key=lambda x: (x[0], str(x[2])))

    disjoint = [("a", 0.0, 30.0), ("b", 30.0, 80.0), ("c", 80.0, 100.0)]
    overlap = [("x", 0.0, 60.0), ("y", 40.0, 100.0), ("z", 90.0, 95.0)]
    for intervals in (disjoint, overlap):
        tbl = pa.table({"name": pa.array([i[0] for i in intervals]),
                        "lo": pa.array([i[1] for i in intervals]),
                        "hi": pa.array([i[2] for i in intervals])})
        for how in ("inner", "left"):
            got = broadcast_range_join(ds, tbl, value_col="v",
                                       how=how).to_pandas()
            got_rows = sorted(
                [(r.id, r.v, r.name if pd.notna(r.name) else None)
                 for r in got.itertuples()], key=lambda x: (x[0], str(x[2])))
            assert got_rows == brute(intervals, how), (intervals[0], how)


def test_broadcast_join_vs_pandas(ray_session):
    """broadcast_join inner/left vs pandas merge, incl. null keys,
    misses, empty dim, and the duplicate-key rejection."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from kgray.stages.broadcast import broadcast_join

    left_df = pd.DataFrame({
        "k": pd.array([1, 2, 3, 7, None, 2, 9], dtype="Int64"),
        "x": np.arange(7, dtype="int64")})
    dim = pa.table({"k": pa.array([1, 2, 3, 4], type=pa.int64()),
                    "name": pa.array(["a", "b", "c", "d"])})
    left = rd.from_arrow(pa.Table.from_pandas(left_df)).repartition(3)

    for how in ("inner", "left"):
        got = broadcast_join(left, dim, on="k", how=how).to_pandas()
        exp = left_df.merge(dim.to_pandas(), on="k", how=how)
        key = lambda d: sorted(
            (-1 if pd.isna(r.k) else int(r.k), r.x,
             "" if pd.isna(r.name) else str(r.name))
            for r in d.itertuples())
        assert key(got) == key(exp), how

    empty_dim = dim.slice(0, 0)
    assert broadcast_join(left, empty_dim, on="k").count() == 0
    assert broadcast_join(left, empty_dim, on="k", how="left").count() == 7

    dup = pa.table({"k": pa.array([1, 1]), "name": pa.array(["a", "b"])})
    with pytest.raises(ValueError):
        broadcast_join(left, dup, on="k")


def test_bucketed_join_matches_shuffle_plan(ray_session):
    """The co-bucketed zero-shuffle plan returns exactly the shuffle
    sorted-merge-join plan's aggregate, plus an exact additive
    COUNT(DISTINCT orderkey) per priority."""
    import pandas as pd
    import pyarrow.parquet as pq

    from kgray.pipelines.relational import (bucketed_order_revenue,
                                            order_priority_revenue)

    got = bucketed_order_revenue(SF).to_pandas() \
        .sort_values("o_orderpriority", ignore_index=True)
    twin = order_priority_revenue(SF).to_pandas() \
        .sort_values("o_orderpriority", ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["o_orderpriority", "revenue_cents", "n_items"]], twin)

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey"]).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey", "o_orderpriority"]) \
        .to_pandas()
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    want = j.groupby("o_orderpriority")["o_orderkey"].nunique()
    assert dict(zip(got.o_orderpriority, got.n_orders)) == want.to_dict()

    # second call hits the cached layout and agrees with itself
    again = bucketed_order_revenue(SF).to_pandas() \
        .sort_values("o_orderpriority", ignore_index=True)
    pd.testing.assert_frame_equal(got, again)


def test_part_copurchase_matches_pandas(ray_session):
    """Pair expansion must survive orders split across blocks and
    duplicate parts within an order (strict < excludes equal-part row
    pairs, mirroring the SQL self-join)."""
    import itertools

    from collections import Counter

    import ray.data as rd

    from kgray.pipelines.relational import part_copurchase_topk

    got = part_copurchase_topk(SF, k=15).to_pandas()

    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    c = Counter()
    for _, grp in li.groupby("l_orderkey"):
        for a, b in itertools.combinations(sorted(grp.l_partkey), 2):
            if a != b:
                c[(a, b)] += 1
    want = sorted(((n, a, b) for (a, b), n in c.items()),
                  key=lambda t: (-t[0], t[1], t[2]))[:15]
    got_t = list(zip(got.n_copurchase, got.part_a, got.part_b))
    assert got_t == want


# ------------------------------------------------------------- auto_join
def test_auto_join_plans_are_value_identical(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kgray.stages.join import auto_join, sorted_merge_join

    rng = np.random.default_rng(83)
    left = pd.DataFrame({"k": rng.integers(0, 50, 5000).astype(np.int64),
                         "x": rng.integers(0, 10**6, 5000).astype(np.int64)})
    right = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                          "name": [f"n{i}" for i in range(50)]})
    lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(6)

    def run(threshold):
        rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(3)
        return (auto_join(lds, rds, on="k", broadcast_rows=threshold)
                .to_pandas().sort_values(["k", "x"], ignore_index=True))

    small = run(10**6)       # broadcast plan
    large = run(10)          # forced sorted-merge plan
    pd.testing.assert_frame_equal(small[sorted(small.columns)],
                                  large[sorted(large.columns)])
    exp = (left.merge(right, on="k")
           .sort_values(["k", "x"], ignore_index=True))
    pd.testing.assert_frame_equal(small[sorted(small.columns)],
                                  exp[sorted(exp.columns)])


def test_auto_join_dup_key_right_falls_back(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kgray.stages.join import auto_join

    left = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64),
                         "x": np.array([10, 20, 30], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([1, 1, 2], dtype=np.int64),
                          "y": np.array([7, 8, 9], dtype=np.int64)})
    lds = rd.from_arrow(pa.Table.from_pandas(left))
    rds = rd.from_arrow(pa.Table.from_pandas(right))
    # small right but duplicate keys: broadcast_join would reject —
    # the planner must route to the fan-out-safe sorted-merge path
    got = (auto_join(lds, rds, on="k", broadcast_rows=100)
           .to_pandas().sort_values(["k", "y"], ignore_index=True))
    exp = (left.merge(right, on="k")
           .sort_values(["k", "y"], ignore_index=True))
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])
