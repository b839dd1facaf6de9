"""asof_join and grouped_topk stages: brute-force equality including
key runs that span sorted-block boundaries, unmatched lefts, ties."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _brute_asof(left_df, right_df):
    """Per-row reference: greatest right t ≤ left t within the key."""
    out = []
    for _, r in left_df.iterrows():
        cand = right_df[(right_df["k"] == r["k"]) & (right_df["rt"] <= r["lt"])]
        if len(cand):
            best = cand.sort_values(["rt", "payload"]).iloc[-1]
            out.append(best["payload"])
        else:
            out.append(None)
    return out


def test_asof_join_matches_bruteforce(ray_session):
    from kgray.stages.asof import asof_join

    rng = np.random.default_rng(7)
    n_l, n_r = 4000, 1500
    left_df = pd.DataFrame({
        "k": rng.integers(0, 40, n_l).astype(np.int64),
        "lt": rng.integers(0, 10_000, n_l).astype(np.int64),
        "lid": np.arange(n_l, dtype=np.int64),
    })
    right_df = pd.DataFrame({
        "k": rng.integers(0, 40, n_r).astype(np.int64),
        "rt": rng.integers(0, 10_000, n_r).astype(np.int64),
    })
    # determinism contract: one right row per (k, t) — keep max payload
    right_df["payload"] = np.arange(n_r, dtype=np.int64)
    right_df = (right_df.groupby(["k", "rt"], as_index=False)
                .agg(payload=("payload", "max")))

    left = rd.from_arrow(pa.Table.from_pandas(left_df)).repartition(9)
    right = rd.from_arrow(pa.Table.from_pandas(right_df)).repartition(5)
    got = asof_join(left, right, key="k", left_t="lt", right_t="rt") \
        .to_pandas().sort_values("lid").reset_index(drop=True)

    expect = _brute_asof(left_df, right_df)
    exp_series = pd.Series(expect, dtype="object")
    got_sorted = got.set_index("lid").loc[left_df["lid"]]["payload"]
    assert len(got) == n_l
    for g, e in zip(got_sorted.tolist(), exp_series.tolist()):
        if e is None:
            assert pd.isna(g)
        else:
            assert g == e


def test_asof_join_equal_times_and_all_unmatched(ray_session):
    from kgray.stages.asof import asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "lt": pa.array([5, 4, 9], type=pa.int64()),
        "lid": pa.array([0, 1, 2], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], type=pa.int64()),
        "rt": pa.array([5, 3], type=pa.int64()),
        "payload": pa.array([100, 50], type=pa.int64())}))
    got = asof_join(left, right, key="k", left_t="lt", right_t="rt") \
        .to_pandas().set_index("lid")
    assert got.loc[0, "payload"] == 100     # rt == lt matches
    assert got.loc[1, "payload"] == 50      # backward to 3
    assert pd.isna(got.loc[2, "payload"])   # key 2 has no right rows


def test_grouped_topk_matches_pandas(ray_session):
    from kgray.stages.topk import grouped_topk

    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame({
        "g": rng.integers(0, 25, n).astype(np.int64),
        "v": rng.integers(0, 50, n).astype(np.int64),   # many ties
        "tb": np.arange(n, dtype=np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(11)
    got = grouped_topk(ds, group="g", order_col="v", tiebreak="tb", k=4) \
        .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True)

    df2 = df.sort_values(["g", "v", "tb"], ascending=[True, False, True])
    df2["rank"] = df2.groupby("g").cumcount() + 1
    exp = df2[df2["rank"] <= 4].sort_values(["g", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "v", "tb", "rank"]],
                                  exp[["g", "v", "tb", "rank"]])


def test_grouped_topk_small_groups(ray_session):
    from kgray.stages.topk import grouped_topk

    ds = rd.from_arrow(pa.table({
        "g": pa.array([1, 1, 2], type=pa.int64()),
        "v": pa.array([10, 20, 5], type=pa.int64()),
        "tb": pa.array([0, 1, 2], type=pa.int64())}))
    got = grouped_topk(ds, group="g", order_col="v", tiebreak="tb", k=5) \
        .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True)
    assert got["rank"].tolist() == [1, 2, 1]
    assert got["v"].tolist() == [20, 10, 5]


def test_grouped_quantiles_matches_duckdb_rule(ray_session):
    """Exact per-group quantile_disc semantics: index ceil(q*n)-1 of
    the ascending run — checked against a direct per-group computation
    with heavy duplication and groups spanning sorted blocks."""
    import math

    from kgray.stages.quantile import grouped_quantiles

    rng = np.random.default_rng(3)
    n = 6000
    df = pd.DataFrame({
        "g": rng.integers(0, 13, n).astype(np.int64),
        "v": rng.integers(0, 30, n).astype(np.int64),   # heavy ties
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(10)
    got = grouped_quantiles(ds, group="g", value_col="v",
                            qs=[0.5, 0.95], out_names=["p50", "p95"]) \
        .to_pandas().sort_values("g").reset_index(drop=True)

    exp_rows = []
    for g, sub in df.groupby("g"):
        vals = np.sort(sub["v"].to_numpy())
        m = len(vals)
        row = {"g": g, "n": m}
        for q, nm in ((0.5, "p50"), (0.95, "p95")):
            row[nm] = vals[max(0, math.ceil(q * m) - 1)]
        exp_rows.append(row)
    exp = pd.DataFrame(exp_rows).sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "n", "p50", "p95"]],
                                  exp[["g", "n", "p50", "p95"]])


def test_semi_and_anti_join(ray_session):
    """semi/anti keep exactly the EXISTS / NOT-EXISTS left rows; null
    keys match nothing (kept by anti, dropped by semi); keys span
    sorted-block boundaries."""
    from kgray.stages.semijoin import semi_join

    rng = np.random.default_rng(5)
    n = 3000
    k = rng.integers(0, 60, n).astype(np.float64)
    k[rng.random(n) < 0.02] = np.nan                    # some null keys
    left_df = pd.DataFrame({"k": pd.array([None if np.isnan(x) else int(x) for x in k],
                                          dtype="Int64"),
                            "lid": np.arange(n, dtype=np.int64)})
    right_keys = np.unique(rng.integers(0, 60, 40)).astype(np.int64)
    right_df = pd.DataFrame({"k": np.repeat(right_keys, 3),   # dup right rows
                             "junk": np.arange(len(right_keys) * 3)})

    left = rd.from_arrow(pa.Table.from_pandas(left_df)).repartition(7)
    right = rd.from_arrow(pa.Table.from_pandas(right_df)).repartition(3)

    in_right = left_df["k"].isin(right_keys)
    exp_semi = set(left_df.loc[in_right.fillna(False), "lid"])
    exp_anti = set(left_df["lid"]) - exp_semi           # null keys → anti

    got_semi = set(semi_join(left, right.select_columns(["k"]), on="k")
                   .to_pandas()["lid"])
    got_anti = set(semi_join(left, right.select_columns(["k"]), on="k",
                             anti=True).to_pandas()["lid"])
    assert got_semi == exp_semi
    assert got_anti == exp_anti


def test_grouped_topk_hot_group(ray_session):
    """A group holding most rows (spanning many sorted blocks) must
    still rank exactly — the edge pass caps its driver shipment at k
    rows per block, which is provably a superset of the global top-k."""
    from kgray.stages.topk import grouped_topk

    rng = np.random.default_rng(23)
    n = 20000
    g = np.where(rng.random(n) < 0.6, 7, rng.integers(0, 5, n)).astype(np.int64)
    df = pd.DataFrame({"g": g,
                       "v": rng.integers(0, 10_000, n).astype(np.int64),
                       "tb": np.arange(n, dtype=np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(16)
    got = grouped_topk(ds, group="g", order_col="v", tiebreak="tb", k=3) \
        .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True)

    df2 = df.sort_values(["g", "v", "tb"], ascending=[True, False, True])
    df2["rank"] = df2.groupby("g").cumcount() + 1
    exp = df2[df2["rank"] <= 3].sort_values(["g", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "v", "tb", "rank"]],
                                  exp[["g", "v", "tb", "rank"]])


def test_asof_and_windowed_hot_key(ray_session):
    """One key holds ~80% of rows and spans many sorted blocks — the
    carry-in exchange must stay exact while shipping only O(1) (asof)
    / window-bounded (windowed) summaries per block, never the run."""
    from kgray.stages.asof import asof_join, windowed_count_join

    rng = np.random.default_rng(59)
    n_l, n_r, w = 12000, 400, 30
    lk = np.where(rng.random(n_l) < 0.8, 7, rng.integers(0, 5, n_l)) \
        .astype(np.int64)
    left_df = pd.DataFrame({
        "k": lk,
        "lt": rng.integers(0, 5000, n_l).astype(np.int64),
        "lid": np.arange(n_l, dtype=np.int64)})
    rk = np.where(rng.random(n_r) < 0.8, 7, rng.integers(0, 5, n_r)) \
        .astype(np.int64)
    right_df = pd.DataFrame({
        "k": rk,
        "rt": rng.integers(0, 5000, n_r).astype(np.int64)})
    right_df["payload"] = np.arange(n_r, dtype=np.int64)
    right_df = (right_df.groupby(["k", "rt"], as_index=False)
                .agg(payload=("payload", "max")))

    left = rd.from_arrow(pa.Table.from_pandas(left_df)).repartition(16)
    right = rd.from_arrow(pa.Table.from_pandas(right_df)).repartition(8)

    got = asof_join(left, right, key="k", left_t="lt", right_t="rt") \
        .to_pandas().set_index("lid").loc[left_df["lid"], "payload"]
    assert len(got) == n_l
    exp = _brute_asof(left_df, right_df)
    for g, e in zip(got.tolist(), exp):
        if e is None:
            assert pd.isna(g)
        else:
            assert g == e

    wgot = windowed_count_join(left, right, key="k", left_t="lt",
                               right_t="rt", window=w, count_name="cnt") \
        .to_pandas().set_index("lid").loc[left_df["lid"], "cnt"].to_numpy()
    wexp = np.array([((right_df["k"] == r["k"])
                      & (right_df["rt"] >= r["lt"] - w)
                      & (right_df["rt"] <= r["lt"])).sum()
                     for _, r in left_df.iterrows()], dtype=np.int64)
    assert (wgot == wexp).all()


def test_windowed_count_join_matches_bruteforce(ray_session):
    """Per-left trailing-window counts (inclusive bounds) vs a direct
    per-row computation, with key runs spanning sorted blocks."""
    from kgray.stages.asof import windowed_count_join

    rng = np.random.default_rng(17)
    n_l, n_r, w = 3000, 2000, 50
    left_df = pd.DataFrame({
        "k": rng.integers(0, 30, n_l).astype(np.int64),
        "lt": rng.integers(0, 2000, n_l).astype(np.int64),
        "lid": np.arange(n_l, dtype=np.int64)})
    right_df = pd.DataFrame({
        "k": rng.integers(0, 30, n_r).astype(np.int64),
        "rt": rng.integers(0, 2000, n_r).astype(np.int64)})

    left = rd.from_arrow(pa.Table.from_pandas(left_df)).repartition(8)
    right = rd.from_arrow(pa.Table.from_pandas(right_df)).repartition(4)
    got = windowed_count_join(left, right, key="k", left_t="lt",
                              right_t="rt", window=w, count_name="cnt") \
        .to_pandas().set_index("lid").loc[left_df["lid"], "cnt"].to_numpy()

    exp = np.array([((right_df["k"] == r["k"])
                     & (right_df["rt"] >= r["lt"] - w)
                     & (right_df["rt"] <= r["lt"])).sum()
                    for _, r in left_df.iterrows()], dtype=np.int64)
    assert (got == exp).all()


def test_windowed_sum_join_matches_bruteforce(ray_session):
    """Windowed SUM of a right value column (per-run prefix sums) vs a
    direct per-row computation; zero-fill where no right rows match."""
    from kgray.stages.asof import windowed_count_join

    rng = np.random.default_rng(19)
    n_l, n_r, w = 2500, 1800, 40
    left_df = pd.DataFrame({
        "k": rng.integers(0, 25, n_l).astype(np.int64),
        "lt": rng.integers(0, 1500, n_l).astype(np.int64),
        "lid": np.arange(n_l, dtype=np.int64)})
    right_df = pd.DataFrame({
        "k": rng.integers(0, 25, n_r).astype(np.int64),
        "rt": rng.integers(0, 1500, n_r).astype(np.int64),
        "val": rng.integers(-100, 1000, n_r).astype(np.int64)})

    left = rd.from_arrow(pa.Table.from_pandas(left_df)).repartition(8)
    right = rd.from_arrow(pa.Table.from_pandas(right_df)).repartition(4)
    got = windowed_count_join(left, right, key="k", left_t="lt",
                              right_t="rt", window=w, count_name="cnt",
                              value_col="val", sum_name="vsum") \
        .to_pandas().set_index("lid").loc[left_df["lid"]]

    for (_, r), cnt, vsum in zip(left_df.iterrows(),
                                 got["cnt"].to_numpy(),
                                 got["vsum"].to_numpy()):
        m = ((right_df["k"] == r["k"])
             & (right_df["rt"] >= r["lt"] - w)
             & (right_df["rt"] <= r["lt"]))
        assert cnt == m.sum()
        assert vsum == right_df.loc[m, "val"].sum()


def test_null_keys_sql_semantics(ray_session):
    """Null keys must not poison filter masks (the silent-row-loss bug
    class): asof/windowed emit null-key lefts unmatched (SQL: null
    matches nothing); topk/quantile treat null as one real group (SQL
    PARTITION BY / GROUP BY)."""
    from kgray.stages.asof import asof_join, windowed_count_join
    from kgray.stages.quantile import grouped_quantiles
    from kgray.stages.topk import grouped_topk

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 2], type=pa.int64()),
        "lt": pa.array([5, 5, 5], type=pa.int64()),
        "lid": pa.array([0, 1, 2], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, None], type=pa.int64()),
        "rt": pa.array([4, 9, 1], type=pa.int64()),
        "payload": pa.array([10, 20, 30], type=pa.int64())}))

    aj = asof_join(left, right, key="k", left_t="lt", right_t="rt") \
        .to_pandas().set_index("lid").sort_index()
    assert len(aj) == 3                       # no row loss
    assert aj.loc[0, "payload"] == 10
    assert pd.isna(aj.loc[1, "payload"])      # null key matches nothing
    assert pd.isna(aj.loc[2, "payload"])      # right rt=9 > lt=5

    wj = windowed_count_join(left, right, key="k", left_t="lt",
                             right_t="rt", window=10, count_name="cnt") \
        .to_pandas().set_index("lid").sort_index()
    assert wj["cnt"].tolist() == [1, 0, 0]

    gds = rd.from_arrow(pa.table({
        "g": pa.array([1, None, None, 2], type=pa.int64()),
        "v": pa.array([10, 5, 7, 3], type=pa.int64()),
        "tb": pa.array([0, 1, 2, 3], type=pa.int64())}))
    tk = grouped_topk(gds, group="g", order_col="v", tiebreak="tb", k=5) \
        .to_pandas()
    assert len(tk) == 4                       # null group ranked, not lost
    null_rows = tk[tk["g"].isna()].sort_values("rank")
    assert null_rows["v"].tolist() == [7, 5]
    assert null_rows["rank"].tolist() == [1, 2]

    qt = grouped_quantiles(gds, group="g", value_col="v", qs=[0.5],
                           out_names=["p50"]).to_pandas()
    assert len(qt) == 3                       # 1, 2, and the null group
    assert qt[qt["g"].isna()]["p50"].tolist() == [5]
    assert qt[qt["g"].isna()]["n"].tolist() == [2]


def test_grouped_quantiles_cont_matches_duckdb(ray_session):
    """Interpolated quantiles must equal DuckDB quantile_cont
    bit-for-bit, both through the interior path and the low-cardinality
    (every-group-a-boundary-group) histogram path."""
    import duckdb

    from kgray.stages.quantile import grouped_quantiles

    rng = np.random.default_rng(31)
    for n_groups, n in ((17, 6000), (3, 8000)):
        df = pd.DataFrame({
            "g": rng.integers(0, n_groups, n).astype(np.int64),
            "v": rng.integers(0, 400, n).astype(np.int64)})
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(12)
        got = grouped_quantiles(ds, group="g", value_col="v",
                                qs=[0.5, 0.9], out_names=["p50", "p90"],
                                method="cont") \
            .to_pandas().sort_values("g").reset_index(drop=True)
        exp = duckdb.sql(
            "SELECT g, COUNT(*) AS n, quantile_cont(v, 0.5) AS p50, "
            "quantile_cont(v, 0.9) AS p90 FROM df GROUP BY g ORDER BY g"
        ).df()
        assert got["g"].tolist() == exp["g"].tolist()
        assert got["n"].tolist() == exp["n"].tolist()
        # bitwise: no tolerance
        assert got["p50"].tolist() == exp["p50"].tolist()
        assert got["p90"].tolist() == exp["p90"].tolist()


def test_grouped_running_sum_matches_pandas(ray_session):
    """Prefix-scan exchange vs pandas groupby().cumsum(), including a
    hot key spanning many sorted blocks, negative values, and a null
    partition key (one partition, SQL PARTITION BY semantics)."""
    from kgray.stages.scan import grouped_running_sum

    rng = np.random.default_rng(61)
    n = 15000
    k = np.where(rng.random(n) < 0.7, 3, rng.integers(0, 8, n)).astype(np.float64)
    k[rng.random(n) < 0.01] = np.nan
    df = pd.DataFrame({
        "k": pd.array([None if np.isnan(x) else int(x) for x in k],
                      dtype="Int64"),
        "t": rng.integers(0, 10_000, n).astype(np.int64),
        "tb": np.arange(n, dtype=np.int64),
        "v": rng.integers(-50, 100, n).astype(np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(13)
    got = grouped_running_sum(ds, key="k", order_cols=["t", "tb"],
                              value_col="v", out_name="rs") \
        .to_pandas().sort_values("tb", ignore_index=True)

    df2 = df.sort_values(["t", "tb"])
    exp = df2.assign(rs=df2.groupby("k", dropna=False)["v"].cumsum()) \
        .sort_values("tb", ignore_index=True)
    assert len(got) == n
    assert got["rs"].tolist() == exp["rs"].tolist()


def test_grouped_lag_matches_pandas(ray_session):
    """LAG via the carry exchange vs pandas groupby().shift(), with a
    hot key spanning blocks and null partition keys."""
    from kgray.stages.scan import grouped_lag

    rng = np.random.default_rng(67)
    n = 9000
    k = np.where(rng.random(n) < 0.6, 5, rng.integers(0, 6, n)).astype(np.float64)
    k[rng.random(n) < 0.02] = np.nan
    df = pd.DataFrame({
        "k": pd.array([None if np.isnan(x) else int(x) for x in k],
                      dtype="Int64"),
        "t": rng.integers(0, 8000, n).astype(np.int64),
        "tb": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 1000, n).astype(np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(11)
    got = grouped_lag(ds, key="k", order_cols=["t", "tb"],
                      value_col="v", out_name="prev") \
        .to_pandas().sort_values("tb", ignore_index=True)

    df2 = df.sort_values(["t", "tb"])
    exp = df2.assign(prev=df2.groupby("k", dropna=False)["v"].shift(1)) \
        .sort_values("tb", ignore_index=True)
    assert len(got) == n
    for g, e in zip(got["prev"].tolist(), exp["prev"].tolist()):
        if pd.isna(e):
            assert pd.isna(g)
        else:
            assert g == e


def test_grouped_quantiles_low_cardinality(ray_session):
    """Few groups over many partitions: every group is a boundary group
    and the edge pass must still produce exact quantiles (shipping
    (group, value, count) partials, not raw rows)."""
    from kgray.stages.quantile import grouped_quantiles

    rng = np.random.default_rng(29)
    n = 8000
    df = pd.DataFrame({"g": rng.integers(0, 3, n).astype(np.int64),
                       "v": rng.integers(0, 500, n).astype(np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(16)
    got = grouped_quantiles(ds, group="g", value_col="v", qs=[0.5, 0.95],
                            out_names=["p50", "p95"]) \
        .to_pandas().sort_values("g").reset_index(drop=True)
    assert len(got) == 3

    import math
    for _, r in got.iterrows():
        vals = np.sort(df[df["g"] == r["g"]]["v"].to_numpy())
        assert r["n"] == len(vals)
        assert r["p50"] == vals[max(0, math.ceil(0.5 * len(vals)) - 1)]
        assert r["p95"] == vals[max(0, math.ceil(0.95 * len(vals)) - 1)]


def test_grouped_ranks_and_lead_vs_pandas(ray_session):
    """grouped_ranks / grouped_lead vs pandas windows, with heavy ties
    and a hot key so tie groups and runs span many blocks."""
    from kgray.stages.scan import grouped_lead, grouped_ranks

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "k": rng.choice([1, 2, 3, 99], size=n,
                        p=[0.2, 0.2, 0.1, 0.5]).astype("int64"),
        "v": rng.integers(0, 12, size=n).astype("int64"),   # heavy ties
        "tb": np.arange(n, dtype="int64"),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(16)

    got = grouped_ranks(ds, key="k", order_cols=["v"]).to_pandas()
    got = got.sort_values(["k", "v", "tb"]).reset_index(drop=True)
    exp = df.sort_values(["k", "v", "tb"]).reset_index(drop=True)
    exp["rank"] = exp.groupby("k")["v"].rank(method="min").astype("int64")
    exp["dense_rank"] = exp.groupby("k")["v"].rank(method="dense").astype("int64")
    assert got["rank"].tolist() == exp["rank"].tolist()
    assert got["dense_rank"].tolist() == exp["dense_rank"].tolist()
    # row_number is a permutation of 1..group_size within each key
    rn_sorted = got.groupby("k")["row_number"].apply(
        lambda s: sorted(s.tolist()))
    for k, lst in rn_sorted.items():
        assert lst == list(range(1, len(lst) + 1))

    # grouped_ranks with a total order: row_number == rank == position
    got2 = grouped_ranks(ds, key="k", order_cols=["v", "tb"]).to_pandas()
    got2 = got2.sort_values(["k", "v", "tb"]).reset_index(drop=True)
    exp2 = exp.copy()
    exp2["pos"] = exp2.groupby("k").cumcount() + 1
    assert got2["row_number"].tolist() == exp2["pos"].tolist()
    assert got2["rank"].tolist() == exp2["pos"].tolist()

    # LEAD with a total order vs pandas shift(-1)
    led = grouped_lead(ds, key="k", order_cols=["v", "tb"],
                       value_col="tb", out_name="next_tb").to_pandas()
    led = led.sort_values(["k", "v", "tb"]).reset_index(drop=True)
    exp_next = (exp.groupby("k")["tb"].shift(-1))
    got_next = led["next_tb"].astype("float64").where(led["next_tb"].notna())
    assert ((got_next.isna() & exp_next.isna())
            | (got_next == exp_next)).all()


def test_semi_join_bloom_prefilter_exact(ray_session):
    """semi_join with the bloom pre-filter == without, both modes,
    incl. null keys, string keys, and all-negative/all-positive cases."""
    from kgray.stages.semijoin import semi_join

    rng = np.random.default_rng(21)
    left_df = pd.DataFrame({
        "k": pd.array(list(rng.integers(0, 300, 900)) + [None, None],
                      dtype="Int64"),
        "x": np.arange(902, dtype="int64"),
    })
    right_df = pd.DataFrame({
        "k": pd.array(list(rng.integers(150, 450, 400)), dtype="Int64")})
    left = rd.from_arrow(pa.Table.from_pandas(left_df)).repartition(7)
    right = rd.from_arrow(pa.Table.from_pandas(right_df)).repartition(4)

    for anti in (False, True):
        base = semi_join(left, right, on="k", anti=anti).to_pandas()
        bl = semi_join(left, right, on="k", anti=anti,
                       bloom_bits=1 << 16).to_pandas()
        key = lambda d: sorted(map(tuple, d.fillna(-1).values.tolist()))
        assert key(base) == key(bl), f"anti={anti}"

    # string keys route through the md5 image path
    lft = rd.from_arrow(pa.table({"k": pa.array(
        [f"u{i}" for i in range(200)])})).repartition(5)
    rgt = rd.from_arrow(pa.table({"k": pa.array(
        [f"u{i}" for i in range(100, 400)])})).repartition(3)
    b1 = semi_join(lft, rgt, on="k").to_pandas()
    b2 = semi_join(lft, rgt, on="k", bloom_bits=1 << 14).to_pandas()
    assert sorted(b1["k"]) == sorted(b2["k"])


def test_grouped_ntile_stats_vs_duckdb_ties(ray_session):
    """percent_rank / cume_dist (well-defined under ties) vs DuckDB on
    a tie-heavy frame; ntile checked under a total order."""
    import duckdb

    from kgray.stages.scan import grouped_ntile_stats

    rng = np.random.default_rng(17)
    n = 1500
    df = pd.DataFrame({
        "k": rng.choice([1, 2, 3], n).astype("int64"),
        "v": rng.integers(0, 9, n).astype("int64"),   # heavy ties
        "tb": np.arange(n, dtype="int64"),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(11)
    con = duckdb.connect()
    con.register("t", df)

    # ties: order by v only — percent_rank/cume_dist deterministic
    got = grouped_ntile_stats(ds, key="k", order_cols=["v"],
                              n_tiles=4).to_pandas()
    got = got.sort_values(["k", "v", "tb"]).reset_index(drop=True)
    exp = con.execute("""
        SELECT k, v, tb,
               PERCENT_RANK() OVER w AS percent_rank,
               CUME_DIST() OVER w AS cume_dist
        FROM t WINDOW w AS (PARTITION BY k ORDER BY v)
        ORDER BY k, v, tb""").df()
    assert got["percent_rank"].tolist() == exp["percent_rank"].tolist()
    assert got["cume_dist"].tolist() == exp["cume_dist"].tolist()

    # total order: ntile deterministic
    got2 = grouped_ntile_stats(ds, key="k", order_cols=["v", "tb"],
                               n_tiles=3).to_pandas()
    got2 = got2.sort_values(["k", "v", "tb"]).reset_index(drop=True)
    exp2 = con.execute("""
        SELECT k, v, tb, CAST(NTILE(3) OVER w AS BIGINT) AS nt
        FROM t WINDOW w AS (PARTITION BY k ORDER BY v, tb)
        ORDER BY k, v, tb""").df()
    assert got2["ntile"].tolist() == exp2["nt"].tolist()
