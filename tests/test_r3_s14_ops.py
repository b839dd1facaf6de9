"""Session-14 batch: delta-join IVM (the maintained==recomputed law),
region rollup (pandas oracle incl. subtotal levels), position-based
attribution (serial credit replay + conservation law), ANN with
tombstones (filtered-brute-force equality + exclusion law)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_join_ivm_law(ray_session):
    from kgray.pipelines.relational import orders_join_ivm

    got = {r["priority"]: r for r in orders_join_ivm(SF).take_all()}
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey",
                                "l_extendedprice"]).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey",
                                    "o_orderpriority"]).to_pandas()
    pri = dict(zip(orders["o_orderkey"], orders["o_orderpriority"]))
    cents = np.floor(li["l_extendedprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    isd = np.array([int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
                    % 10 == 0 for k in li["l_orderkey"]])
    df = pd.DataFrame({"p": [pri[k] for k in li["l_orderkey"]],
                       "d": isd.astype(int), "c": cents})
    full = df.groupby("p").agg(n=("c", "size"), cents=("c", "sum"))
    for p, r in got.items():
        g = df[df["p"] == p]
        # the IVM law: base + delta == full recompute, bitwise
        assert r["n_base"] + r["n_delta"] == r["n_maintained"]
        assert r["n_maintained"] == int(full.loc[p, "n"])
        assert r["cents_maintained"] == int(full.loc[p, "cents"])
        assert r["n_delta"] == int(g["d"].sum())
    assert sum(r["n_delta"] for r in got.values()) > 0   # non-vacuous


def test_region_rollup_levels(ray_session):
    from kgray.pipelines.relational import region_revenue_rollup

    rows = region_revenue_rollup(SF).take_all()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_custkey", "o_totalprice"]).to_pandas()
    c = pq.read_table(f"{SF}/customer.parquet",
                      columns=["c_custkey", "c_nationkey"]).to_pandas()
    n = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    r = pq.read_table(f"{SF}/region.parquet").to_pandas()
    df = (o.merge(c, left_on="o_custkey", right_on="c_custkey")
          .merge(n, left_on="c_nationkey", right_on="n_nationkey")
          .merge(r, left_on="n_regionkey", right_on="r_regionkey"))
    df["cents"] = np.floor(df["o_totalprice"].to_numpy() * 100.0
                           + 0.5).astype(np.int64)
    fine = df.groupby(["r_name", "n_name"]).agg(
        n=("cents", "size"), cents=("cents", "sum"))
    got_fine = {(x["region"], x["nation"]): x for x in rows
                if x["nation"] is not None and x["region"] is not None}
    assert len(got_fine) == len(fine)
    for (rg, na), e in fine.iterrows():
        g = got_fine[(rg, na)]
        assert g["n_orders"] == int(e["n"])
        assert g["revenue_cents"] == int(e["cents"])
    # region subtotal level
    got_rg = {x["region"]: x for x in rows
              if x["nation"] is None and x["region"] is not None}
    per_r = df.groupby("r_name").agg(n=("cents", "size"),
                                     cents=("cents", "sum"))
    assert {k: (v["n_orders"], v["revenue_cents"])
            for k, v in got_rg.items()} == \
        {k: (int(e["n"]), int(e["cents"])) for k, e in per_r.iterrows()}
    # grand total
    gt = [x for x in rows if x["region"] is None and x["nation"] is None]
    assert len(gt) == 1
    assert gt[0]["n_orders"] == len(df)
    assert gt[0]["revenue_cents"] == int(df["cents"].sum())


def test_position_attribution_serial(ray_session):
    from kgray.pipelines.relational import purchase_position_attribution

    got = {r["user_id"]: r["ucredits"]
           for r in purchase_position_attribution(SF).take_all()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "event_type",
                                "ts"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    p = ev[ev["event_type"] == "purchase"]
    v = ev[ev["event_type"] == "view"]
    exp = {}
    total = 0
    for _, pr in p.iterrows():
        w = v[(v["user_id"] == pr["user_id"])
              & (v["ts_us"] <= pr["ts_us"])
              & (v["ts_us"] >= pr["ts_us"] - 3_600_000_000)]
        if w.empty:
            continue
        w = w.sort_values(["ts_us", "event_id"])
        n = len(w)
        credits = []
        if n == 1:
            credits = [1_000_000]
        elif n == 2:
            credits = [500_000, 500_000]
        else:
            share = 200_000 // (n - 2)
            rem = 200_000 - share * (n - 2)
            credits = [400_000] + [share] * (n - 2) + [400_000]
            credits[1] += rem
        for cr in credits:
            exp[pr["user_id"]] = exp.get(pr["user_id"], 0) + cr
            total += cr
    assert got == exp
    # conservation: every attributed purchase hands out exactly 1e6
    n_attributed = sum(
        1 for _, pr in p.iterrows()
        if not v[(v["user_id"] == pr["user_id"])
                 & (v["ts_us"] <= pr["ts_us"])
                 & (v["ts_us"] >= pr["ts_us"] - 3_600_000_000)].empty)
    assert sum(got.values()) == 1_000_000 * n_attributed


def test_ann_deletes_equals_filtered_bruteforce(ray_session, tmp_path):
    import os

    from kgray.pipelines.ann import (ann_topk_bruteforce,
                                     ann_topk_with_deletes)

    got = ann_topk_with_deletes(SF).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    # no tombstoned vector is ever returned
    for nid in got["neighbor_id"]:
        h = int(hashlib.md5(str(nid).encode()).hexdigest()[:8], 16)
        assert h % 10 != 0
    # equality with a fresh index over the retained rows only
    t = pq.read_table(f"{SF}/embeddings.parquet")
    keep = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            % 10 != 0 for i in t.column("vec_id").to_pylist()]
    pq.write_table(t.filter(pa_mask(keep)),
                   os.path.join(str(tmp_path), "embeddings.parquet"))
    fresh = ann_topk_bruteforce(str(tmp_path)).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    # query set differs (queries come from the table head), so compare
    # only queries shared by both
    common = set(got["query_id"]) & set(fresh["query_id"])
    assert common
    g = got[got["query_id"].isin(common)].reset_index(drop=True)
    f = fresh[fresh["query_id"].isin(common)].reset_index(drop=True)
    assert g["neighbor_id"].tolist() == f["neighbor_id"].tolist()


def pa_mask(lst):
    import pyarrow as pa
    return pa.array(lst, type=pa.bool_())
