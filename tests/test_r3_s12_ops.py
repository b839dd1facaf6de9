"""Session-12 batch: split-conformal coverage (serial oracle + the
distribution-free ≥0.9 guarantee), co-occurrence recommendations
(brute-force oracle + owned-exclusion law), n-gram novelty (serial
first-occurrence oracle + ordering law), CUPED (serial replay +
variance-reduction direction)."""

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


# -------------------------------------------------------------- conformal
def test_conformal_serial_and_guarantee(ray_session):
    from kgray.pipelines.relational import events_conformal_coverage

    got = {r["event_type"]: r
           for r in events_conformal_coverage(SF).to_pylist()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type",
                                "value"]).to_pandas()
    par = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                    % 2 for i in ev["event_id"]])
    cents = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    for t, r in got.items():
        m = (ev["event_type"] == t).to_numpy()
        ca = cents[m & (par == 0)]
        cb = cents[m & (par == 1)]
        n_a, s_a = len(ca), int(ca.sum())
        sa = np.sort(np.abs(ca * n_a - s_a))
        k = -(-9 * (n_a + 1) // 10)
        qhat = int(sa[k - 1]) if k <= n_a else int(sa.max())
        sb = np.abs(cb * n_a - s_a)
        assert r["n_cal"] == n_a and r["n_eval"] == len(cb)
        assert r["qhat_scaled"] == qhat
        assert r["n_covered"] == int((sb <= qhat).sum())
        # the conformal guarantee: empirical coverage near/above 0.9
        # (exchangeable split, so sampling error only)
        assert r["n_covered"] / r["n_eval"] > 0.8


# ------------------------------------------------------------------ recs
def test_recs_bruteforce(ray_session):
    from kgray.pipelines.relational import (_copurchase_pair_counts,
                                            _unpack_pair,
                                            customer_part_recs)

    got = customer_part_recs(SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey",
                                    "o_custkey"]).to_pandas()
    pairs = _copurchase_pair_counts(SF) \
        .map_batches(_unpack_pair, batch_format="pyarrow").to_pandas()
    pairs = pairs[pairs["n_copurchase"] >= 2]
    w = {}
    for a, b, c in zip(pairs["part_a"], pairs["part_b"],
                       pairs["n_copurchase"]):
        w.setdefault(a, {})[b] = c
        w.setdefault(b, {})[a] = c
    o2c = dict(zip(orders["o_orderkey"], orders["o_custkey"]))
    owned = {}
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        owned.setdefault(o2c[ok], set()).add(pk)
    exp = []
    for cust, parts in owned.items():
        score = {}
        for p in parts:
            for cand, ww in w.get(p, {}).items():
                score[cand] = score.get(cand, 0) + ww
        fresh = [(c, s) for c, s in score.items() if c not in parts]
        fresh.sort(key=lambda cs: (-cs[1], cs[0]))
        for rk, (cand, s) in enumerate(fresh[:3], 1):
            exp.append((cust, cand, s, rk))
    exp.sort()
    gr = sorted(zip(got["custkey"], got["rec_part"], got["score"],
                    got["rank"]))
    assert gr == exp
    # no recommended part is already owned
    for cust, cand, _, _ in gr:
        assert cand not in owned[cust]


# --------------------------------------------------------------- novelty
def test_novelty_serial(ray_session):
    from kgray.pipelines.relational import doc_novelty_scores

    got = {r["doc_id"]: (r["n_grams"], r["n_novel"])
           for r in doc_novelty_scores(SF).take_all()}
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id")
    first = {}
    per_doc = {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        toks = txt.split()
        gs = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        if not gs:
            continue
        per_doc[int(did)] = gs
        for g in gs:
            first.setdefault(g, int(did))
    exp = {d: (len(gs), sum(1 for g in gs if first[g] == d))
           for d, gs in per_doc.items()}
    assert got == exp
    # law: the corpus-minimum doc_id with grams is fully novel
    dmin = min(per_doc)
    assert got[dmin][0] == got[dmin][1]
    # law: novelty never exceeds gram count
    assert all(nv <= ng for ng, nv in got.values())


# ------------------------------------------------------------------ cuped
def test_cuped_serial_and_direction(ray_session):
    from kgray.pipelines.relational import events_cuped_estimate

    got = {r["variant"]: r
           for r in events_cuped_estimate(SF).take_all()}
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ts = ev["ts"].astype("int64")
    mid = 1705406400000000
    cents = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    isp = (ev["event_type"] == "purchase").to_numpy()
    df = pd.DataFrame({
        "u": ev["user_id"],
        "x": np.where(isp & (ts < mid).to_numpy(), cents, 0),
        "y": np.where(isp & (ts >= mid).to_numpy(), cents, 0)})
    u = df.groupby("u").sum()
    n = len(u)
    sx, sy = int(u["x"].sum()), int(u["y"].sum())
    sxx = int((u["x"] * u["x"]).sum())
    sxy = int((u["x"] * u["y"]).sum())
    var = n * sxx - sx * sx
    theta = float(n * sxy - sx * sy) / float(var) if var else 0.0
    mu = float(sx) / float(n)
    u["variant"] = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                    % 2 for i in u.index]
    u["adj"] = [math.floor(1000000.0 * (float(y) - theta
                                        * (float(x) - mu)) + 0.5)
                for x, y in zip(u["x"], u["y"])]
    for v, g in u.groupby("variant"):
        r = got[v]
        assert r["n_users"] == len(g)
        assert r["mean_y_cents"] == float(int(g["y"].sum())) / float(len(g))
        assert r["mean_adj_ucents"] == \
            float(int(g["adj"].sum())) / float(len(g))
    # CUPED reduces cross-user variance when pre/post correlate
    raw_var = float(u["y"].astype(float).var())
    adj_var = float((u["adj"] / 1e6).var())
    if theta != 0.0:
        assert adj_var <= raw_var * 1.0001
