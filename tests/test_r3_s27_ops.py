"""Session-27 batch: hourly autocorrelation (planted-cycle sensitivity
+ serial replay), ISO dow/hour calendar profile (conservation), and
sentence-level entity co-occurrence PMI (brute-force replay over the
engine's own mentions)."""

import math

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_autocorr_serial_replay_and_planted_cycle(ray_session):
    from kgray.pipelines.relational import events_hourly_autocorr

    got = {r["lag"]: r for r in
           events_hourly_autocorr(SF).to_pylist()}
    ts = pq.read_table(f"{SF}/events.parquet", columns=["ts"]
                       ).column("ts").cast("int64").to_pylist()
    hrs = [t // 3600_000_000 for t in ts]
    lo, hi = min(hrs), max(hrs)
    series = [0] * (hi - lo + 1)
    for h in hrs:
        series[h - lo] += 1
    for k in (1, 24):
        xs, ys = series[:-k], series[k:]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        num = n * sum(a * b for a, b in zip(xs, ys)) - sx * sy
        vx = n * sum(v * v for v in xs) - sx * sx
        vy = n * sum(v * v for v in ys) - sy * sy
        exp = float(num) / math.sqrt(float(vx)) / math.sqrt(float(vy))
        assert got[k]["n_pairs"] == n
        assert got[k]["acf"] == exp
    # sensitivity: a planted 24h cycle must read acf(24) >> acf(1)
    cyc = [10 + (50 if i % 24 == 0 else 0) for i in range(240)]
    def acf(s, k):
        xs, ys = s[:-k], s[k:]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        num = n * sum(a * b for a, b in zip(xs, ys)) - sx * sy
        vx = n * sum(v * v for v in xs) - sx * sx
        vy = n * sum(v * v for v in ys) - sy * sy
        return num / math.sqrt(vx) / math.sqrt(vy)
    assert acf(cyc, 24) > 0.9 > abs(acf(cyc, 1))


def test_dow_hour_profile_conservation(ray_session):
    from kgray.pipelines.relational import events_dow_hour_profile

    rows = events_dow_hour_profile(SF).take_all()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "value"])
    assert sum(r["n_events"] for r in rows) == ev.num_rows
    cents = sum(int(np.floor(v * 100.0 + 0.5))
                for v in ev.column("value").to_pylist())
    assert sum(r["sum_cents"] for r in rows) == cents
    assert all(1 <= r["dow"] <= 7 and 0 <= r["hour"] <= 23
               for r in rows)


def test_entity_cooccurrence_brute_force(ray_session):
    import __ray_entry__ as entry
    from kgray.pipelines.graph import kg_entity_cooccurrence

    got = kg_entity_cooccurrence(SF, k_top=40, min_support=3
                                 ).to_pylist()
    men = entry._kg_mentions(SF).take_all()
    sents = {}
    for m in men:
        sents.setdefault((m["url"], m["sent_id"]), set()).add(
            m["surface"])
    N = len(sents)
    marg, pair = {}, {}
    for ents in sents.values():
        es = sorted(ents)
        for x in es:
            marg[x] = marg.get(x, 0) + 1
        for i in range(len(es)):
            for j in range(i + 1, len(es)):
                pair[(es[i], es[j])] = pair.get((es[i], es[j]), 0) + 1
    ranked = sorted(((ab, n) for ab, n in pair.items() if n >= 3),
                    key=lambda kv: (-kv[1], kv[0]))[:40]
    assert [(r["entity_a"], r["entity_b"], r["n_cooccur"])
            for r in got] == [(a, b, n) for (a, b), n in ranked]
    for r in got:
        n, na, nb = r["n_cooccur"], r["n_a"], r["n_b"]
        assert marg[r["entity_a"]] == na and marg[r["entity_b"]] == nb
        exp = int(math.floor(
            10**6 * math.log(float(n * N) / float(na * nb)) + 0.5))
        assert r["pmi_micro"] == exp


def test_srm_check_replay_and_planted_imbalance(ray_session, tmp_path):
    import hashlib

    import pandas as pd

    from kgray.pipelines.relational import events_srm_check

    # replay on real data
    rows = events_srm_check(SF).to_pylist()
    users = set(pq.read_table(f"{SF}/events.parquet",
                              columns=["user_id"]
                              ).column("user_id").to_pylist())
    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
    per = {0: 0, 1: 0}
    for u in users:
        per[arm(u)] += 1
    total = len(users)
    dev = sum((2 * per[a] - total) ** 2 for a in (0, 1))
    assert {r["arm"]: r["n_users"] for r in rows} == per
    assert all(r["dev_sq_sum"] == dev for r in rows)
    assert all(r["srm_flag"] == int(1000 * dev > 3841 * 2 * total)
               for r in rows)
    # planted imbalance: users chosen all from arm 0 must flag
    skew = [u for u in range(5000) if arm(u) == 0][:300]
    df = pd.DataFrame({
        "event_id": range(len(skew)),
        "ts": pd.to_datetime("2024-01-01"),
        "user_id": skew,
        "event_type": "view",
        "value": 1.0,
        "props": "{}"})
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = tmp_path / "skew"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    flagged = events_srm_check(str(d)).to_pylist()
    assert all(r["srm_flag"] == 1 for r in flagged)
    assert {r["arm"]: r["n_users"] for r in flagged} == {0: 300, 1: 0}


def test_dp_median_serial_replay(ray_session):
    import hashlib

    from kgray.pipelines.relational import events_dp_median

    row = events_dp_median(SF).to_pylist()[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    cents = sorted(
        int(np.floor(v * 100.0 + 0.5))
        for v in ev[ev.event_type == "purchase"]["value"])
    from collections import Counter
    hist = sorted(Counter(cents).items())
    n = len(cents)
    half = n // 2
    cum, weights = 0, []
    for v, c in hist:
        cum += c
        u = -abs(cum - half)
        weights.append(1 << (u + 1024) if u > -1024 else 0)
    T = sum(weights)
    M = int(hashlib.md5(b"kgray|dp_median|v1").hexdigest(), 16)
    r = (M * T) >> 128
    acc, pick = 0, hist[-1][0]
    for (v, _c), w in zip(hist, weights):
        acc += w
        if r < acc:
            pick = v
            break
    assert row["dp_median_cents"] == pick
    assert row["n_purchases"] == n
    # utility concentration: the released value's rank error is tiny
    # (weights decay 2x per rank step — mass concentrates at the median)
    idx = [v for v, _ in hist].index(pick)
    cum_to = sum(c for _, c in hist[:idx + 1])
    assert abs(cum_to - half) <= 64


def test_weekday_index_and_interarrival_cv_laws(ray_session):
    from kgray.pipelines.relational import (events_interarrival_cv,
                                            orders_weekday_index)

    wk = orders_weekday_index(SF).to_pylist()
    assert [r["dow"] for r in wk] == sorted(r["dow"] for r in wk)
    total = sum(r["revenue_cents"] for r in wk)
    for r in wk:
        assert r["index_micro"] == 10**6 * 7 * r["revenue_cents"] // total
    # indices average to ~1e6 by construction (floor slack ≤ 7)
    assert abs(sum(r["index_micro"] for r in wk) - 7 * 10**6) <= 7 * 7

    cv = events_interarrival_cv(SF).to_pylist()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "event_id", "ts"]
                       ).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    for r in cv:
        g = ev[ev.event_type == r["event_type"]].sort_values(
            ["ts_us", "event_id"])["ts_us"].diff().dropna()
        gaps = [int(x) for x in g]
        n, s1 = len(gaps), sum(gaps)
        s2 = sum(x * x for x in gaps)
        assert r["n_gaps"] == n
        assert r["mean_gap_us"] == s1 // n
        sigma = math.sqrt(float(n * s2 - s1 * s1) / float(n * (n - 1)))
        assert r["cv"] == sigma / (s1 / n)


def test_segment_migration_and_peak_hour_laws(ray_session):
    from kgray.pipelines.relational import (customer_segment_migration,
                                            events_type_peak_hour)

    mig = customer_segment_migration(SF).take_all()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey"]).num_rows
    assert sum(r["n_customers"] for r in mig) == cust
    # only the two planted destination states plus identity moves
    for r in mig:
        assert r["to_segment"] in ("CHURNED", "MIGRATED",
                                   r["from_segment"])

    peaks = events_type_peak_hour(SF).take_all()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["hr"] = ev["ts"].astype("int64") // 3600_000_000
    hourly = ev.groupby(["event_type", "hr"]).size()
    for t, grp in hourly.groupby(level=0):
        m = grp.max()
        exp_hours = sorted(h for (_t, h), n in grp.items() if n == m)
        got = sorted(r["peak_hour"] for r in peaks
                     if r["event_type"] == t)
        assert got == exp_hours
        assert all(r["n_events"] == m for r in peaks
                   if r["event_type"] == t)


def test_dp_p90_targets_upper_rank(ray_session):
    from kgray.pipelines.relational import (events_dp_median,
                                            events_dp_p90)

    med = events_dp_median(SF).to_pylist()[0]
    p90 = events_dp_p90(SF).to_pylist()[0]
    assert p90["n_purchases"] == med["n_purchases"]
    # p90 must release a strictly higher value than the median here
    assert p90["dp_p90_cents"] > med["dp_median_cents"]
    # rank concentration near 9n/10
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    cents = sorted(int(np.floor(v * 100.0 + 0.5)) for v in
                   ev[ev.event_type == "purchase"]["value"])
    n = len(cents)
    rank = sum(1 for c in cents if c <= p90["dp_p90_cents"])
    assert abs(rank - 9 * n // 10) <= 64


def test_weekly_hll_merge_law_and_accuracy(ray_session):
    from kgray.pipelines.relational import events_weekly_hll_merge

    rows = events_weekly_hll_merge(SF).to_pylist()
    assert rows and all(r["merge_law_ok"] == 1 for r in rows)
    assert all(r["est_direct"] == r["est_merged"] for r in rows)
    # accuracy sanity vs exact weekly distincts (HLL p=12 ⇒ ~1.6% rse;
    # allow a generous band)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "user_id"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["week"] = ev["day"] - ((ev["day"] + 3) % 7)
    exact = ev.groupby("week")["user_id"].nunique()
    for r in rows:
        e = exact[r["week_day"]]
        assert abs(r["est_direct"] - e) <= max(3, int(0.1 * e))


def test_supplier_late_wilson_laws(ray_session):
    from kgray.pipelines.relational import supplier_late_wilson

    rows = supplier_late_wilson(SF).take_all()
    assert rows
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_suppkey"]).num_rows
    assert sum(r["n"] for r in rows) == li
    for r in rows:
        assert 0 <= r["k"] <= r["n"]
        # upper bound dominates the point rate, within [0, ~1+eps]
        assert r["wilson_hi"] >= r["late_rate"]
        assert r["wilson_hi"] <= 1.2


def test_cross_source_dup_matrix_conservation(ray_session):
    from kgray.pipelines import dedup
    from kgray.pipelines.text import cross_source_dup_matrix

    rows = cross_source_dup_matrix(SF).take_all()
    pairs = dedup.minhash_lsh_pairs(SF)
    n_pairs = pairs.num_rows if hasattr(pairs, "num_rows") else \
        pairs.count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"])
    smap = dict(zip(docs.column("doc_id").to_pylist(),
                    docs.column("source").to_pylist()))
    plist = pairs.to_pylist() if hasattr(pairs, "to_pylist") else \
        pairs.take_all()
    exp = {}
    for p in plist:
        a, b = smap[p["doc_a"]], smap[p["doc_b"]]
        key = (min(a, b), max(a, b))
        exp[key] = exp.get(key, 0) + 1
    assert {(r["source_a"], r["source_b"]): r["n_pairs"]
            for r in rows} == exp


def test_dp_quantiles_generalization_consistent(ray_session):
    """The generalized release reproduces the dedicated median/p90
    picks (same salt, same mechanism) and is monotone in q over the
    exact histogram's support."""
    from kgray.pipelines.relational import (events_dp_median,
                                            events_dp_p90,
                                            events_dp_quantiles)

    sf = "/root/testdata/sf0.001"
    g = events_dp_quantiles(sf).to_pandas().set_index("q_micro")
    med = events_dp_median(sf).to_pandas().iloc[0]
    p90 = events_dp_p90(sf).to_pandas().iloc[0]
    assert g.loc[500_000, "dp_value_cents"] == med["dp_median_cents"]
    assert g.loc[900_000, "dp_value_cents"] == p90["dp_p90_cents"]
    assert (g["n_purchases"] == med["n_purchases"]).all()
