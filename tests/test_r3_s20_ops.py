"""Session-20 batch: KMV distinct sketch (serial bottom-k replay +
estimate-accuracy law), Mann-Whitney U (pandas midrank replay +
U-sum law), seeded BFS closeness/eccentricity (serial BFS replay),
per-source G2 keyness (serial replay + positivity law)."""

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _md5i(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


def test_kmv_distinct_serial_and_accuracy(ray_session):
    from kgray.pipelines.relational import events_kmv_distinct

    got = {r["event_type"]: r
           for r in events_kmv_distinct(SF).to_pylist()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    for t, grp in ev.groupby("event_type"):
        users = sorted(grp["user_id"].unique())
        hs = sorted((_md5i(u), u) for u in users)
        r = got[t]
        assert r["n_exact"] == len(users)
        k = min(64, len(users))
        assert r["n_sketch"] == k
        assert r["kth_hash"] == hs[k - 1][0]
        if len(users) < 64:
            assert r["est_distinct"] == float(len(users))
        else:
            exp = float(63) * 4294967296.0 / float(hs[63][0])
            assert r["est_distinct"] == exp
            # sketch accuracy: KMV with k=64 has ~1/sqrt(62) rel std;
            # 3 sigma ≈ 0.38
            assert abs(exp - len(users)) / len(users) < 0.5


def test_mannwhitney_serial(ray_session):
    from kgray.pipelines.relational import events_mannwhitney_u

    got = events_mannwhitney_u(SF).to_pylist()[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type", "value"]).to_pandas()
    p = ev[ev["event_type"] == "purchase"].copy()
    us = p["ts"].astype("int64")
    dow = (us // 86_400_000_000 + 4) % 7
    wa = dow.isin([0, 6]).to_numpy()
    v = np.floor(p["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    # doubled midranks: 2*rank(average) is always integral
    r2 = (pd.Series(v).rank(method="average").to_numpy() * 2) \
        .round().astype(np.int64)
    na, n = int(wa.sum()), len(v)
    r2a = int(r2[wa].sum())
    u2a = r2a - na * (na + 1)
    assert got["n_weekend"] == na
    assert got["n_weekday"] == n - na
    assert got["u2_weekend"] == u2a
    assert got["u2_weekday"] == 2 * na * (n - na) - u2a
    # U law: U_A + U_B = na*nb (doubled on both sides)
    assert got["u2_weekend"] + got["u2_weekday"] == 2 * na * (n - na)
    # z replay from exact integer pieces
    cnts = Counter(v.tolist())
    ties = sum(c ** 3 - c for c in cnts.values())
    var_num = na * (n - na) * ((n + 1) * n * (n - 1) - ties)
    var_den = 12 * n * (n - 1)
    z = (float(u2a - na * (n - na))
         / (2.0 * math.sqrt(float(var_num) / float(var_den))))
    assert got["z_score"] == z
    assert abs(got["z_score"]) < 10.0


def test_closeness_serial_bfs(ray_session):
    from kgray.pipelines.relational import (_copurchase_pair_counts,
                                            _unpack_pair,
                                            copurchase_closeness)

    got = {r["seed"]: r for r in copurchase_closeness(SF).to_pylist()}
    p = _copurchase_pair_counts(SF) \
        .map_batches(_unpack_pair, batch_format="pyarrow").to_pandas()
    p = p[p["n_copurchase"] >= 2]
    adj = {}
    for a, b in zip(p["part_a"].tolist(), p["part_b"].tolist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = sorted(adj, key=lambda n: (_md5i(n), n))[:8]
    assert sorted(got) == sorted(seeds)
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, 7):
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        r = got[s]
        assert r["n_reached"] == len(dist)
        assert r["sum_dist"] == sum(dist.values())
        assert r["eccentricity"] == max(dist.values())
        assert r["eccentricity"] <= 6
        sd = sum(dist.values())
        exp = float(len(dist) - 1) / float(sd) if sd > 0 else 0.0
        assert r["closeness"] == exp
        assert 0.0 <= r["closeness"] <= 1.0


def test_keyness_serial(ray_session):
    from kgray.pipelines.text import _tokens, source_keyness_tokens

    rows = source_keyness_tokens(SF).take_all()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    st = Counter()
    for s, t in zip(docs["source"], docs["text"]):
        for tok in _tokens(t):
            st[(s, tok)] += 1
    tt = Counter()
    na = Counter()
    for (s, tok), c in st.items():
        tt[tok] += c
        na[s] += c
    n = sum(na.values())
    # serial replay of every emitted row + structural laws
    seen_ranks = {}
    for r in rows:
        s, tok = r["source"], r["token"]
        a = st[(s, tok)]
        b = tt[tok] - a
        assert r["n_source"] == a and r["n_rest"] == b
        assert a + b >= 5 and a * (n - na[s]) > b * na[s]
        ta = float(a) * math.log(float(a * n) / float(na[s] * (a + b)))
        tb = (float(b) * math.log(
            float(b * n) / float((n - na[s]) * (a + b)))
            if b > 0 else 0.0)
        assert r["keyness"] == 2.0 * (ta + tb)
        assert r["keyness"] > 0.0       # over-represented only
        seen_ranks.setdefault(s, []).append(r["rank"])
    for s, ranks in seen_ranks.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_zipf_slope_serial(ray_session):
    from kgray.pipelines.text import _tokens, token_zipf_slope

    got = token_zipf_slope(SF).to_pylist()[0]
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas()
    tc = Counter()
    for t in docs["text"]:
        tc.update(_tokens(t))
    top = sorted(tc.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    n = len(top)
    sx = sy = sxx = sxy = 0
    for i, (_, c) in enumerate(top):
        lx = math.floor(math.log(float(i + 1)) * 1e6)
        ly = math.floor(math.log(float(c)) * 1e6)
        sx += lx
        sy += ly
        sxx += lx * lx
        sxy += lx * ly
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    assert got["n_points"] == n
    assert got["slope"] == slope
    assert got["intercept_micronats"] == \
        (float(sy) - slope * float(sx)) / float(n)
    # Zipf law direction: frequency falls with rank
    assert got["slope"] < 0.0


def test_burstiness_serial(ray_session):
    from kgray.pipelines.text import _tokens, token_burstiness

    rows = token_burstiness(SF).to_pylist()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    nd = len(docs)
    per = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        for tok, c in Counter(_tokens(t)).items():
            per.setdefault(tok, []).append(c)
    scored = []
    for tok, cs in per.items():
        s, s2 = sum(cs), sum(c * c for c in cs)
        if s >= 30:
            scored.append((float(nd * s2 - s * s) / float(s * (nd - 1)),
                           tok, len(cs), s, s2))
    scored.sort(key=lambda x: (-x[0], x[1]))
    assert len(rows) == min(20, len(scored))
    for i, r in enumerate(rows):
        vmr, tok, df, s, s2 = scored[i]
        assert r["rank"] == i + 1
        assert (r["token"], r["df"], r["total_count"],
                r["sum_sq"]) == (tok, df, s, s2)
        assert r["vmr"] == vmr
        assert r["vmr"] > 0.0


def test_user_overlap_kmv_serial(ray_session):
    from kgray.pipelines.relational import user_overlap_kmv

    got = user_overlap_kmv(SF).to_pylist()[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    a = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    b = set(ev.loc[ev["event_type"] == "view", "user_id"])
    uni = a | b
    assert got["n_purchasers"] == len(a)
    assert got["n_viewers"] == len(b)
    assert got["n_inter_exact"] == len(a & b)
    assert got["n_union_exact"] == len(uni)
    k = 256
    hs = sorted((_md5i(u), u) for u in uni)[:min(k, len(uni))]
    assert got["kth_hash"] == hs[-1][0]
    in_both = sum(1 for _, u in hs if u in a and u in b)
    assert got["sketch_in_both"] == in_both
    if len(uni) < k:
        assert got["union_est"] == float(len(uni))
        assert got["jaccard_est"] == float(len(a & b)) / float(len(uni))
    else:
        assert got["union_est"] == \
            float(k - 1) * 4294967296.0 / float(hs[-1][0])
        assert got["jaccard_est"] == float(in_both) / float(k)
        # sketch accuracy laws (k=256 → rel std ~6%; allow 4 sigma)
        assert abs(got["union_est"] - len(uni)) / len(uni) < 0.25
        exact_j = len(a & b) / len(uni)
        assert abs(got["jaccard_est"] - exact_j) < 0.15
    assert got["inter_est"] == got["jaccard_est"] * got["union_est"]


def test_crawl_host_shards_serial(ray_session):
    import re

    from kgray.pipelines.kg import crawl_host_shards, page_files
    from kgray.sources.derived import corpus_for_sf

    rows = {r["shard"]: r for r in crawl_host_shards(SF).take_all()}
    corpus = corpus_for_sf(SF)
    urls = []
    for f in page_files(corpus):
        urls += pq.read_table(f, columns=["url"]).column(
            "url").to_pylist()
    per = Counter()
    for u in urls:
        m = re.match(r"^https://([^/]+/[^/]+)/", u)
        if m:
            per[m.group(1)] += 1
    order = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))
    exp = {}
    for i, (h, c) in enumerate(order):
        s = i % 16
        st = exp.setdefault(s, [0, 0, 0])
        st[0] += 1
        st[1] += c
        st[2] = max(st[2], c)
    assert sorted(rows) == sorted(exp)
    for s, (nh, np_, mx) in exp.items():
        r = rows[s]
        assert (r["n_hosts"], r["n_pages"], r["max_host_pages"]) == \
            (nh, np_, mx)
    # politeness invariant: units partition exactly (loads sum to total)
    assert sum(r["n_pages"] for r in rows.values()) == sum(per.values())
    assert sum(r["n_hosts"] for r in rows.values()) == len(per)
    # round-robin balance: host counts differ by at most one
    nhs = [r["n_hosts"] for r in rows.values()]
    assert max(nhs) - min(nhs) <= 1


def test_top_supplier_revenue_serial(ray_session):
    from kgray.pipelines.relational import top_supplier_revenue

    rows = top_supplier_revenue(SF).take_all()
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"]).to_pandas()
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")
    sd = pd.to_datetime(li["l_shipdate"])
    w = li[(sd >= lo) & (sd < hi)]
    cents = np.floor(w["l_extendedprice"].to_numpy()
                     * (1.0 - w["l_discount"].to_numpy())
                     * 100.0 + 0.5).astype(np.int64)
    per = {}
    for s, c in zip(w["l_suppkey"], cents):
        per[s] = per.get(s, 0) + int(c)
    mx = max(per.values())
    exp = sorted(s for s, v in per.items() if v == mx)
    assert [r["s_suppkey"] for r in rows] == exp
    for r in rows:
        assert r["total_revenue_cents"] == mx
        assert r["s_name"] == f"Supplier#{r['s_suppkey']:09d}"


def test_ks_test_serial(ray_session):
    from kgray.pipelines.relational import events_ks_test

    got = events_ks_test(SF).to_pylist()[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type", "value"]).to_pandas()
    p = ev[ev["event_type"] == "purchase"]
    us = p["ts"].astype("int64")
    wa = ((us // 86_400_000_000 + 4) % 7).isin([0, 6]).to_numpy()
    v = np.floor(p["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    na, n = int(wa.sum()), len(v)
    nb = n - na
    vs = sorted(set(v.tolist()))
    best, at = -1, None
    cuma = cum = 0
    ca_of = Counter(v[wa].tolist())
    c_of = Counter(v.tolist())
    for x in vs:
        cuma += ca_of.get(x, 0)
        cum += c_of[x]
        diff = abs(cuma * nb - (cum - cuma) * na)
        if diff > best:
            best, at = diff, x
    assert got["n_weekend"] == na and got["n_weekday"] == nb
    assert got["d_num"] == best
    assert got["at_value"] == at
    assert got["ks_stat"] == float(best) / float(na * nb)
    # KS is a normalized sup-gap
    assert 0.0 <= got["ks_stat"] <= 1.0
