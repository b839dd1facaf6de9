"""Session-8 batch: connected components (union-find oracle +
plan equality), integer MAD outliers (serial weighted-median oracle),
decision stump (brute-force split search), shingle containment
(brute-force set oracle + asymmetry)."""

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ components
def test_part_components_union_find(ray_session):
    from kgray.pipelines.graph import part_components
    from kgray.pipelines.relational import (_copurchase_pair_counts,
                                            _unpack_pair)

    got = {r["part"]: r["component"]
           for r in part_components(SF).take_all()}
    pairs = _copurchase_pair_counts(SF) \
        .map_batches(_unpack_pair, batch_format="pyarrow").to_pandas()
    pairs = pairs[pairs["n_copurchase"] >= 2]
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["part_a"], pairs["part_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min node id of the component
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    exp = {n: min(ns) for r, ns in comp.items() for n in ns}
    # re-root: min of each tree
    exp = {}
    roots = {}
    for n in parent:
        roots.setdefault(find(n), set()).add(n)
    for r, ns in roots.items():
        m = min(ns)
        for n in ns:
            exp[n] = m
    assert got == exp
    # every edge endpoint pair shares a component
    for a, b in zip(pairs["part_a"], pairs["part_b"]):
        assert got[a] == got[b]


# -------------------------------------------------------------- MAD
def test_mad_outliers_serial(ray_session, tmp_path):
    from kgray.pipelines.relational import events_value_mad_outliers

    rng = np.random.default_rng(11)
    n = 3001
    cents = rng.integers(90, 111, n)          # tight cluster
    cents[:7] = [100000, 90000, 1, 2, 88000, 3, 99999]   # gross outliers
    df = pd.DataFrame({
        "event_id": np.arange(1, n + 1, dtype=np.int64),
        "event_type": ["click"] * n,
        "value": cents / 100.0,
        "ts": pd.Timestamp("2024-01-05").as_unit("us"),
        "user_id": np.ones(n, dtype=np.int64),
        "props": ["{}"] * n,
    })
    p = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(p, "events.parquet"))
    got = events_value_mad_outliers(p).to_pylist()[0]

    v = np.sort(cents)
    med2 = int(v[(n - 1) // 2]) + int(v[n // 2])
    dev = np.sort(np.abs(2 * cents - med2))
    mad2 = int(dev[(n - 1) // 2]) + int(dev[n // 2])
    n_out = int((2 * np.abs(2 * cents - med2) > 3 * mad2).sum())
    assert got["med2_cents"] == med2
    assert got["mad2_cents"] == mad2
    assert got["n_outliers"] == n_out
    assert n_out >= 7                       # the planted gross outliers


# ------------------------------------------------------------- stump
def test_stump_brute_force(ray_session):
    from kgray.pipelines.relational import part_price_stump

    got = part_price_stump(SF).to_pandas().iloc[0]
    part = pq.read_table(f"{SF}/part.parquet",
                         columns=["p_retailprice", "p_type"]).to_pandas()
    cents = np.floor(part["p_retailprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    y = part["p_type"].isin(["SMALL", "ECONOMY"]).to_numpy().astype(int)
    best = None
    for thr in sorted(set(cents)):
        l = cents <= thr
        nl, nr = int(l.sum()), int((~l).sum())
        if nr == 0:
            continue
        pl, pr = int(y[l].sum()), int(y[~l].sum())
        gl = float(pl * pl + (nl - pl) * (nl - pl)) / float(nl)
        gr = float(pr * pr + (nr - pr) * (nr - pr)) / float(nr)
        s = (float(nl) - gl) + (float(nr) - gr)
        if best is None or (s, thr) < best[:2]:
            best = (s, thr, nl, pl, nr, pr)
    assert got["split_cents"] == best[1]
    assert got["gini_weighted"] == best[0]
    assert (got["n_left"], got["pos_left"]) == (best[2], best[3])
    assert (got["n_right"], got["pos_right"]) == (best[4], best[5])


def test_stump_separates_planted_classes(ray_session, tmp_path):
    from kgray.pipelines.relational import part_price_stump

    # perfectly separable: budget types cost < 50, others >= 50
    n = 400
    rng = np.random.default_rng(5)
    y = rng.random(n) < 0.4
    price = np.where(y, rng.uniform(1, 40, n), rng.uniform(60, 99, n))
    df = pd.DataFrame({
        "p_partkey": np.arange(1, n + 1, dtype=np.int64),
        "p_name": ["p"] * n,
        "p_brand": ["b"] * n,
        "p_type": np.where(y, "SMALL", "LARGE"),
        "p_size": np.ones(n, dtype=np.int32),
        "p_retailprice": price.round(2),
    })
    p = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(p, "part.parquet"))
    got = part_price_stump(p).to_pandas().iloc[0]
    # a perfect split has zero impurity; ties break to the LOWEST
    # zero-impurity threshold = the max budget-class price
    assert got["gini_weighted"] == 0.0
    exp_thr = int(np.floor(price[y].max().round(2) * 100.0 + 0.5))
    assert got["split_cents"] == exp_thr
    assert got["pos_left"] == got["n_left"] and got["pos_right"] == 0


# -------------------------------------------------------- containment
def test_containment_brute_force_and_asymmetry(ray_session):
    from kgray.pipelines.dedup import (_tokens, shingle_containment_pairs,
                                       shingle_set)

    got = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["size_a"])
           for r in shingle_containment_pairs(SF).take_all()}
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    sh = {int(d): shingle_set(_tokens(t), 3)
          for d, t in zip(docs["doc_id"], docs["text"])
          if len(_tokens(t)) >= 3}
    exp = {}
    ids = sorted(sh)
    for a in ids:
        for b in ids:
            if a == b:
                continue
            inter = len(sh[a] & sh[b])
            if inter * 5 >= 4 * len(sh[a]) and len(sh[a]) > 0:
                exp[(a, b)] = (inter, len(sh[a]))
    assert got == exp
    assert len(got) > 0


def test_containment_is_asymmetric(ray_session, tmp_path):
    from kgray.pipelines.dedup import shingle_containment_pairs

    # doc 1 is a strict quote inside doc 2: 1-in-2 qualifies, 2-in-1
    # cannot (|inter|/|sh2| is small)
    quote = "alpha beta gamma delta epsilon zeta"
    long = quote + " " + " ".join(f"w{i}" for i in range(40))
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": [quote, long, "totally unrelated words here now"],
        "lang": ["en"] * 3, "source": ["s"] * 3,
    })
    p = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(p, "documents.parquet"))
    got = {(r["doc_a"], r["doc_b"])
           for r in shingle_containment_pairs(p).take_all()}
    assert (1, 2) in got and (2, 1) not in got
    assert not any(3 in pair for pair in got)
