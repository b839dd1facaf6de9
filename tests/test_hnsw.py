"""NSW graph ANN: recall vs exact brute force, build determinism,
degree bound, exact-tie behavior, and the query pipeline's schema."""

import numpy as np
import pandas as pd


def _grid(seed=3, n=400, dim=16):
    from kgray.pipelines.ann import _pq_quantize

    rng = np.random.default_rng(seed)
    # clustered corpus — the regime where greedy graphs can get stuck
    centers = rng.normal(size=(8, dim))
    X = (centers[rng.integers(0, 8, n)]
         + 0.15 * rng.normal(size=(n, dim)))
    return _pq_quantize(X)


def _brute_topk(Xq, q, k, self_pos=None):
    d = ((Xq - q[None, :]) ** 2).sum(axis=1)
    order = np.lexsort((np.arange(len(Xq)), d))
    return [p for p in order if p != self_pos][:k]


def test_nsw_recall_and_determinism():
    from kgray.pipelines.ann import _nsw_search, build_nsw_graph

    Xq = _grid()
    g1 = build_nsw_graph(Xq, M=8, ef_construction=48)
    g2 = build_nsw_graph(Xq.copy(), M=8, ef_construction=48)
    assert (g1 == g2).all()                       # pure function of data
    assert g1.shape[1] == 8                       # degree bound
    hits = total = 0
    for qpos in range(0, 400, 13):
        res = _nsw_search(Xq, g1, Xq[qpos], ef=64)
        got = [p for _, p in res if p != qpos][:10]
        exp = _brute_topk(Xq, Xq[qpos], 10, self_pos=qpos)
        hits += len(set(got) & set(exp))
        total += len(exp)
    assert hits / total >= 0.9, hits / total


def test_nsw_search_exact_ties_deterministic():
    from kgray.pipelines.ann import _nsw_search, build_nsw_graph

    # duplicate points → exact distance ties; lowest position must win
    base = _grid(seed=5, n=50)
    Xq = np.vstack([base, base[:10]])             # positions 50..59 dup 0..9
    g = build_nsw_graph(Xq, M=6, ef_construction=32)
    res = _nsw_search(Xq, g, Xq[0], ef=20)
    ds = [d for d, _ in res]
    assert ds == sorted(ds)
    # among the two zero-distance copies of point 0 the lower pos ranks first
    zero_pos = [p for d, p in res if d == 0]
    assert zero_pos == sorted(zero_pos)


def test_ann_hnsw_topk_pipeline(ray_session):
    from kgray.pipelines.ann import (_pq_quantize, ann_hnsw_topk,
                                     load_embeddings)

    sf = "/root/testdata/sf0.001"
    got = ann_hnsw_topk(sf, k=10, n_queries=5).to_pandas()
    assert list(got.columns) == ["query_id", "rank", "neighbor_id", "dist"]
    assert got.groupby("query_id")["rank"].apply(
        lambda r: list(r) == list(range(1, len(r) + 1))).all()
    assert (got["neighbor_id"] != got["query_id"]).all()

    # recall@10 vs exact int-grid brute force on the same corpus
    ids, E = load_embeddings(sf)
    order = np.argsort(ids)
    ids_s, Xq = ids[order], _pq_quantize(E[order])
    hits = total = 0
    for qid, grp in got.groupby("query_id"):
        qpos = int(np.searchsorted(ids_s, qid))
        exp = {int(ids_s[p]) for p in
               _brute_topk(Xq, Xq[qpos], 10, self_pos=qpos)}
        hits += len(set(grp["neighbor_id"]) & exp)
        total += len(exp)
    assert hits / total >= 0.8, hits / total
