"""Deterministic fixed-point PageRank vs dense numpy power iteration."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _numpy_pagerank(edges, iters=10, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    adj = {}
    for u, v in set(edges):
        out[idx[u]] += 1
        adj.setdefault(idx[u], []).append(idx[v])
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dangling = r[out == 0].sum()
        for u, vs in adj.items():
            for v in vs:
                nxt[v] += r[u] / out[u]
        r = (1 - d) / n + d * (nxt + dangling / n)
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_and_is_deterministic(ray_session):
    from kgray.pipelines.graph import UNIT, pagerank

    rng = np.random.default_rng(13)
    edges = [(f"n{int(a)}", f"n{int(b)}")
             for a, b in rng.integers(0, 60, size=(400, 2)) if a != b]
    # add a dangling node (in-edges only) and an isolated-ish star
    edges += [("n98", "n99"), ("n97", "n99"), ("n99", "n98")]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges]),
        "dst": pa.array([e[1] for e in edges])})).repartition(7)

    got1 = pagerank(ds, iters=5).to_pandas()
    got2 = pagerank(ds.random_shuffle(seed=3), iters=5).to_pandas()
    # bit-identical across partitionings/orders
    k = lambda d: sorted(zip(d["node"], d["rank_fp"]))
    assert k(got1) == k(got2)

    exp = _numpy_pagerank(edges, iters=5)
    assert len(got1) == len(exp)
    for node, fp in zip(got1["node"], got1["rank_fp"]):
        assert abs(fp / UNIT - exp[node]) < 1e-6, (node, fp / UNIT, exp[node])
    # total mass conserved (up to integer-division dust)
    assert abs(got1["rank_fp"].sum() / UNIT - 1.0) < 1e-4


def test_pagerank_dense_and_shuffle_plans_bit_identical(ray_session):
    """The broadcast (dense) plan and the join+aggregate (shuffle) plan
    run the same integer arithmetic — outputs must match bit for bit,
    including dangling-mass redistribution and duplicate-edge collapse."""
    from kgray.pipelines.graph import pagerank

    rng = np.random.default_rng(41)
    edges = [(f"e{int(a)}", f"e{int(b)}")
             for a, b in rng.integers(0, 80, size=(600, 2)) if a != b]
    edges += edges[:50]                      # duplicate edges count once
    edges += [("e200", "e201")]              # dangling sink e201
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges]),
        "dst": pa.array([e[1] for e in edges])})).repartition(5)

    dense = pagerank(ds, iters=4, plan="dense").to_pandas()
    shuffle = pagerank(ds, iters=4, plan="shuffle").to_pandas()
    k = lambda d: sorted(zip(d["node"], d["rank_fp"]))
    assert k(dense) == k(shuffle)
