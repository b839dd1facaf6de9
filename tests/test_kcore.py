"""kcore: distributed peeling vs a serial brute-force peeler — on a
planted synthetic graph (a clique wearing a fringe of tails) and on the
real co-purchase graph at sf0.001."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def _brute_kcore(edges, k):
    """Serial peeling: returns {node: degree-within-core}."""
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    return {v: len(ns) for v, ns in adj.items() if ns}


def _edge_ds(edges):
    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    return rd.from_arrow(pa.table({"src": pa.array(a),
                                   "dst": pa.array(b)})).repartition(7)


def test_kcore_planted_clique(ray_session):
    from kgray.pipelines.graph import kcore

    rng = np.random.default_rng(5)
    edges = set()
    for i in range(8):                    # 8-clique → its 7-core
        for j in range(i + 1, 8):
            edges.add((i, j))
    for t in range(100, 160):             # tails: degree-1/2 fringe
        edges.add((int(rng.integers(0, 8)), t))
        if t % 3 == 0:
            edges.add((t, t + 1000))
    edges = sorted(edges)
    for k in (2, 3, 7, 8):
        got = kcore(_edge_ds(edges), k=k).to_pandas()
        exp = _brute_kcore(edges, k)
        if len(got) == 0:       # Ray drops schema on empty datasets
            assert exp == {}
        else:
            assert dict(zip(got["node"], got["core_degree"])) == exp
    # k=7 keeps exactly the clique; k=8 empties it
    assert len(kcore(_edge_ds(edges), k=7).to_pandas()) == 8
    assert len(kcore(_edge_ds(edges), k=8).to_pandas()) == 0


def test_kcore_random_graph_matches_brute_both_plans(ray_session):
    from kgray.pipelines.graph import kcore

    rng = np.random.default_rng(11)
    n = 300
    edges = sorted({(int(a), int(b)) if a < b else (int(b), int(a))
                    for a, b in rng.integers(0, n, (1200, 2))
                    if a != b})
    for k in (2, 3, 4):
        exp = _brute_kcore(edges, k)
        for plan in ("dense", "shuffle"):
            got = kcore(_edge_ds(edges), k=k, plan=plan).to_pandas()
            assert dict(zip(got["node"], got["core_degree"])) == exp, plan


def test_copurchase_kcore_sf0001(ray_session):
    from kgray.pipelines.graph import copurchase_kcore

    sf = "/root/testdata/sf0.001"
    got = copurchase_kcore(sf, k=3, min_count=2).to_pandas()

    # serial oracle: same pair semantics as _copurchase_pair_counts
    li = pq.read_table(f"{sf}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    cnt = collections.Counter()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"].tolist())
        m = len(parts)
        for x in range(m - 1):
            for y in range(x + 1, m):
                if parts[y] != parts[x]:
                    cnt[(parts[x], parts[y])] += 1
    edges = [e for e, c in cnt.items() if c >= 2]
    exp = _brute_kcore(edges, 3)
    assert dict(zip(got["node"], got["core_degree"])) == exp
    assert 0 < len(got)                    # non-vacuous at this sf
    # sorted output contract
    assert (got["node"].values == np.sort(got["node"].values)).all()
