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


# ------------------------------------------------------------------ label propagation


def _lpa_toy_edges():
    import pyarrow as pa
    import ray.data as rd

    def clique(pref, n):
        names = [f"{pref}{i}" for i in range(n)]
        return [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]

    edges = clique("a", 4) + clique("b", 5) + [("a0", "b0"), ("c0", "c1")]
    return rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges]),
        "dst": pa.array([e[1] for e in edges])}))


def test_lpa_cliques_and_plan_equality(ray_session):
    """Two bridged cliques resolve to two communities; an isolated edge
    forms its own; the dense and shuffle plans agree row-for-row."""
    from kgray.pipelines.graph import label_propagation

    ds = _lpa_toy_edges()
    dense = {r["node"]: r["community"]
             for r in label_propagation(ds, plan="dense").take_all()}
    shuf = {r["node"]: r["community"]
            for r in label_propagation(ds, plan="shuffle").take_all()}
    assert dense == shuf
    assert len({dense[f"a{i}"] for i in range(4)}) == 1
    assert len({dense[f"b{i}"] for i in range(5)}) == 1
    # an isolated PAIR 2-cycles under synchronous updates (the known
    # sync-LPA oscillation) — its labels stay within the pair but need
    # not coincide; what matters is it never merges into a/b
    assert {dense["c0"], dense["c1"]} <= {"c0", "c1"}
    assert dense["a0"] != dense["b1"]


def test_lpa_duplicate_and_self_edges_ignored(ray_session):
    """Input normalization: duplicated/reversed edges count once,
    self-loops never vote — the labeling is a pure function of the
    distinct undirected pair set."""
    import pyarrow as pa
    import ray.data as rd

    from kgray.pipelines.graph import label_propagation

    base = _lpa_toy_edges()
    noisy_rows = base.take_all() + [
        {"src": "b0", "dst": "a0"},          # reversed duplicate
        {"src": "a1", "dst": "a1"},          # self-loop
        {"src": "a2", "dst": "a3"},          # exact duplicate
    ]
    noisy = rd.from_arrow(pa.table({
        "src": pa.array([r["src"] for r in noisy_rows]),
        "dst": pa.array([r["dst"] for r in noisy_rows])}))
    a = sorted((r["node"], r["community"])
               for r in label_propagation(base, plan="dense").take_all())
    b = sorted((r["node"], r["community"])
               for r in label_propagation(noisy, plan="dense").take_all())
    assert a == b


def test_entity_communities_plan_equality_sf0001(ray_session):
    """The gate query's two plans agree on the real entity graph."""
    from kgray.pipelines.graph import entity_communities, label_propagation
    from kgray.pipelines.kg import kg_dataset, page_files
    from kgray.sources.derived import corpus_for_sf, models_for_corpus
    from kgray.stages.canonical import canonical_graph
    import pyarrow as pa

    sf = "/root/testdata/sf0.001"
    corpus = corpus_for_sf(sf)
    model_dir = models_for_corpus(corpus, tagger="hmm")
    graph = canonical_graph(
        kg_dataset(page_files(corpus), corpus, model_dir, tagger="hmm"))
    edges = graph.map_batches(lambda b: pa.table({
        "src": b.column("subj"), "dst": b.column("obj")}),
        batch_format="pyarrow").materialize()
    dense = sorted((r["node"], r["community"]) for r in
                   label_propagation(edges, plan="dense").take_all())
    shuf = sorted((r["node"], r["community"]) for r in
                  label_propagation(edges, plan="shuffle").take_all())
    assert dense == shuf and len(dense) > 0


def test_redirect_resolution_serial_walk(ray_session):
    """Pointer doubling (log rounds) equals the one-hop-at-a-time
    serial walk node-for-node, including hop counts, on sf0.001
    (chains up to ~16 hops resolve in ~5 doubling rounds)."""
    import hashlib

    from kgray.pipelines.graph import doc_redirect_resolution

    t = doc_redirect_resolution("/root/testdata/sf0.001").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    ids = sorted(t["doc_id"])
    rnk = {d: i + 1 for i, d in enumerate(ids)}
    by_rank = {i + 1: d for i, d in enumerate(ids)}
    h = {d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
         for d in ids}

    def nxt(r):
        d = by_rank[r]
        n = r - 1 - (h[d] % 3)
        return r if (h[d] % 4 == 0 or n < 1) else n

    assert t["n_hops"].max() >= 8          # non-vacuous chain depth
    for row in t.itertuples():
        cur, hops = rnk[row.doc_id], 0
        while nxt(cur) != cur:
            cur = nxt(cur)
            hops += 1
        assert (row.target_doc_id, row.n_hops) == (by_rank[cur], hops)
