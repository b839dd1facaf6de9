"""Session-24 batch: skip-gram counts (brute-force replay), alias
dictionary ambiguity audit (law + exposure consistency), and seeded
2-hop subgraph export (full BFS replay over the engine's own graph)."""

import hashlib
from collections import Counter

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_skipgram_brute_force(ray_session):
    from kgray.pipelines.text import token_skipgram_counts

    got = token_skipgram_counts(SF).to_pylist()
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]
                          ).column("text").to_pylist()
    c = Counter()
    for t in texts:
        toks = t.strip().split()
        if t.strip() == "":
            toks = []
        for d in (1, 2):
            for a, b in zip(toks, toks[d:]):
                c[(a, b, d)] += 1
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:40]
    exp = [{"w1": k[0], "w2": k[1], "dist": k[2], "cnt": n}
           for k, n in ranked]
    assert got == exp


def test_alias_ambiguity_laws(ray_session):
    from kgray.pipelines.graph import kg_alias_ambiguity

    rows = kg_alias_ambiguity(SF).to_pylist()
    by_s = {r["surface"]: r for r in rows}
    # the dictionary's planted ambiguous surface
    sp = by_s["Springfield"]
    assert sp["n_candidates"] == 2
    assert 0 < sp["margin_micro"] < sp["top_prior_micro"]
    # unambiguous surfaces: margin == top prior (no runner-up)
    for r in rows:
        if r["n_candidates"] == 1:
            assert r["margin_micro"] == r["top_prior_micro"]
        assert r["n_mentions"] >= 0
    # exposure is non-vacuous: the ambiguous surface is actually seen
    assert sp["n_mentions"] > 0


def test_subgraph_export_bfs_replay(ray_session):
    import __ray_entry__ as entry
    from kgray.pipelines.graph import kg_subgraph_export

    got = kg_subgraph_export(SF)
    graph = entry.queries()["kg_graph"](SF)
    triples = graph.select_columns(["subj", "pred", "obj",
                                    "support"]).take_all()
    adj = {}
    nodes = set()
    for t in triples:
        adj.setdefault(t["subj"], set()).add(t["obj"])
        adj.setdefault(t["obj"], set()).add(t["subj"])
        nodes.update((t["subj"], t["obj"]))
    seeds = sorted(nodes, key=lambda e: (
        hashlib.md5(e.encode()).hexdigest(), e))[:4]
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in (1, 2):
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        frontier = nxt - set(dist)
        for e in frontier:
            dist[e] = h
    inner = {e for e, d in dist.items() if d <= 1}
    exp = sorted(
        ((t["subj"], t["pred"], t["obj"], t["support"],
          dist.get(t["subj"], -1), dist.get(t["obj"], -1))
         for t in triples
         if t["subj"] in inner or t["obj"] in inner))
    got_rows = sorted(
        (r["subj"], r["pred"], r["obj"], r["support"],
         r["subj_hop"], r["obj_hop"]) for r in got.take_all())
    assert got_rows == exp
    assert any(h == 0 for *_, h, _o in got_rows) or \
        any(r[4] == 0 for r in got_rows)
