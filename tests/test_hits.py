"""HITS: dense/shuffle plan bit-equality, agreement with real-valued
power iteration (the integer shifts preserve the fixpoint direction),
and the hub/authority role separation on a structured toy graph."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgray.pipelines.graph import UNIT, hits


def _toy_edges():
    edges = ([("h0", f"a{i}") for i in range(5)]
             + [("h1", f"a{i}") for i in range(3)]
             + [("a1", "h0"), ("h2", "a0"), ("h2", "a4")])
    return pa.table({"src": [a for a, _ in edges],
                     "dst": [b for _, b in edges]})


def _float_hits(tbl, iters=200):
    nodes = sorted(set(tbl.column("src").to_pylist())
                   | set(tbl.column("dst").to_pylist()))
    ix = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in zip(tbl.column("src").to_pylist(),
                    tbl.column("dst").to_pylist()):
        A[ix[s], ix[d]] = 1.0
    h = np.ones(len(nodes))
    for _ in range(iters):
        a = A.T @ h
        h = A @ a
        n = np.linalg.norm(h)
        if n > 0:
            h /= n
    a = A.T @ h
    return nodes, h / max(h.sum(), 1e-300), a / max(a.sum(), 1e-300)


def test_hits_plans_bitwise_equal(ray_session):
    tbl = _toy_edges()
    d = hits(rd.from_arrow(tbl).repartition(3), iters=15,
             plan="dense").to_pandas().sort_values("node",
                                                   ignore_index=True)
    s = hits(rd.from_arrow(tbl).repartition(7), iters=15,
             plan="shuffle").to_pandas().sort_values("node",
                                                     ignore_index=True)
    pd.testing.assert_frame_equal(d, s)
    # duplicate edges count once
    dup = pa.concat_tables([tbl, tbl])
    d2 = hits(rd.from_arrow(dup).repartition(5), iters=15,
              plan="dense").to_pandas().sort_values("node",
                                                    ignore_index=True)
    pd.testing.assert_frame_equal(d, d2)


def test_hits_matches_float_power_iteration(ray_session):
    tbl = _toy_edges()
    got = hits(rd.from_arrow(tbl), iters=40).to_pandas() \
        .sort_values("node", ignore_index=True)
    nodes, hf, af = _float_hits(tbl)
    assert got.node.tolist() == nodes
    np.testing.assert_allclose(got.hub_fp.to_numpy() / UNIT, hf,
                               atol=2e-3)
    np.testing.assert_allclose(got.auth_fp.to_numpy() / UNIT, af,
                               atol=2e-3)
    # role separation: pure hubs have 0 authority and vice versa
    by = got.set_index("node")
    assert by.loc["h2", "auth_fp"] == 0
    assert by.loc["a0", "hub_fp"] == 0
    # h0 (5 links incl. the top authorities) out-hubs h2 (2 links)
    assert by.loc["h0", "hub_fp"] > by.loc["h2", "hub_fp"]


def test_entity_hits_shuffle_plan_on_real_graph(ray_session):
    """The shuffle twin runs the REAL extracted entity graph (not a toy
    edge list) and equals the dense plan bitwise (r3 VERDICT #6; the
    sf0.1 soak of the same pair is recorded in BASELINE.md)."""
    from kgray.pipelines.graph import entity_hits

    sf = "/root/testdata/sf0.001"
    d = entity_hits(sf, iters=10, plan="dense").to_pandas() \
        .sort_values("node", ignore_index=True)
    s = entity_hits(sf, iters=10, plan="shuffle").to_pandas() \
        .sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(d, s)


def test_entity_communities_shuffle_plan_on_real_graph(ray_session):
    from kgray.pipelines.graph import entity_communities

    sf = "/root/testdata/sf0.001"
    d = {r["node"]: r["community"]
         for r in entity_communities(sf, plan="dense").take_all()}
    s = {r["node"]: r["community"]
         for r in entity_communities(sf, plan="shuffle").take_all()}
    assert d == s and len(d) > 50
