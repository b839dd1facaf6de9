"""Session-19 batch: degree assortativity (serial Pearson replay +
symmetry law), hub-removal robustness (serial oracle + monotonicity
laws + planted hub graph)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _edges(sf):
    from kgray.pipelines.relational import (_copurchase_pair_counts,
                                            _unpack_pair)

    p = _copurchase_pair_counts(sf) \
        .map_batches(_unpack_pair, batch_format="pyarrow").to_pandas()
    p = p[p["n_copurchase"] >= 2]
    return list(zip(p["part_a"].tolist(), p["part_b"].tolist()))


def test_assortativity_serial(ray_session):
    import math

    from kgray.pipelines.graph import copurchase_degree_assortativity

    got = copurchase_degree_assortativity(SF).to_pylist()[0]
    ed = _edges(SF)
    deg = {}
    for a, b in ed:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    dx, dy = [], []
    for a, b in ed:
        dx += [deg[a], deg[b]]
        dy += [deg[b], deg[a]]
    m = len(dx)
    sx, sy = sum(dx), sum(dy)
    sxy = sum(x * y for x, y in zip(dx, dy))
    sxx = sum(x * x for x in dx)
    syy = sum(y * y for y in dy)
    assert got["n_directed_edges"] == m
    assert got["num"] == m * sxy - sx * sy
    assert got["den2_x"] == m * sxx - sx * sx
    assert got["den2_y"] == m * syy - sy * sy
    exp = float(m * sxy - sx * sy) / math.sqrt(
        float(m * sxx - sx * sx) * float(m * syy - sy * sy))
    assert got["assortativity"] == exp
    # symmetry of the directed convention: den2_x == den2_y
    assert got["den2_x"] == got["den2_y"]
    assert -1.0 <= got["assortativity"] <= 1.0


def test_robustness_serial_and_laws(ray_session):
    from kgray.pipelines.graph import copurchase_robustness

    got = {r["k_removed"]: r
           for r in copurchase_robustness(SF).to_pylist()}
    ed = _edges(SF)
    deg = {}
    for a, b in ed:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    order = sorted(deg, key=lambda n: (-deg[n], n))
    for k in (0, 5, 20):
        removed = set(order[:k])
        surv = [(a, b) for a, b in ed
                if a not in removed and b not in removed]
        nodes = {n for e in surv for n in e}
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in surv:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        from collections import Counter
        comp = Counter(find(n) for n in nodes)
        r = got[k]
        assert r["n_edges"] == len(surv)
        assert r["n_nodes"] == len(nodes)
        assert r["largest_component"] == (max(comp.values())
                                          if comp else 0)
    # monotonicity: removing more hubs never grows anything
    for a, b in ((0, 5), (5, 20)):
        assert got[b]["n_edges"] <= got[a]["n_edges"]
        assert got[b]["largest_component"] <= got[a]["largest_component"]
    # hub removal bites: the k=20 graph lost a nontrivial share
    assert got[20]["n_edges"] < got[0]["n_edges"]
