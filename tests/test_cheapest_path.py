"""part_copurchase_cheapest vs an independent driver-side
Bellman-Ford oracle (pure Python, built straight from the parquet) —
independent of both the distributed exchange AND the DuckDB SQL."""

from collections import Counter, defaultdict

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _oracle(max_hops=3, min_count=2, seed_mod=101):
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    pair_counts = Counter()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"])
        for i in range(len(parts) - 1):
            for j in range(i + 1, len(parts)):
                if parts[i] != parts[j]:
                    pair_counts[(int(parts[i]), int(parts[j]))] += 1
    adj = defaultdict(list)
    for (a, b), c in pair_counts.items():
        if c >= min_count:
            w = 1_000_000 // c
            adj[a].append((b, w))
            adj[b].append((a, w))
    part = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey"])
    seeds = [int(p) for p in part.column("p_partkey").to_pylist()
             if p % seed_mod == 0]
    dist = {s: 0 for s in seeds}
    for _ in range(max_hops):
        nxt = dict(dist)
        for u, du in dist.items():
            for v, w in adj[u]:
                if du + w < nxt.get(v, float("inf")):
                    nxt[v] = du + w
        dist = nxt
    return dist


def test_cheapest_matches_bellman_ford(ray_session):
    from kgray.pipelines.relational import part_copurchase_cheapest

    got = part_copurchase_cheapest(SF).to_pandas()
    got_map = dict(zip(got["p_partkey"].astype(int),
                       got["min_cost"].astype(int)))
    assert got_map == _oracle()


def test_weights_are_load_bearing(ray_session):
    """Reachability must agree with the unweighted BFS (same graph,
    same rounds) while costs vary WITHIN a hop level — i.e. the answer
    is not a function of hop count, so the min-plus fold (not the BFS
    min-hop fold) is what's being verified."""
    from kgray.pipelines.relational import (part_copurchase_cheapest,
                                            part_copurchase_hops)

    cost = part_copurchase_cheapest(SF).to_pandas()
    hops = part_copurchase_hops(SF).to_pandas()
    assert set(cost["p_partkey"]) == set(hops["p_partkey"])
    m = cost.merge(hops, on="p_partkey")
    # seeds cost exactly 0
    assert (m.loc[m["hop"] == 0, "min_cost"] == 0).all()
    # some hop level has ≥ 2 distinct costs (weights observable)
    spread = m[m["hop"] > 0].groupby("hop")["min_cost"].nunique()
    assert (spread >= 2).any()
