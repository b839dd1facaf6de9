"""Round-3 session-2 operators: global_topk (distributed global
ORDER BY ... LIMIT k) vs a full sort, and part_copurchase_hops
(iterative multi-source BFS) vs a brute-force Python BFS on a tiny
synthetic co-purchase graph."""

import collections
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def test_global_topk_matches_full_sort(ray_session):
    from kgray.stages.topk import global_topk

    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame({
        "v": rng.integers(0, 50, n).astype(np.int64),   # heavy ties
        "d": rng.integers(0, 9, n).astype(np.int64),
        "id": rng.permutation(n).astype(np.int64),      # unique tiebreak
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(13)
    keys = [("v", "descending"), ("d", "ascending"), ("id", "ascending")]
    for k in (1, 17, n, n + 100):
        got = global_topk(ds, keys, k).to_pandas()
        exp = (df.sort_values(["v", "d", "id"],
                              ascending=[False, True, True])
               .head(k).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp[got.columns.tolist()])


def test_global_topk_empty_input(ray_session):
    from kgray.stages.topk import global_topk

    ds = rd.from_arrow(pa.table({
        "v": pa.array([], type=pa.int64()),
        "id": pa.array([], type=pa.int64())}))
    out = global_topk(ds, [("v", "descending"), ("id", "ascending")], 5)
    assert out.num_rows == 0
    assert out.schema.names == ["v", "id"]


def _brute_hops(lineitem_df, part_keys, max_hops, min_count, seed_mod):
    """Python reference: pair counts with the engine's multiplicity
    semantics (all index pairs within an order whose partkeys differ),
    threshold, bidirectional BFS from the seeds."""
    cnt = collections.Counter()
    for _, grp in lineitem_df.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"].tolist())
        m = len(parts)
        for x in range(m - 1):
            for y in range(x + 1, m):
                if parts[y] != parts[x]:
                    cnt[(parts[x], parts[y])] += 1
    adj = collections.defaultdict(set)
    for (a, b), c in cnt.items():
        if c >= min_count:
            adj[a].add(b)
            adj[b].add(a)
    seeds = [p for p in part_keys if p % seed_mod == 0]
    hops = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj[u]:
                if v not in hops:
                    hops[v] = h
                    nxt.add(v)
        frontier = nxt
    return hops


def test_part_copurchase_hops_matches_bruteforce(ray_session, tmp_path):
    from kgray.pipelines.relational import part_copurchase_hops

    rng = np.random.default_rng(23)
    n_parts, n_orders = 40, 120
    part_keys = np.arange(1, n_parts + 1, dtype=np.int64)
    rows_ok, rows_pk = [], []
    for o in range(1, n_orders + 1):
        m = rng.integers(2, 7)
        for p in rng.choice(part_keys, size=m, replace=True):
            rows_ok.append(o)
            rows_pk.append(int(p))
    li = pd.DataFrame({"l_orderkey": np.array(rows_ok, dtype=np.int64),
                       "l_partkey": np.array(rows_pk, dtype=np.int64)})
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(li),
                   os.path.join(sf, "lineitem.parquet"))
    pq.write_table(pa.table({"p_partkey": pa.array(part_keys)}),
                   os.path.join(sf, "part.parquet"))

    got = (part_copurchase_hops(sf, max_hops=3, min_count=2, seed_mod=7)
           .to_pandas().sort_values("p_partkey").reset_index(drop=True))
    exp_map = _brute_hops(li, part_keys.tolist(), 3, 2, 7)
    exp = (pd.DataFrame({"p_partkey": list(exp_map.keys()),
                         "hop": list(exp_map.values())})
           .astype(np.int64).sort_values("p_partkey")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    # non-vacuous: some node beyond the seeds is reachable at hop >= 2
    assert (exp["hop"] >= 2).any()
