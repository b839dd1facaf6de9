"""Part-centric analytics: hierarchy recursion, similarity, pricing, revenue ABC, graph-adjacent part features.

Split from the former single-file relational pipeline module; see
``kgray/pipelines/relational/__init__.py`` for the package map.
"""

from __future__ import annotations
import math
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ...stages.aggregate import sorted_group_aggregate

from ._shared import (  # noqa: F401
    _SEARCH_QUERIES,
    _cents,
    _copurchase_pair_counts,
    _md5_rank15,
    _path_of,
    _unpack_pair,
)
from .copurchase import copurchase_triangles


def part_type_stats(sf_dir: str):
    """Groupby with min/max/count over part: p_type size stats."""
    prepped = (rd.read_parquet(f"{sf_dir}/part.parquet",
                               columns=["p_type", "p_size", "p_retailprice"])
               .map_batches(lambda b: pa.table({
                   "p_type": b.column("p_type"),
                   "n_parts": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                   "min_size": pc.cast(b.column("p_size"), pa.int64()),
                   "max_size": pc.cast(b.column("p_size"), pa.int64()),
                   "price_cents": _cents(b.column("p_retailprice"))}),
                   batch_format="pyarrow", zero_copy_batch=True))
    return sorted_group_aggregate(prepped, "p_type",
                                  [("n_parts", "sum"), ("min_size", "min"),
                                   ("max_size", "max"), ("price_cents", "sum")])


def part_copurchase_topk(sf_dir: str, k: int = 20):
    """Market-basket co-occurrence: the top-k part pairs appearing on
    the same order (the classic self-join-on-the-fact-table pattern —
    SQL expresses it as lineitem ⋈ lineitem on orderkey with
    ``part_a < part_b``).  Pair counting is the bounded-run exchange in
    :func:`_copurchase_pair_counts`; the top-k sorts the (already
    combined) pair table with a full deterministic tie-break
    (cnt desc, part_a, part_b)."""
    total = _copurchase_pair_counts(sf_dir)
    return (total.map_batches(_unpack_pair, batch_format="pyarrow",
                              zero_copy_batch=True)
            .sort(["n_copurchase", "part_a", "part_b"],
                  descending=[True, False, False]).limit(k))


def part_copurchase_hops(sf_dir: str, max_hops: int = 3,
                         min_count: int = 2, seed_mod: int = 101):
    """Multi-source BFS (min-hop labels) over the co-purchase graph:
    starting from the seed parts (``p_partkey % seed_mod == 0``), the
    minimum number of co-purchase edges (support ≥ ``min_count``) to
    reach each part, capped at ``max_hops``.

    Frontier-relaxation plan (the same 1-join + 1-min-agg-per-round
    shape as :mod:`kgray.pipelines.cluster`'s connected components):
    at round h only the hop-(h−1) frontier joins the edge set — a node
    re-reached later keeps its smaller label through the min aggregate,
    and no labels table, frontier, or edge list ever lands on the
    driver.  The edge set is pinned once (consumed every round).  The
    oracle is a DuckDB ``WITH RECURSIVE`` breadth-first query — the
    exactness gate covers an *iterative* pipeline, not just one-shot
    SQL shapes."""
    from ...stages.join import sorted_merge_join

    total = _copurchase_pair_counts(sf_dir)
    edges_ab = (total.map_batches(_unpack_pair, batch_format="pyarrow",
                                  zero_copy_batch=True)
                .filter(expr=f"n_copurchase >= {int(min_count)}"))

    def both_ways(b: pa.Table) -> pa.Table:
        a = b.column("part_a").combine_chunks()
        c = b.column("part_b").combine_chunks()
        return pa.table({"src": pa.chunked_array([a, c]),
                         "dst": pa.chunked_array([c, a])})

    edges = edges_ab.map_batches(both_ways, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    pk = part.column("p_partkey").to_numpy()
    seed_keys = pa.array(pk[pk % seed_mod == 0], type=pa.int64())
    labels = rd.from_arrow(pa.table({
        "node": seed_keys,
        "hop": pa.array(np.zeros(len(seed_keys), dtype=np.int64))}))

    for h in range(1, max_hops + 1):
        frontier = (labels.filter(expr=f"hop == {h - 1}")
                    .map_batches(lambda b: pa.table({
                        "src": b.column("node")}),
                        batch_format="pyarrow", zero_copy_batch=True))
        cand = sorted_merge_join(frontier, edges, on="src")
        cand = cand.map_batches(lambda b, _h=h: pa.table({
            "node": b.column("dst"),
            "hop": pa.array(np.full(b.num_rows, _h, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True)
        labels = sorted_group_aggregate(labels.union(cand), ["node"],
                                        [("hop", "min")],
                                        precombine=True).materialize()
    return labels.map_batches(lambda b: pa.table({
        "p_partkey": b.column("node"), "hop": b.column("hop")}),
        batch_format="pyarrow", zero_copy_batch=True)


def part_copurchase_cheapest(sf_dir: str, max_hops: int = 3,
                             min_count: int = 2, seed_mod: int = 101):
    """Hop-bounded WEIGHTED shortest path (min-plus Bellman-Ford) over
    the co-purchase graph: cheapest total edge cost from the seed parts
    (``p_partkey % seed_mod == 0``) to every part reachable within
    ``max_hops`` edges, where traversing an edge of support ``c`` costs
    ``1_000_000 // c`` (stronger ties are cheaper; integer division
    keeps every cost exact int64).

    :func:`part_copurchase_hops` is the UNWEIGHTED special case; the
    weighted relaxation is the genuinely new exchange: each round joins
    the FULL label set (not just a frontier — a node's cost can improve
    at any round through a longer-but-cheaper path) with the pinned
    edge set and folds ``min(cost)``, i.e. exactly the Bellman-Ford
    recurrence d_k(v) = min(d_{k-1}(v), min_u d_{k-1}(u) + w(u,v)).
    The oracle mirrors the same recurrence as ``max_hops`` chained
    CTE rounds — no recursive path enumeration, so it cannot blow up
    on hub-heavy graphs, and every intermediate is integer-exact."""
    from ...stages.join import sorted_merge_join

    total = _copurchase_pair_counts(sf_dir)
    edges_ab = (total.map_batches(_unpack_pair, batch_format="pyarrow",
                                  zero_copy_batch=True)
                .filter(expr=f"n_copurchase >= {int(min_count)}"))

    def both_ways(b: pa.Table) -> pa.Table:
        a = b.column("part_a").combine_chunks()
        c = b.column("part_b").combine_chunks()
        n = b.column("n_copurchase").to_numpy(zero_copy_only=False)
        w = pa.array(np.concatenate([1_000_000 // n, 1_000_000 // n]),
                     type=pa.int64())
        return pa.table({"src": pa.chunked_array([a, c]),
                         "dst": pa.chunked_array([c, a]),
                         "w": w})

    edges = edges_ab.map_batches(both_ways, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    pk = part.column("p_partkey").to_numpy()
    seed_keys = pa.array(pk[pk % seed_mod == 0], type=pa.int64())
    labels = rd.from_arrow(pa.table({
        "node": seed_keys,
        "cost": pa.array(np.zeros(len(seed_keys), dtype=np.int64))}))

    for _ in range(max_hops):
        relax_in = labels.map_batches(lambda b: pa.table({
            "src": b.column("node"), "cost": b.column("cost")}),
            batch_format="pyarrow", zero_copy_batch=True)
        cand = sorted_merge_join(relax_in, edges, on="src")
        cand = cand.map_batches(lambda b: pa.table({
            "node": b.column("dst"),
            "cost": pc.add_checked(b.column("cost"), b.column("w"))}),
            batch_format="pyarrow", zero_copy_batch=True)
        labels = sorted_group_aggregate(labels.union(cand), ["node"],
                                        [("cost", "min")],
                                        precombine=True).materialize()
    return labels.map_batches(lambda b: pa.table({
        "p_partkey": b.column("node"), "min_cost": b.column("cost")}),
        batch_format="pyarrow", zero_copy_batch=True)


def part_similarity_topk(sf_dir: str, k: int = 5, min_count: int = 2):
    """Item-item collaborative-filtering similarity: for every part,
    the top-``k`` most similar parts by binary cosine over the
    order×part bipartite incidence — score(a,b) = c_ab /
    (√deg_a · √deg_b) with c_ab the co-purchase pair count (support ≥
    ``min_count``) and deg the part's lineitem count.

    Plan: the shared pair-count exchange (no quadratic self-join),
    degrees as one small aggregate, two sorted-merge joins to attach
    both endpoint degrees (scale-safe: the degree table is
    dimension-sized but never broadcast), the IEEE-mirrored score per
    row (divide / sqrt are elementwise, so vectorization cannot change
    the bits), then one grouped_topk exchange.  Ties on equal scores
    break by part_b ascending — the same total order as the oracle's
    ROW_NUMBER."""
    from ...stages.join import sorted_merge_join
    from ...stages.topk import grouped_topk

    total = _copurchase_pair_counts(sf_dir)
    pairs = (total.map_batches(_unpack_pair, batch_format="pyarrow",
                               zero_copy_batch=True)
             .filter(expr=f"n_copurchase >= {int(min_count)}"))

    def both_dirs(b: pa.Table) -> pa.Table:
        a = b.column("part_a").combine_chunks()
        c = b.column("part_b").combine_chunks()
        n = b.column("n_copurchase").combine_chunks()
        return pa.table({"part_a": pa.chunked_array([a, c]),
                         "part_b": pa.chunked_array([c, a]),
                         "c_ab": pa.chunked_array([n, n])})

    sym = pairs.map_batches(both_dirs, batch_format="pyarrow",
                            zero_copy_batch=True)

    deg = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
        .map_batches(lambda b: pa.table({
            "part_a": b.column("l_partkey"),
            "deg_a": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["part_a"], [("deg_a", "sum")]).materialize()

    with_a = sorted_merge_join(sym, deg, on="part_a")
    deg_b = deg.map_batches(lambda b: pa.table({
        "part_b": b.column("part_a"), "deg_b": b.column("deg_a")}),
        batch_format="pyarrow", zero_copy_batch=True)
    with_ab = sorted_merge_join(with_a, deg_b, on="part_b")

    def score(b: pa.Table) -> pa.Table:
        c = b.column("c_ab").to_numpy(zero_copy_only=False).astype(np.float64)
        da = b.column("deg_a").to_numpy(zero_copy_only=False).astype(np.float64)
        db = b.column("deg_b").to_numpy(zero_copy_only=False).astype(np.float64)
        s = c / (np.sqrt(da) * np.sqrt(db))
        return pa.table({"part_a": b.column("part_a"),
                         "part_b": b.column("part_b"),
                         "c_ab": b.column("c_ab"),
                         "cosine": pa.array(s, type=pa.float64())})

    scored = with_ab.map_batches(score, batch_format="pyarrow",
                                 zero_copy_batch=True)
    top = grouped_topk(scored, group="part_a", order_col="cosine",
                       tiebreak="part_b", k=k, descending=True)
    return top.map_batches(lambda b: pa.table({
        "part_a": b.column("part_a"), "part_b": b.column("part_b"),
        "c_ab": b.column("c_ab"), "cosine": b.column("cosine"),
        "sim_rank": b.column("rank")}),
        batch_format="pyarrow", zero_copy_batch=True)


def part_clustering_coefficient(sf_dir: str, min_count: int = 2):
    """Per-node local clustering coefficient of the thresholded
    co-purchase graph: ``cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1))`` —
    the standard 'how clique-like is this node's neighborhood' motif
    statistic on top of the triangle enumeration.

    Plan: the thresholded edge set materializes ONCE and is shared by
    the triangle two-join plan (``copurchase_triangles(edges=...)``)
    and the degree aggregate; per-node triangle counts come from a
    vertex explode of the enumerated (a<b<c) triangles; the final left
    join zero-fills triangle-free nodes.  The coefficient is the one
    IEEE division of exact integers (SQL-mirrored), so the gate is
    bitwise."""
    from ...stages.join import sorted_merge_join

    edges = (_copurchase_pair_counts(sf_dir)
             .map_batches(_unpack_pair, batch_format="pyarrow",
                          zero_copy_batch=True)
             .filter(expr=f"n_copurchase >= {int(min_count)}")
             .materialize())
    tris = copurchase_triangles(sf_dir, min_count=min_count, edges=edges)

    def tri_nodes(b: pa.Table) -> pa.Table:
        v = np.concatenate([
            b.column("part_a").to_numpy(zero_copy_only=False),
            b.column("part_b").to_numpy(zero_copy_only=False),
            b.column("part_c").to_numpy(zero_copy_only=False)])
        return pa.table({"part": pa.array(v, type=pa.int64()),
                         "n_tri": pa.array(np.ones(len(v), dtype=np.int64))})

    tri_cnt = sorted_group_aggregate(
        tris.map_batches(tri_nodes, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["part"], [("n_tri", "sum")])

    def endpoints(b: pa.Table) -> pa.Table:
        v = np.concatenate([
            b.column("part_a").to_numpy(zero_copy_only=False),
            b.column("part_b").to_numpy(zero_copy_only=False)])
        return pa.table({"part": pa.array(v, type=pa.int64()),
                         "degree": pa.array(np.ones(len(v), dtype=np.int64))})

    deg = sorted_group_aggregate(
        edges.map_batches(endpoints, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["part"], [("degree", "sum")])

    joined = sorted_merge_join(deg, tri_cnt, on="part", how="left")

    def finish(b: pa.Table) -> pa.Table:
        d = b.column("degree").to_numpy(zero_copy_only=False)
        t = pc.fill_null(b.column("n_tri"), 0).to_numpy(zero_copy_only=False)
        denom = d * (d - 1)
        cc = np.where(denom > 0, (2.0 * t) / denom.astype(np.float64), 0.0)
        return pa.table({
            "part": b.column("part"),
            "degree": pa.array(d, type=pa.int64()),
            "n_tri": pa.array(t, type=pa.int64()),
            "clustering": pa.array(cc, type=pa.float64())})

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def part_negative_samples(sf_dir: str, k: int = 5, attempts: int = 16,
                          min_count: int = 2):
    """Deterministic negative-sampling table for contrastive training
    over the co-purchase graph: for every part with at least one
    positive (a thresholded co-purchase partner), up to ``k`` hashed
    negative parts that are NOT positives — the word2vec/contrastive
    sampling step as a reproducible dataset instead of an RNG stream.

    Candidate ``j`` for anchor ``a`` is the part at position
    ``md5(a|j) % n_parts`` of the partkey-sorted dimension (a pure
    function of the data — retries and engines agree); self-hits drop;
    positives drop via a distributed ANTI semi-join on the packed pair
    key (the scale path — the positive set is edge-sized and never
    broadcast); the first ``k`` surviving attempts per anchor come from
    ``grouped_topk`` on the attempt index.  The part dimension itself
    is broadcast (dimension-sized by definition)."""
    import hashlib

    from ...stages.semijoin import semi_join
    from ...stages.topk import grouped_topk

    edges = (_copurchase_pair_counts(sf_dir)
             .map_batches(_unpack_pair, batch_format="pyarrow",
                          zero_copy_batch=True)
             .filter(expr=f"n_copurchase >= {int(min_count)}")
             .materialize())
    anchors = sorted_group_aggregate(
        edges.map_batches(lambda b: pa.table({
            "anchor": pa.concat_arrays([
                b.column("part_a").combine_chunks(),
                b.column("part_b").combine_chunks()]),
            "one": pa.array(np.ones(2 * b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow"),
        ["anchor"], [("one", "sum")]).drop_columns(["one"])

    parts_sorted = np.sort(pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"]).column("p_partkey").to_numpy())
    n_parts = len(parts_sorted)
    parts_ref = ray.put(parts_sorted)

    def candidates(b: pa.Table) -> pa.Table:
        ps = ray.get(parts_ref)
        a = b.column("anchor").to_numpy(zero_copy_only=False)
        anc, cand, att = [], [], []
        for av in a:
            for j in range(1, attempts + 1):
                h = int(hashlib.md5(f"{av}|{j}".encode())
                        .hexdigest()[:8], 16)
                cv = int(ps[h % n_parts])
                if cv != av:
                    anc.append(int(av))
                    cand.append(cv)
                    att.append(j)
        lo = np.minimum(anc, cand).astype(np.int64)
        hi = np.maximum(anc, cand).astype(np.int64)
        return pa.table({
            "anchor": pa.array(anc, type=pa.int64()),
            "neg_part": pa.array(cand, type=pa.int64()),
            "attempt": pa.array(att, type=pa.int64()),
            "pair": pa.array((lo << 32) | hi, type=pa.int64())})

    cand_ds = anchors.map_batches(candidates, batch_format="pyarrow",
                                  zero_copy_batch=True)
    pos_keys = edges.map_batches(lambda b: pa.table({
        "pair": pa.array(
            (b.column("part_a").to_numpy(zero_copy_only=False) << 32)
            | b.column("part_b").to_numpy(zero_copy_only=False),
            type=pa.int64())}), batch_format="pyarrow")
    negatives = semi_join(cand_ds, pos_keys, on="pair", anti=True,
                          bloom_bits=1 << 20)
    return grouped_topk(negatives.drop_columns(["pair"]), "anchor",
                        "attempt", "neg_part", k=k, descending=False) \
        .drop_columns(["rank"])


def part_adamic_adar(sf_dir: str, k: int = 30, min_count: int = 2):
    """Link prediction over the co-purchase graph by Adamic–Adar: for
    every NON-adjacent part pair (a, b), score = Σ_z 1/ln(deg z) over
    their common neighbors z — the classic KG-completion baseline
    (predict which parts *would* co-occur, from shared neighborhoods).

    Plan (all distributed, the triangle-enumeration shape): thresholded
    edge set from the shared pair-count exchange → degrees as one small
    aggregate over the symmetric edge list → per-mid integer weight
    ``w(z) = floor(1e6 / ln(deg z))`` (micro-units; ``math.log`` on the
    integer degree is bitwise equal to DuckDB ``ln``, and the divide /
    floor are single IEEE ops mirrored operand-for-operand) → wedge
    join on the middle vertex (bounded by Σ deg² of the THRESHOLDED
    graph — ``min_count`` is the 100-TB fan-out knob, exactly as in
    :func:`copurchase_triangles`) → packed-key aggregate → ANTI
    semi-join against the edge set (predicted pairs must not already
    be edges) → global top-k.  Mids with deg == 1 carry no information
    (ln 1 = 0) and are excluded from the weight table on both sides.
    """
    from ...stages.join import sorted_merge_join
    from ...stages.semijoin import semi_join
    from ...stages.topk import global_topk

    import math

    total = _copurchase_pair_counts(sf_dir)
    edges = (total.map_batches(_unpack_pair, batch_format="pyarrow",
                               zero_copy_batch=True)
             .filter(expr=f"n_copurchase >= {int(min_count)}")
             .materialize())          # consumed 3x (2 wedge sides, anti)

    def both_dirs(b: pa.Table) -> pa.Table:
        a = b.column("part_a").combine_chunks()
        c = b.column("part_b").combine_chunks()
        return pa.table({"src": pa.chunked_array([a, c]),
                         "dst": pa.chunked_array([c, a])})

    sym = edges.map_batches(both_dirs, batch_format="pyarrow",
                            zero_copy_batch=True)

    deg = sorted_group_aggregate(
        sym.map_batches(lambda b: pa.table({
            "node": b.column("src"),
            "deg": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["node"], [("deg", "sum")])

    def weigh(b: pa.Table) -> pa.Table:
        d = b.column("deg").to_numpy(zero_copy_only=False)
        keep = d >= 2
        dk = d[keep]
        uniq, inv = np.unique(dk, return_inverse=True)
        w = np.array([math.floor(1e6 / math.log(float(u))) for u in uniq],
                     dtype=np.int64)[inv]
        return pa.table({
            "mid": b.column("node").filter(pa.array(keep)),
            "w": pa.array(w, type=pa.int64())})

    wtab = deg.map_batches(weigh, batch_format="pyarrow",
                           zero_copy_batch=True)

    # wedge (x, z, y), x < y: sym(dst=z → x) ⋈ sym(src=z → y) ⋈ w(z)
    left = sym.map_batches(lambda b: pa.table({
        "mid": b.column("dst"), "part_a": b.column("src")}),
        batch_format="pyarrow", zero_copy_batch=True)
    right = sorted_merge_join(
        sym.map_batches(lambda b: pa.table({
            "mid": b.column("src"), "part_b": b.column("dst")}),
            batch_format="pyarrow", zero_copy_batch=True),
        wtab, on="mid")
    wedges = sorted_merge_join(left, right, on="mid")

    def pack(b: pa.Table) -> pa.Table:
        a = b.column("part_a").to_numpy(zero_copy_only=False)
        c = b.column("part_b").to_numpy(zero_copy_only=False)
        keep = a < c
        return pa.table({
            "ab": pa.array(((a << 32) | c)[keep], type=pa.int64()),
            "w": b.column("w").filter(pa.array(keep)),
            "one": pa.array(np.ones(int(keep.sum()), dtype=np.int64))})

    aa = sorted_group_aggregate(
        wedges.map_batches(pack, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["ab"], [("w", "sum"), ("one", "sum")])

    edge_keys = edges.map_batches(lambda b: pa.table({
        "ab": pa.array(
            (b.column("part_a").to_numpy(zero_copy_only=False) << 32)
            | b.column("part_b").to_numpy(zero_copy_only=False),
            type=pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    nonedge = semi_join(aa, edge_keys, on="ab", anti=True)

    scored = nonedge.map_batches(lambda b: pa.table({
        "part_a": pa.array(
            b.column("ab").to_numpy(zero_copy_only=False) >> 32,
            type=pa.int64()),
        "part_b": pa.array(
            b.column("ab").to_numpy(zero_copy_only=False) & 0xFFFFFFFF,
            type=pa.int64()),
        "n_common": b.column("one"),
        "aa_micro": b.column("w")}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    return global_topk(scored, [("aa_micro", "descending"),
                                ("part_a", "ascending"),
                                ("part_b", "ascending")], k)


def part_khop_sample(sf_dir: str, fanout: int = 3, seed_mod: int = 20,
                     min_count: int = 2):
    """GraphSAGE-style k-hop neighborhood sampling over the co-purchase
    graph — the subgraph extraction a GNN training pipeline runs per
    minibatch, made a pure function of the data so resumes/retries see
    the identical sample.

    Seeds = graph nodes with md5 bucket ``% seed_mod == 0``.  Hop 1:
    each seed keeps its ``fanout`` lowest-md5-rank incident edges
    (rank = md5 of the packed ``src·2³² + dst`` edge key — per-EDGE, so
    a node sampled from two frontiers keeps the same neighbors).  Hop
    2: the distinct hop-1 destinations expand the same way.  Output is
    the sampled edge list (hop, src, dst, rk).

    Scale shape: two semi-joins (seed/frontier sets, dimension-sized)
    + two ``grouped_topk`` exchanges (survivors capped at fanout rows
    per node per block) — never a full neighborhood materialization;
    hop frontiers grow at most ``fanout×`` per hop by construction."""
    from ...functions.sampling import _md5_bucket
    from ...stages.semijoin import semi_join
    from ...stages.topk import grouped_topk

    total = _copurchase_pair_counts(sf_dir)
    edges = (total.map_batches(_unpack_pair, batch_format="pyarrow",
                               zero_copy_batch=True)
             .filter(expr=f"n_copurchase >= {int(min_count)}"))

    def both_dirs(b: pa.Table) -> pa.Table:
        a = b.column("part_a").combine_chunks()
        c = b.column("part_b").combine_chunks()
        return pa.table({"src": pa.chunked_array([a, c]),
                         "dst": pa.chunked_array([c, a])})

    sym = edges.map_batches(both_dirs, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()  # 3 uses

    def rank(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("rk", pa.array([], type=pa.int64()))
        s = b.column("src").to_numpy(zero_copy_only=False)
        d = b.column("dst").to_numpy(zero_copy_only=False)
        return b.append_column(
            "rk", pa.array(_md5_rank15((s << 32) | d), type=pa.int64()))

    def seed_filter(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        m = _md5_bucket(b.column("src").to_pylist(), seed_mod) == 0
        return b.filter(pa.array(m))

    h1 = grouped_topk(
        sym.map_batches(seed_filter, batch_format="pyarrow",
                        zero_copy_batch=True)
        .map_batches(rank, batch_format="pyarrow", zero_copy_batch=True),
        group="src", order_col="rk", tiebreak="dst", k=fanout,
        descending=False)

    frontier = sorted_group_aggregate(
        h1.map_batches(lambda b: pa.table({
            "src": b.column("dst"),
            "n": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["src"], [("n", "sum")]).drop_columns(["n"])

    h2 = grouped_topk(
        semi_join(sym, frontier, on="src")
        .map_batches(rank, batch_format="pyarrow", zero_copy_batch=True),
        group="src", order_col="rk", tiebreak="dst", k=fanout,
        descending=False)

    def label(hop):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                "hop": pa.array(np.full(b.num_rows, hop, dtype=np.int64)),
                "src": b.column("src"), "dst": b.column("dst"),
                "rk": b.column("rk")})
        return fn

    return (h1.map_batches(label(1), batch_format="pyarrow",
                           zero_copy_batch=True)
            .union(h2.map_batches(label(2), batch_format="pyarrow",
                                  zero_copy_batch=True)))


def part_random_walks(sf_dir: str, walk_len: int = 3, seed_mod: int = 20,
                      min_count: int = 2):
    """DeepWalk-style corpus generation over the co-purchase graph —
    the walk table that feeds skip-gram node embeddings — made a pure
    function of the data: from each md5-selected seed, step t moves to
    the out-neighbor minimizing ``md5(walk·2³⁴ + t·2³² + dst)`` (the
    walk id rides in the rank key, so distinct walks crossing the same
    node diverge like independent random draws; ids must fit 29/32
    bits — widen the packing to two md5 words past ~5e8 nodes).

    Scale shape per step: one frontier×edges ``sorted_merge_join``
    (frontier is seed-sized, never grows — each walk keeps exactly one
    successor) + one ``grouped_topk(k=1)`` exchange; ``walk_len``
    rounds total.  Dead ends just end the walk (the symmetric graph
    has none, but the op doesn't assume that)."""
    from ...functions.sampling import _md5_bucket
    from ...stages.join import sorted_merge_join
    from ...stages.topk import grouped_topk

    total = _copurchase_pair_counts(sf_dir)
    edges = (total.map_batches(_unpack_pair, batch_format="pyarrow",
                               zero_copy_batch=True)
             .filter(expr=f"n_copurchase >= {int(min_count)}"))

    def both_dirs(b: pa.Table) -> pa.Table:
        a = b.column("part_a").combine_chunks()
        c = b.column("part_b").combine_chunks()
        return pa.table({"src": pa.chunked_array([a, c]),
                         "dst": pa.chunked_array([c, a])})

    sym = edges.map_batches(both_dirs, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def seeds_fn(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        # md5-selected seeds; global distinct via the min-aggregate
        keep = _md5_bucket(s.tolist(), seed_mod) == 0
        return pa.table({
            "walk": pa.array(s[keep]),
            "one": pa.array(np.ones(int(keep.sum()), dtype=np.int64))})

    frontier = sorted_group_aggregate(
        sym.map_batches(seeds_fn, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["walk"], [("one", "min")]).map_batches(
        lambda b: pa.table({"walk": b.column("walk"),
                            "src": b.column("walk")}),
        batch_format="pyarrow", zero_copy_batch=True)

    outs = [frontier.map_batches(lambda b: pa.table({
        "walk": b.column("walk"),
        "step": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
        "node": b.column("src")}), batch_format="pyarrow",
        zero_copy_batch=True)]

    for t in range(1, walk_len + 1):
        def rank(b: pa.Table, _t=t) -> pa.Table:
            if b.num_rows == 0:
                return b.append_column("rk",
                                       pa.array([], type=pa.int64()))
            w = b.column("walk").to_numpy(zero_copy_only=False)
            d = b.column("dst").to_numpy(zero_copy_only=False)
            return b.append_column(
                "rk", pa.array(_md5_rank15(
                    (w << 34) | (np.int64(_t) << 32) | d),
                    type=pa.int64()))

        step = grouped_topk(
            sorted_merge_join(frontier, sym, on="src")
            .map_batches(rank, batch_format="pyarrow",
                         zero_copy_batch=True),
            group="walk", order_col="rk", tiebreak="dst", k=1,
            descending=False).materialize()
        outs.append(step.map_batches(lambda b, _t=t: pa.table({
            "walk": b.column("walk"),
            "step": pa.array(np.full(b.num_rows, _t, dtype=np.int64)),
            "node": b.column("dst")}), batch_format="pyarrow",
            zero_copy_batch=True))
        frontier = step.map_batches(lambda b: pa.table({
            "walk": b.column("walk"), "src": b.column("dst")}),
            batch_format="pyarrow", zero_copy_batch=True)

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def part_price_stump(sf_dir: str):
    """Decision-stump split search — the inner loop of tree learners:
    the retail-price threshold best separating budget parts
    (label = ``p_type IN ('SMALL','ECONOMY')``) by weighted Gini
    impurity.

    Distributed shape: distinct-price histogram aggregate → the
    ``grouped_running_sum`` prefix-scan exchange (twice: counts,
    positives) → per-threshold score → top-1.  The score is float64
    computed from exact int64 partials in EXACTLY the oracle's
    expression order (``(double(nL) − double(posL²+negL²)/double(nL))
    + (same for R)``), so the argmin is bitwise stable; ties break on
    the lower threshold."""
    from ...stages.scan import grouped_running_sum

    def prep(b: pa.Table) -> pa.Table:
        y = pc.cast(pc.is_in(
            b.column("p_type"),
            value_set=pa.array(["SMALL", "ECONOMY"])), pa.int64())
        return pa.table({
            "cents": _cents(b.column("p_retailprice")),
            "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "pos": y})

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_retailprice", "p_type"])
    hist = sorted_group_aggregate(
        part.map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["cents"], [("n", "sum"), ("pos", "sum")], precombine=True) \
        .map_batches(lambda b: b.append_column(
            "one", pa.array(np.ones(b.num_rows, dtype=np.int64))),
        batch_format="pyarrow", zero_copy_batch=True)
    n_tot = hist.sum("n")
    pos_tot = hist.sum("pos")

    cum = grouped_running_sum(hist, "one", ["cents"], "n",
                              out_name="n_left")
    cum = grouped_running_sum(cum, "one", ["cents"], "pos",
                              out_name="pos_left")

    def score(b: pa.Table, _nt=n_tot, _pt=pos_tot) -> pa.Table:
        nl = b.column("n_left").to_numpy(zero_copy_only=False)
        pl = b.column("pos_left").to_numpy(zero_copy_only=False)
        keep = nl < _nt
        nl, pl = nl[keep], pl[keep]
        cents = b.column("cents").to_numpy(zero_copy_only=False)[keep]
        nr, pr = _nt - nl, _pt - pl
        gw = np.empty(len(nl), dtype=np.float64)
        for i in range(len(nl)):
            nli, pli = int(nl[i]), int(pl[i])
            nri, pri = int(nr[i]), int(pr[i])
            gl = float(pli * pli + (nli - pli) * (nli - pli)) / float(nli)
            gr = float(pri * pri + (nri - pri) * (nri - pri)) / float(nri)
            gw[i] = (float(nli) - gl) + (float(nri) - gr)
        return pa.table({
            "split_cents": pa.array(cents, type=pa.int64()),
            "n_left": pa.array(nl, type=pa.int64()),
            "pos_left": pa.array(pl, type=pa.int64()),
            "n_right": pa.array(nr, type=pa.int64()),
            "pos_right": pa.array(pr, type=pa.int64()),
            "gini_weighted": pa.array(gw, type=pa.float64())})

    return (cum.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)
            .sort(["gini_weighted", "split_cents"]).limit(1))


def part_substring_search(sf_dir: str):
    """Trigram-indexed substring search — the text-search-index op
    (pg_trgm's plan): part names explode once into a distinct
    (trigram, part) posting exchange; each query's trigrams intersect
    postings (candidates must hold ALL query trigrams — an m-way
    posting-count equality, not a scan), and candidates verify with
    the exact substring test so the trigram filter can never
    over-return.  Output: (query, p_partkey) exactly equal to LIKE
    '%q%' (the oracle).  Queries shorter than 3 chars would need the
    full-scan fallback — excluded by construction here."""
    from ...stages.join import sorted_merge_join

    def grams(s: str) -> set:
        return {s[i:i + 3] for i in range(len(s) - 2)}

    q_grams = {q: sorted(grams(q)) for q in _SEARCH_QUERIES}
    all_q = sorted({g for gs in q_grams.values() for g in gs})

    def postings(b: pa.Table) -> pa.Table:
        out_g, out_p = [], []
        gset = set(all_q)
        for pk, name in zip(b.column("p_partkey").to_pylist(),
                            b.column("p_name").to_pylist()):
            for g in grams(name):
                if g in gset:            # only query-relevant trigrams
                    out_g.append(g)
                    out_p.append(pk)
        return pa.table({"gram": pa.array(out_g, type=pa.string()),
                         "p_partkey": pa.array(out_p, type=pa.int64())})

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"])
    post = part.map_batches(postings, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    # candidate = part holding ALL of a query's trigrams: per (query,
    # part) matched-gram count == len(query grams)
    def tag(b: pa.Table) -> pa.Table:
        out_q, out_p = [], []
        g2q = {}
        for q, gs in q_grams.items():
            for g in gs:
                g2q.setdefault(g, []).append(q)
        for g, p in zip(b.column("gram").to_pylist(),
                        b.column("p_partkey").to_pylist()):
            for q in g2q.get(g, ()):
                out_q.append(q)
                out_p.append(p)
        return pa.table({
            "query": pa.array(out_q, type=pa.string()),
            "p_partkey": pa.array(out_p, type=pa.int64()),
            "n": pa.array(np.ones(len(out_q), dtype=np.int64))})

    cand = sorted_group_aggregate(
        post.map_batches(tag, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["query", "p_partkey"], [("n", "sum")], precombine=True)

    need = {q: len(gs) for q, gs in q_grams.items()}

    def full(b: pa.Table) -> pa.Table:
        qs = b.column("query").to_pylist()
        n = b.column("n").to_numpy(zero_copy_only=False)
        keep = np.array([ni == need[q] for q, ni in zip(qs, n)],
                        dtype=bool)
        return b.filter(pa.array(keep)).select(["query", "p_partkey"])

    cands = cand.map_batches(full, batch_format="pyarrow",
                             zero_copy_batch=True)

    # exact verify: fetch candidate names via a join, test substring
    names = part.map_batches(lambda b: pa.table({
        "p_partkey": b.column("p_partkey"), "p_name": b.column("p_name")}),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = sorted_merge_join(cands, names, on="p_partkey")

    def verify(b: pa.Table) -> pa.Table:
        keep = np.array([q in nm for q, nm in
                         zip(b.column("query").to_pylist(),
                             b.column("p_name").to_pylist())], dtype=bool)
        return b.filter(pa.array(keep)).select(["query", "p_partkey"])

    return joined.map_batches(verify, batch_format="pyarrow",
                              zero_copy_batch=True)


def part_supplier_hhi(sf_dir: str):
    """Supplier-concentration risk per part: the Herfindahl–Hirschman
    index of lineitem share across suppliers — ``Σ c_s² / T²`` as ONE
    float division of exact int64 partials (mirrored), 1.0 = single
    supplier.  Two mergeable aggregates, both map-side combined."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    ps = sorted_group_aggregate(
        li.map_batches(lambda b: pa.table({
            "l_partkey": b.column("l_partkey"),
            "l_suppkey": b.column("l_suppkey"),
            "c": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey", "l_suppkey"], [("c", "sum")], precombine=True)
    agg = sorted_group_aggregate(
        ps.map_batches(lambda b: pa.table({
            "l_partkey": b.column("l_partkey"),
            "t": b.column("c"),
            "ss": pc.multiply(b.column("c"), b.column("c")),
            "n_suppliers": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"],
        [("t", "sum"), ("ss", "sum"), ("n_suppliers", "sum")],
        precombine=True)
    return agg.map_batches(lambda b: pa.table({
        "l_partkey": b.column("l_partkey"),
        "n_lineitems": b.column("t"),
        "n_suppliers": b.column("n_suppliers"),
        "hhi": pc.divide(pc.cast(b.column("ss"), pa.float64()),
                         pc.cast(pc.multiply(b.column("t"),
                                             b.column("t")),
                                 pa.float64()))}),
        batch_format="pyarrow", zero_copy_batch=True)


def part_revenue_abc(sf_dir: str):
    """ABC (Pareto) classification of parts by lineitem revenue:
    descending cumulative share ≤80% → A, ≤95% → B, else C — both cut
    tests as exact integer cross-multiplications (``cum·100 ≤
    80·total``), so class boundaries never hinge on a float.  One
    revenue aggregate + one global running-sum scan ordered by
    (revenue desc, partkey)."""
    from ...stages.scan import grouped_running_sum

    rev = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_extendedprice"])
        .map_batches(lambda b: pa.table({
            "l_partkey": b.column("l_partkey"),
            "revenue_cents": _cents(b.column("l_extendedprice"))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"], [("revenue_cents", "sum")], precombine=True) \
        .map_batches(lambda b: pa.table({
            "one": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            "neg_rev": pc.multiply(b.column("revenue_cents"),
                                   pa.scalar(-1, type=pa.int64())),
            "l_partkey": b.column("l_partkey"),
            "revenue_cents": b.column("revenue_cents")}),
            batch_format="pyarrow", zero_copy_batch=True)
    total = rev.sum("revenue_cents")
    cum = grouped_running_sum(rev, "one", ["neg_rev", "l_partkey"],
                              "revenue_cents", out_name="cum_cents")

    def classify(b: pa.Table, _t=total) -> pa.Table:
        cum_ = b.column("cum_cents").to_numpy(zero_copy_only=False)
        cls = np.where(cum_ * 100 <= 80 * _t, "A",
                       np.where(cum_ * 100 <= 95 * _t, "B", "C"))
        return pa.table({
            "l_partkey": b.column("l_partkey"),
            "revenue_cents": b.column("revenue_cents"),
            "cum_cents": b.column("cum_cents"),
            "abc_class": pa.array(cls.tolist(), type=pa.string())})

    return cum.map_batches(classify, batch_format="pyarrow",
                           zero_copy_batch=True)


def part_hierarchy_rollup(sf_dir: str):
    """Hierarchical (BOM-style) subtree rollup: parts form a 4-ary
    tree via the arithmetic parent rule ``parent(k) = k // 4`` (node 0
    is the global root); for every node, the count and exact retail-cents sum
    over its whole subtree (self included).  The plan is the general
    one — explode each node to ALL its ancestors, then one
    ancestor-keyed aggregate; with a STORED parent column the ancestor
    list would come from pointer doubling (`doc_redirect_resolution`)
    instead of arithmetic, the explode/aggregate tail is identical.
    Explode size is n·depth = n·log₄(n) — the price of arbitrary-depth
    rollup in one exchange.  Mirrored by a recursive-CTE oracle."""
    def explode(b: pa.Table) -> pa.Table:
        k = pc.cast(b.column("p_partkey"), pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cents = _cents(b.column("p_retailprice")).to_numpy(
            zero_copy_only=False)
        anc_all, cents_all = [], []
        cur = k.copy()
        while len(cur):
            anc_all.append(cur)
            cents_all.append(cents)
            live = cur >= 1          # node 0 is the global root
            cur = cur[live] // 4
            cents = cents[live]
        return pa.table({
            "anc": pa.array(np.concatenate(anc_all)),
            "n_nodes": pa.array(np.ones(
                sum(len(a) for a in anc_all), dtype=np.int64)),
            "subtree_cents": pa.array(np.concatenate(cents_all))})

    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_retailprice"]
                         ).map_batches(explode, batch_format="pyarrow",
                                       zero_copy_batch=True)
    return sorted_group_aggregate(
        ds, ["anc"], [("n_nodes", "sum"), ("subtree_cents", "sum")],
        precombine=True).sort("anc")


def part_hierarchy_paths(sf_dir: str):
    """Materialized path labels for the part hierarchy (the ltree /
    catalog-breadcrumb shape): each node's root→node ancestor chain as a
    '/'-joined string plus its depth — the read-optimized encoding
    that turns subtree queries into prefix scans.  The chain is
    arithmetic (`part_hierarchy_rollup`'s parent rule), so labels
    build in-block; mirrored by a recursive-CTE oracle."""
    def paths(b: pa.Table) -> pa.Table:
        keys = pc.cast(b.column("p_partkey"), pa.int64()).to_pylist()
        out_p, out_d = [], []
        for k in keys:
            chain = [k]
            cur = k
            while cur >= 1:
                cur //= 4
                chain.append(cur)
            chain.reverse()
            out_p.append("/".join(str(x) for x in chain))
            out_d.append(len(chain) - 1)
        return pa.table({
            "node": pa.array(keys, type=pa.int64()),
            "path": pa.array(out_p, type=pa.string()),
            "depth": pa.array(out_d, type=pa.int64())})

    return rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey"]).map_batches(
        paths, batch_format="pyarrow", zero_copy_batch=True
    ).sort("node")


def part_subtree_revenue(sf_dir: str, subtree_root: int = 1):
    """Subtree aggregation by PREFIX SCAN over the materialized path
    labels — the consumption side of `part_hierarchy_paths` (and the
    point of maintaining them): "total retail value under node 1"
    becomes one vectorized ``starts_with`` filter instead of a
    recursive traversal.  The law ``part_subtree_revenue(k) ==
    part_hierarchy_rollup[k]`` ties the two encodings together (pinned
    by test).  SQL mirror is the same LIKE-prefix predicate."""
    def rows(b: pa.Table) -> pa.Table:
        keys = pc.cast(b.column("p_partkey"), pa.int64()).to_pylist()
        paths = []
        for k in keys:
            chain = [k]
            cur = k
            while cur >= 1:
                cur //= 4
                chain.append(cur)
            chain.reverse()
            paths.append("/".join(str(x) for x in chain))
        t = pa.table({
            "path": pa.array(paths, type=pa.string()),
            "cents": _cents(b.column("p_retailprice"))})
        pre = f"{_path_of(subtree_root)}/"
        keep = pc.or_(
            pc.starts_with(t.column("path"), pattern=pre),
            pc.equal(t.column("path"), pa.scalar(pre[:-1])))
        t = t.filter(keep)
        return pa.table({
            "k": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "n_nodes": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "subtree_cents": t.column("cents")})

    agg = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_retailprice"]
                        ).map_batches(rows, batch_format="pyarrow",
                                      zero_copy_batch=True),
        ["k"], [("n_nodes", "sum"), ("subtree_cents", "sum")],
        precombine=True).take_all()
    n = int(agg[0]["n_nodes"]) if agg else 0
    c = int(agg[0]["subtree_cents"]) if agg else 0
    return pa.table({
        "subtree_root": pa.array([subtree_root], type=pa.int64()),
        "n_nodes": pa.array([n], type=pa.int64()),
        "subtree_cents": pa.array([c], type=pa.int64())})


