"""Canonicalization / dedup of linked triples: salted two-stage groupby.

The north rule demands explicit skew mitigation for head entities
("United States" is the object of a large share of all triples).  A
naive ``groupby((subj, pred, obj))`` sends every occurrence of a hot key
to one reducer; here:

1. **batch combine** — inside ``map_batches`` (large batches so the
   combiner actually compresses), occurrences are pre-aggregated per
   (key, salt) where ``salt = hash(url) % S`` — at most S partial rows
   per key per batch leave the map side,
2. **salted shuffle** — groupby on ``ks_hash`` (an int64 hash of
   key+salt — int keys sort/shuffle an order of magnitude faster than
   4-string composites); a hot key's load is spread over S reducers,
3. **final shuffle** — groupby on ``k_hash`` (int64 hash of the triple)
   merges the ≤ S partials per key.

All merging uses built-in vectorized aggregators (Sum/Min) — no
per-group Python.  ``support`` is exact; ``sample_urls`` keeps up to K
supporting urls as the lexicographically-smallest pipe-joined bundle
(``Min``) — a deterministic sample.  The subj/pred/obj strings ride
along via ``Min`` (constant within a hash group).

64-bit key hashing assumes no collisions: fine to ~10^9 distinct
triples (birthday bound); widen to 2×64 bits beyond that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import salt_of, stable_hash64

__all__ = ["combine_triples_batch", "canonical_graph", "GRAPH_SCHEMA",
           "entity_stats"]

GRAPH_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("support", pa.int64()),
    ("sample_urls", pa.list_(pa.string())),
])

_I64 = (1 << 63)


def _h64(s: str) -> int:
    return stable_hash64(s) - _I64          # signed int64 range


def combine_triples_batch(batch: pa.Table, n_salts: int = 8, k_urls: int = 5) -> pa.Table:
    """Map-side combiner: one partial row per (triple, salt) per batch."""
    acc: dict = {}
    for url, s, p, o in zip(batch.column("url").to_pylist(),
                            batch.column("subj").to_pylist(),
                            batch.column("pred").to_pylist(),
                            batch.column("obj").to_pylist()):
        key = (s, p, o, salt_of(url, n_salts))
        hit = acc.get(key)
        if hit is None:
            acc[key] = [1, {url}]
        else:
            hit[0] += 1
            if len(hit[1]) < k_urls:
                hit[1].add(url)
    keys = list(acc.keys())
    k_hash = np.fromiter((_h64(f"{k[0]}\x00{k[1]}\x00{k[2]}") for k in keys),
                         dtype=np.int64, count=len(keys))
    ks_hash = k_hash * np.int64(31) + np.fromiter((k[3] for k in keys),
                                                  dtype=np.int64, count=len(keys))
    return pa.table({
        "ks_hash": pa.array(ks_hash, type=pa.int64()),
        "k_hash": pa.array(k_hash, type=pa.int64()),
        "subj": pa.array([k[0] for k in keys], type=pa.string()),
        "pred": pa.array([k[1] for k in keys], type=pa.string()),
        "obj": pa.array([k[2] for k in keys], type=pa.string()),
        "support": pa.array([v[0] for v in acc.values()], type=pa.int64()),
        "url_bundle": pa.array(["|".join(sorted(v[1])) for v in acc.values()],
                               type=pa.string()),
    })


def _bundle_to_list(batch: pa.Table, k_urls: int) -> pa.Table:
    urls = [b.split("|")[:k_urls] if b else []
            for b in batch.column("url_bundle").to_pylist()]
    return pa.table({
        "subj": batch.column("subj"),
        "pred": batch.column("pred"),
        "obj": batch.column("obj"),
        "support": batch.column("support"),
        "sample_urls": pa.array(urls, type=pa.list_(pa.string())),
    })


def canonical_graph(linked_ds, n_salts: int = 8, k_urls: int = 5,
                    combine_batch_size: int = 65536):
    """linked triples Dataset → deduped graph Dataset (unsorted)."""
    import ray

    from .aggregate import sorted_group_aggregate

    # NO repartition before the first sort: its SortMap tasks overlap
    # the upstream tagger compute block-by-block, and a repartition
    # barrier would forfeit that (measured +6 s at 32 CPUs on the 480k
    # corpus).  stage1's output (one row per distinct (key, salt)) IS
    # bounded to cluster-width partitions before the second sort —
    # post-barrier, nothing to overlap, and hundreds of tiny partitions
    # would pay per-partition fixed costs twice (NOTES fact #2).
    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)))
    partial = linked_ds.map_batches(
        lambda b: combine_triples_batch(b, n_salts, k_urls),
        batch_format="pyarrow", batch_size=combine_batch_size)
    stage1 = sorted_group_aggregate(partial, "ks_hash", [
        ("support", "sum"), ("url_bundle", "min"), ("k_hash", "min"),
        ("subj", "min"), ("pred", "min"), ("obj", "min")],
        precombine=False).repartition(n_part)
    final = sorted_group_aggregate(stage1, "k_hash", [
        ("support", "sum"), ("url_bundle", "min"),
        ("subj", "min"), ("pred", "min"), ("obj", "min")])
    return final.map_batches(lambda b: _bundle_to_list(b, k_urls),
                             batch_format="pyarrow")


def entity_stats(linked_ds, n_salts: int = 16):
    """Per-canonical-entity mention counts (subject + object roles) via
    map-side combine + small groupby — the 'entities' logical table."""
    def combine(batch: pa.Table) -> pa.Table:
        acc: dict = {}
        for s, o in zip(batch.column("subj").to_pylist(),
                        batch.column("obj").to_pylist()):
            for ent, col in ((s, 0), (o, 1)):
                row = acc.setdefault(ent, [0, 0])
                row[col] += 1
        return pa.table({
            "canonical_id": pa.array(list(acc.keys()), type=pa.string()),
            "as_subj": pa.array([v[0] for v in acc.values()], type=pa.int64()),
            "as_obj": pa.array([v[1] for v in acc.values()], type=pa.int64()),
        })

    from .aggregate import sorted_group_aggregate
    combined = linked_ds.map_batches(combine, batch_format="pyarrow",
                                     batch_size=65536)
    return sorted_group_aggregate(combined, "canonical_id",
                                  [("as_subj", "sum"), ("as_obj", "sum")],
                                  precombine=False)
