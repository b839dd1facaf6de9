"""Shared helpers for the sorted-run exchange stages (aggregate, join,
asof, topk, quantile, semijoin): null-safe run boundary detection over
a sorted key column.

``pc.equal``/``pc.not_equal`` return null when either operand is null,
and non-Kleene boolean ops propagate that null straight into a
``Table.filter`` mask, which silently DROPS those positions — the
null-poisoning bug class.  These helpers treat null as a real key value
(SQL GROUP BY / PARTITION BY semantics: one null group) and never
return a null mask.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["run_starts", "edge_mask", "edge_interior_exchange"]


def edge_interior_exchange(srt, edge_fn, interior_fn, merge_fn):
    """The shared tail of every sorted-run exchange stage (aggregate,
    join, semijoin, topk, quantile): consume the materialized sorted
    Dataset ``srt`` twice zero-copy —

    1. ``edge_fn`` per block extracts/reduces boundary-run shipments;
       the non-empty results collect to the driver (bounded by each
       stage's cap/partial contract, never raw run size),
    2. ``interior_fn`` per block resolves complete interior runs and
       STREAMS into downstream consumers,
    3. ``merge_fn(edge_tables)`` resolves the collected boundary
       shipments in one driver-side pass (may return None/empty).

    Returns ``interior ∪ merged`` as a Dataset.
    """
    import ray
    import ray.data as rd

    # Two consumers of the same blocks: the dataset MUST be pinned, or a
    # re-executed upstream sort can split blocks differently between the
    # passes (rows edge in one pass, interior in the other — silently
    # dropped or doubled).  materialize() on an already-materialized
    # dataset is a no-op.
    srt = srt.materialize()
    edge_refs = srt.map_batches(edge_fn, batch_format="pyarrow",
                                zero_copy_batch=True).to_arrow_refs()
    edge_tables = [t for t in ray.get(edge_refs) if t.num_rows]
    interior_ds = srt.map_batches(interior_fn, batch_format="pyarrow",
                                  zero_copy_batch=True)
    if not edge_tables:
        return interior_ds
    merged = merge_fn(edge_tables)
    if merged is None or merged.num_rows == 0:
        return interior_ds
    return interior_ds.union(rd.from_arrow(merged))


def run_starts(keys) -> np.ndarray:
    """Start indices of contiguous equal-key runs in a sorted column,
    null-safe: consecutive nulls belong to ONE run (null == null for
    grouping purposes).  Returns an int64 index array; empty input →
    empty array."""
    n = len(keys)
    if n == 0:
        return np.array([], dtype=np.int64)
    a = keys.slice(1, n - 1)
    b = keys.slice(0, n - 1)
    neq = pc.fill_null(pc.not_equal(a, b), False).to_numpy(zero_copy_only=False)
    va = pc.is_valid(a).to_numpy(zero_copy_only=False)
    vb = pc.is_valid(b).to_numpy(zero_copy_only=False)
    change = neq | (va != vb)
    return np.flatnonzero(np.r_[True, change]).astype(np.int64)


def edge_mask(keys) -> pa.Array:
    """Boolean (never-null) mask of rows whose key equals the block's
    first or last key — rows whose run may continue in a neighboring
    block.  Null keys compare equal to null boundary keys."""
    first = keys[0]
    last = keys[len(keys) - 1]

    def _eq(scalar):
        if not scalar.is_valid:
            return pc.is_null(keys)
        return pc.fill_null(pc.equal(keys, scalar), False)

    m = pc.or_(_eq(first), _eq(last))
    return m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
