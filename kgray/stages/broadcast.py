"""Vectorized broadcast (map-side) join: enrich a streaming fact table
with columns from a SMALL dimension table, no shuffle.

The dimension is prepared ONCE on the driver — keys sorted, payload
row-aligned — and shipped via ``ray.put``; every batch then resolves
with one ``np.searchsorted`` against the sorted key array and one Arrow
``take`` per payload column.  No per-row Python, no dict lookups in the
hot path (this replaces the ad-hoc ``to_pylist`` loops the relational
queries used before).

Inner and left modes; duplicate dimension keys are rejected (a
broadcast join against a non-unique dimension is a fan-out — use
``sorted_merge_join`` for that).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["broadcast_join"]


def broadcast_join(left, dim: pa.Table, on: str, how: str = "inner",
                   payload: list | None = None):
    """Join streaming ``left`` to the small ``dim`` table on ``on``.
    Returns left columns + ``payload`` columns (default: all dim
    columns except the key).  ``how='left'`` null-pads misses."""
    import ray

    assert how in ("inner", "left")
    payload = ([c for c in dim.schema.names if c != on]
               if payload is None else list(payload))
    pay_types = {c: dim.schema.field(c).type for c in payload}

    keys = dim.column(on)
    n_dim = dim.num_rows
    if pc.count_distinct(keys).as_py() != n_dim:
        raise ValueError(f"broadcast_join: dimension key {on!r} is not "
                         "unique — use sorted_merge_join for fan-out joins")
    order = pc.sort_indices(keys)
    sorted_dim = dim.take(order)
    skeys = sorted_dim.column(on).to_numpy(zero_copy_only=False)
    ref = ray.put((skeys, sorted_dim.select(payload)))

    def join_batch(batch: pa.Table) -> pa.Table:
        sk, pay = ray.get(ref)
        if len(sk) == 0:                       # empty dimension
            if how == "inner":
                out = batch.slice(0, 0)
                cols = {c: out.column(c) for c in out.schema.names}
                for c in payload:
                    cols[c] = pa.array([], type=pay_types[c])
                return pa.table(cols)
            cols = {c: batch.column(c) for c in batch.schema.names}
            for c in payload:
                cols[c] = pa.nulls(batch.num_rows, type=pay_types[c])
            return pa.table(cols)
        kcol = batch.column(on)
        nullm = pc.is_null(kcol).to_numpy(zero_copy_only=False)
        # null keys never match (SQL join semantics); substitute a real
        # key so searchsorted stays typed, then force those to miss
        v = pc.fill_null(kcol, pa.scalar(sk[0], type=kcol.type)) \
            .to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk, v)
        pos_safe = np.clip(pos, 0, len(sk) - 1)
        hit = (sk[pos_safe] == v) & (pos < len(sk)) & ~nullm
        if how == "inner":
            take_l = np.flatnonzero(hit)
            out = batch.take(pa.array(take_l, type=pa.int64()))
            taken = pay.take(pa.array(pos_safe[take_l], type=pa.int64()))
            cols = {c: out.column(c) for c in out.schema.names}
            for c in payload:
                cols[c] = taken.column(c)
            return pa.table(cols)
        taken = pay.take(pa.array(pos_safe, type=pa.int64()))
        miss = pa.array(~hit)
        cols = {c: batch.column(c) for c in batch.schema.names}
        for c in payload:
            cols[c] = pc.if_else(miss, pa.nulls(batch.num_rows,
                                                type=pay_types[c]),
                                 taken.column(c))
        return pa.table(cols)

    return left.map_batches(join_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
