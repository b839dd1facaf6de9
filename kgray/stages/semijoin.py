"""Distributed large×large semi-join / anti-join (SQL EXISTS /
NOT EXISTS) without broadcasting either side.

The right side is projected to per-batch DISTINCT keys before the
exchange, so shuffle volume is the right side's key cardinality, not
its row count.  Then the usual co-location discipline: union both
sides (left rows + right key markers) with a side tag, range-partition
sort on the key, and per sorted block each interior key run keeps /
drops its left rows depending on whether the run contains a right
marker; boundary-key runs route through one small driver pass.

Null keys follow SQL EXISTS semantics: a null key matches nothing, so
semi drops null-key left rows and anti keeps them.

For dimension-sized right sides prefer the broadcast filter pattern
(collect distinct keys, ``ray.put``, ``np.isin`` inside
``map_batches``) — this operator is for the fact×fact case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._runs import edge_interior_exchange

__all__ = ["semi_join"]


def semi_join(left, right, on: str, anti: bool = False):
    """Left rows whose key exists in ``right`` (``anti=False``) or does
    not (``anti=True``).  Returns a Dataset with the left columns."""
    import ray

    l_schema = left.schema()
    l_cols = list(l_schema.names)
    types = dict(zip(l_schema.names, l_schema.types))

    def tag_left(batch: pa.Table) -> pa.Table:
        return batch.select(l_cols).append_column(
            "__side", pa.array(np.zeros(batch.num_rows, dtype=np.int8)))

    def right_keys(batch: pa.Table) -> pa.Table:
        # distinct non-null keys per batch — the only right bytes shuffled
        k = pc.unique(pc.drop_null(batch.column(on)))
        t = pa.table({on: k})
        for c in l_cols:
            if c != on:
                t = t.append_column(c, pa.nulls(len(k), type=types[c]))
        return t.select(l_cols).append_column(
            "__side", pa.array(np.ones(len(k), dtype=np.int8)))

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    unioned = (left.map_batches(tag_left, batch_format="pyarrow",
                                zero_copy_batch=True)
               .union(right.map_batches(right_keys, batch_format="pyarrow",
                                        zero_copy_batch=True))
               .repartition(n_part))
    srt = unioned.sort(on).materialize()

    def _edge_mask(batch: pa.Table):
        k = batch.column(on)
        m = pc.or_kleene(pc.equal(k, k[0]), pc.equal(k, k[-1]))
        return pc.fill_null(m, False)

    def _filter_runs(t: pa.Table) -> pa.Table:
        """Keep left rows of complete runs by EXISTS(run has a right
        marker) XOR anti; null-key left rows are kept only for anti."""
        if t.num_rows == 0:
            return t.select(l_cols)
        keys = t.column(on)
        side = t.column("__side").to_numpy(zero_copy_only=False)
        null_mask = pc.is_null(keys).to_numpy(zero_copy_only=False)
        # run boundaries computed Arrow-side (no numpy dtype degradation
        # for nullable int keys); null != null → True, which only splits
        # null rows into their own runs — harmless, they are routed by
        # null_mask, not by run membership
        n = len(keys)
        neq = pc.fill_null(pc.not_equal(keys.slice(1, n - 1),
                                        keys.slice(0, n - 1)), True) \
            .to_numpy(zero_copy_only=False)
        change = np.r_[True, neq]
        run_id = np.cumsum(change) - 1
        has_right = np.zeros(run_id[-1] + 1, dtype=bool)
        np.maximum.at(has_right, run_id, side == 1)
        exists = has_right[run_id]
        keep = (side == 0) & ~null_mask & (exists != anti)
        if anti:
            keep |= (side == 0) & null_mask
        return t.filter(pa.array(keep)).select(l_cols)

    def edge_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.filter(pc.or_(_edge_mask(batch),
                                   pc.is_null(batch.column(on))))

    def interior(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(l_cols)
        keep = pc.and_(pc.invert(_edge_mask(batch)),
                       pc.invert(pc.is_null(batch.column(on))))
        return _filter_runs(batch.filter(keep))

    def merge(edge_tables) -> pa.Table:
        et = pa.concat_tables(edge_tables, promote_options="permissive")
        idx = pc.sort_indices(et, sort_keys=[(on, "ascending")])
        return _filter_runs(et.take(idx))

    return edge_interior_exchange(srt, edge_rows, interior, merge)
