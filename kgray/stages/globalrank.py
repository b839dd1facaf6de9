"""Global (unpartitioned) window ranks: RANK / PERCENT_RANK /
CUME_DIST over an entire Dataset — the ``OVER (ORDER BY v)`` shape
with no PARTITION BY, which the per-group scan stages cannot express
(their unit of work is a key run; here the "run" is the whole corpus).

Plan — nothing row-sized ever leaves the stream, nothing node-sized
hits the driver:

1. rows reduce to per-DISTINCT-value groups (value, n) — one exchange;
2. groups sort; per-block prefix offsets come from block-count-sized
   remote scalars; each block gains its ``below`` (rows strictly
   smaller) via a remote map re-assembled with ``from_arrow_refs``;
3. rows join back to their group row (one row-sized sorted-merge
   join — unavoidable: the OUTPUT is per-row) and compute
   rank = below + 1, percent_rank = (rank−1)/(N−1),
   cume_dist = (below+n)/N — each ONE IEEE division, bitwise vs SQL.

Ties follow SQL RANK semantics (equal values share the minimal rank;
peers count in cume_dist).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["global_rank"]


def global_rank(ds, value_col: str):
    """Dataset of the input columns + ``rank`` (int64),
    ``percent_rank``, ``cume_dist`` (float64), ordered ascending by
    ``value_col``.  Null values are rejected."""
    import ray
    import ray.data as rd

    from .aggregate import sorted_group_aggregate
    from .join import sorted_merge_join

    def to_groups(b: pa.Table) -> pa.Table:
        v = b.column(value_col)
        if pc.any(pc.is_null(v)).as_py():
            raise ValueError("global_rank: null order value")
        return pa.table({value_col: v,
                         "__n": pa.array(np.ones(b.num_rows,
                                                 dtype=np.int64))})

    groups = sorted_group_aggregate(
        ds.map_batches(to_groups, batch_format="pyarrow",
                       zero_copy_batch=True),
        [value_col], [("__n", "sum")])
    srt = groups.sort(value_col).materialize()
    refs = srt.to_arrow_refs()

    @ray.remote
    def block_total(t: pa.Table) -> int:
        # Ray emits schema-LESS empty blocks after a sort — guard both
        if t.num_rows == 0 or "__n" not in t.schema.names:
            return 0
        return int(pc.sum(t.column("__n")).as_py() or 0)

    @ray.remote
    def with_below(t: pa.Table, off: int) -> pa.Table:
        n = t.column("__n").to_numpy(zero_copy_only=False)
        below = off + np.cumsum(n) - n
        return t.append_column("__below",
                               pa.array(below.astype(np.int64)))

    block_n = ray.get([block_total.remote(r) for r in refs])
    total = int(np.sum(block_n)) if block_n else 0
    if total == 0:
        raise ValueError("global_rank: empty input")
    offsets = np.concatenate([[0], np.cumsum(block_n)[:-1]]).astype(np.int64)
    aug = rd.from_arrow_refs([with_below.remote(r, int(off))
                              for r, off, bn in zip(refs, offsets, block_n)
                              if bn > 0])

    joined = sorted_merge_join(ds, aug, on=value_col)

    def finish(b: pa.Table, _N=total) -> pa.Table:
        below = b.column("__below")
        n = b.column("__n")
        rank = pc.add(below, pa.scalar(1, type=pa.int64()))
        prk = (pc.cast(below, pa.float64()) if _N == 1 else
               pc.divide(pc.cast(below, pa.float64()),
                         pa.scalar(float(_N - 1))))
        cume = pc.divide(pc.cast(pc.add(below, n), pa.float64()),
                         pa.scalar(float(_N)))
        out = b.drop_columns(["__n", "__below"])
        out = out.append_column("rank", pc.cast(rank, pa.int64()))
        out = out.append_column("percent_rank", prk)
        return out.append_column("cume_dist", cume)

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)
