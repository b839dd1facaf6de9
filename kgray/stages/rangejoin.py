"""Broadcast range (interval) join: left rows matched to a SMALL table
of ``[lo, hi)`` intervals on ``lo <= value < hi``.

Scale shape: the interval table is broadcast once (``ray.put``) and
every ``map_batches`` task resolves its batch locally — no shuffle, the
left side streams.  Two matching kernels:

* **disjoint** intervals (sorted, non-overlapping): one
  ``np.searchsorted`` per batch — at most one match per row, O(n log m);
* **overlapping** intervals: one vectorized mask per interval,
  O(n · m) — right-sized because the broadcast side is small by
  contract (this operator is NOT for large×large interval joins; those
  go through the sort-based ``stages/asof.py`` machinery).

The kernel is picked automatically by inspecting the intervals.
Unmatched left rows drop (inner) or survive null-padded (left).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["broadcast_range_join"]


def broadcast_range_join(left, intervals: pa.Table, value_col: str,
                         lo_col: str = "lo", hi_col: str = "hi",
                         how: str = "inner"):
    """Join ``left`` (Dataset) to ``intervals`` (small pyarrow Table
    with ``lo_col``/``hi_col`` and payload columns) on
    ``lo <= left[value_col] < hi``.  Returns left columns + interval
    payload columns; with overlapping intervals a left row can match
    several (many-to-many fan-out)."""
    import ray

    assert how in ("inner", "left")
    pay_cols = [c for c in intervals.schema.names if c not in (lo_col, hi_col)]
    pay_types = {c: intervals.schema.field(c).type for c in pay_cols}

    # sort intervals by lo once, decide the kernel once, broadcast once
    idx = np.argsort(intervals.column(lo_col).to_numpy(zero_copy_only=False),
                     kind="stable")
    srt = intervals.take(pa.array(idx, type=pa.int64()))
    lo = srt.column(lo_col).to_numpy(zero_copy_only=False)
    hi = srt.column(hi_col).to_numpy(zero_copy_only=False)
    disjoint = bool(np.all(hi[:-1] <= lo[1:])) if len(lo) > 1 else True
    ref = ray.put((lo, hi, srt.select(pay_cols)))

    def join_batch(batch: pa.Table) -> pa.Table:
        blo, bhi, pay = ray.get(ref)
        n = batch.num_rows
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        if disjoint:
            pos = np.searchsorted(blo, v, side="right") - 1
            ok = (pos >= 0)
            safe = np.where(ok, pos, 0)
            ok &= (v < bhi[safe])
            if how == "inner":
                take_l = np.flatnonzero(ok)
                take_r = pos[take_l]
                out = batch.take(pa.array(take_l, type=pa.int64()))
                cols = {c: out.column(c) for c in out.schema.names}
                taken = pay.take(pa.array(take_r, type=pa.int64()))
                for c in pay_cols:
                    cols[c] = taken.column(c)
                return pa.table(cols)
            # left: null-pad the misses
            cols = {c: batch.column(c) for c in batch.schema.names}
            safe_idx = np.where(ok, pos, 0).astype(np.int64)
            taken = pay.take(pa.array(safe_idx, type=pa.int64()))
            miss = pa.array(~ok)
            for c in pay_cols:
                null_col = pa.nulls(n, type=pay_types[c])
                import pyarrow.compute as pc
                cols[c] = pc.if_else(miss, null_col, taken.column(c))
            return pa.table(cols)
        # overlapping: one mask per interval, concat matches
        parts = []
        matched = np.zeros(n, dtype=bool)
        for i in range(len(blo)):
            m = (v >= blo[i]) & (v < bhi[i])
            if not m.any():
                continue
            matched |= m
            take_l = np.flatnonzero(m)
            out = batch.take(pa.array(take_l, type=pa.int64()))
            cols = {c: out.column(c) for c in out.schema.names}
            for c in pay_cols:
                val = pay.column(c)[i]
                cols[c] = pa.array([val.as_py()] * len(take_l),
                                   type=pay_types[c])
            parts.append(pa.table(cols))
        if how == "left" and not matched.all():
            take_l = np.flatnonzero(~matched)
            out = batch.take(pa.array(take_l, type=pa.int64()))
            cols = {c: out.column(c) for c in out.schema.names}
            for c in pay_cols:
                cols[c] = pa.nulls(len(take_l), type=pay_types[c])
            parts.append(pa.table(cols))
        if not parts:
            cols = {c: batch.column(c).slice(0, 0)
                    for c in batch.schema.names}
            for c in pay_cols:
                cols[c] = pa.array([], type=pay_types[c])
            return pa.table(cols)
        return pa.concat_tables(parts)

    return left.map_batches(join_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
