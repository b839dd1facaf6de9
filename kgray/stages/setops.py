"""Distributed SQL set operations: INTERSECT / EXCEPT / UNION with
DISTINCT semantics (Ray Data has ``union`` = UNION ALL and ``unique``
= single-column DISTINCT, but no multiset ops over whole rows).

Plan: project both sides to the shared columns, attach per-side
presence counters (map-side combined per batch with Arrow's C++ hash
aggregate so the shuffle carries distinct rows, not raw rows), union,
then one ``sorted_group_aggregate`` over all columns and a counter
filter:

=========  =============================
op         kept rows (distinct)
=========  =============================
intersect  present on both sides
except     present left, absent right
union      present on either side
=========  =============================

SQL null semantics for set ops: NULLs compare EQUAL (unlike joins) —
``(1, NULL)`` on both sides intersects.  That falls out of the
null-safe grouping in ``sorted_group_aggregate``.

``all_rows=True`` switches to BAG (ALL) semantics — the same presence
counters become multiplicities, and each surviving row is emitted
``m`` times (``INTERSECT ALL``: min(a, b); ``EXCEPT ALL``:
max(a − b, 0); ``UNION ALL``: a + b) via one vectorized ``take`` over
the reduced rows.  The exchange still carries only distinct rows +
counts, never the multiset itself.

Scale: the exchange carries at most the distinct rows of each side
(map-side combine), one sort, output streams.  No driver-side state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .aggregate import sorted_group_aggregate

__all__ = ["set_op"]


def set_op(left, right, op: str, columns: list | None = None,
           all_rows: bool = False):
    """``op`` ∈ {"intersect", "except", "union"}; both Datasets must
    expose ``columns`` (default: all of left's columns, which the right
    side must share).  Returns a Dataset of distinct rows, or — with
    ``all_rows=True`` — SQL ALL (bag) semantics with exact
    multiplicities.
    """
    assert op in ("intersect", "except", "union")
    cols = list(columns) if columns is not None else list(left.schema().names)
    missing = set(cols) - set(right.schema().names)
    assert not missing, f"right side lacks columns: {missing}"

    def _tag(side_a: bool):
        def tag(batch: pa.Table) -> pa.Table:
            t = batch.select(cols)
            ones = pa.array(np.ones(t.num_rows, dtype=np.int64))
            zeros = pa.array(np.zeros(t.num_rows, dtype=np.int64))
            t = t.append_column("__a", ones if side_a else zeros)
            t = t.append_column("__b", zeros if side_a else ones)
            # map-side combine: ship distinct rows per batch, not rows
            g = t.group_by(cols, use_threads=False).aggregate(
                [("__a", "sum"), ("__b", "sum")])
            return pa.table({**{c: g.column(c) for c in cols},
                             "__a": g.column("__a_sum"),
                             "__b": g.column("__b_sum")})
        return tag

    unioned = (left.map_batches(_tag(True), batch_format="pyarrow",
                                zero_copy_batch=True)
               .union(right.map_batches(_tag(False), batch_format="pyarrow",
                                        zero_copy_batch=True)))
    agg = sorted_group_aggregate(unioned, cols,
                                 [("__a", "sum"), ("__b", "sum")])

    def pick(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(cols)
        if all_rows:
            a = batch.column("__a").to_numpy(zero_copy_only=False)
            b = batch.column("__b").to_numpy(zero_copy_only=False)
            if op == "intersect":
                m = np.minimum(a, b)
            elif op == "except":
                m = np.maximum(a - b, 0)
            else:
                m = a + b
            idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), m)
            return batch.take(pa.array(idx)).select(cols)
        a = pc.greater(batch.column("__a"), pa.scalar(0, type=pa.int64()))
        b = pc.greater(batch.column("__b"), pa.scalar(0, type=pa.int64()))
        if op == "intersect":
            mask = pc.and_(a, b)
        elif op == "except":
            mask = pc.and_(a, pc.invert(b))
        else:
            mask = pc.or_(a, b)
        return batch.filter(mask).select(cols)

    return agg.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
