"""Distributed per-group top-k (the ``ROW_NUMBER() OVER (PARTITION BY
g ORDER BY v DESC, tiebreak) ≤ k`` window pattern — Ray Data has no
window functions).

Same discipline as the other exchange stages: range-partition sort on
``(group, order_col desc, tiebreak asc)`` makes each group's rows a
contiguous run already in rank order; per sorted block every interior
run emits its first k rows with their rank; boundary-key runs (may
continue in a neighboring block) route through one small driver-side
pass.  The sorted input is materialized (pinned by the sort barrier
anyway); the top-k output streams.

Determinism: ``tiebreak`` must be a key unique within its group, so
ranks are total and reproducible (mirrors the SQL oracle's ORDER BY).
Null group keys form ONE group of their own (SQL ``PARTITION BY``
semantics), handled null-safely by the shared run helpers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._runs import edge_interior_exchange, nullsafe_sort
from ._runs import edge_mask as _null_safe_edge_mask
from ._runs import run_starts

__all__ = ["grouped_topk", "global_topk"]


def grouped_topk(ds, group: str, order_col: str, tiebreak: str, k: int,
                 descending: bool = True):
    """Top-k rows per ``group`` by ``order_col`` (ties broken by
    ``tiebreak`` ascending), with a 1-based ``rank`` column appended.
    Returns a Dataset with the input columns plus ``rank``.
    """
    import ray

    schema = ds.schema()
    out_cols = list(schema.names) + ["rank"]
    types = dict(zip(schema.names, schema.types))
    types["rank"] = pa.int64()

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = nullsafe_sort(ds.repartition(n_part),
                        [group, order_col, tiebreak],
                        descending=[False, descending, False]).materialize()

    def _edge_mask(batch: pa.Table):
        return _null_safe_edge_mask(batch.column(group))

    def _heads(t: pa.Table) -> pa.Table:
        """First k rows (+rank) of each complete group run; rows are
        already in rank order within runs."""
        if t.num_rows == 0:
            return _empty(out_cols, types)
        starts = run_starts(t.column(group))
        ends = np.append(starts[1:], t.num_rows)
        take, ranks = [], []
        for s, e in zip(starts, ends):
            n = min(k, e - s)
            take.append(np.arange(s, s + n))
            ranks.append(np.arange(1, n + 1))
        idx = np.concatenate(take)
        out = t.take(pa.array(idx, type=pa.int64()))
        return out.append_column(
            "rank", pa.array(np.concatenate(ranks), type=pa.int64()))

    def edge_rows(batch: pa.Table) -> pa.Table:
        """Boundary-run rows, capped at k per run per block: blocks are
        in global rank order, so the global first-k of a multi-block run
        is contained in the union of each block's first-k of that run —
        a hot group never ships more than 2k rows per block to the
        driver."""
        if batch.num_rows == 0:
            return batch
        edge = batch.filter(_edge_mask(batch))
        if edge.num_rows == 0:
            return edge
        starts = run_starts(edge.column(group))
        ends = np.append(starts[1:], edge.num_rows)
        take = np.concatenate([np.arange(s, min(s + k, e))
                               for s, e in zip(starts, ends)])
        return edge.take(pa.array(take, type=pa.int64()))

    def interior(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(out_cols, types)
        return _heads(batch.filter(pc.invert(_edge_mask(batch))))

    def merge(edge_tables) -> pa.Table:
        et = pa.concat_tables(edge_tables, promote_options="permissive")
        idx = pc.sort_indices(et, sort_keys=[
            (group, "ascending"),
            (order_col, "descending" if descending else "ascending"),
            (tiebreak, "ascending")])
        return _heads(et.take(idx))

    return edge_interior_exchange(srt, edge_rows, interior, merge)


def _empty(out_cols, types) -> pa.Table:
    return pa.table({c: pa.array([], type=types[c]) for c in out_cols})


def global_topk(ds, keys, k: int):
    """Distributed GLOBAL top-k: the first ``k`` rows of ``ds`` under the
    total order ``keys = [(col, "ascending"|"descending"), ...]``.

    The scale shape for ``ORDER BY ... LIMIT k`` when k ≪ rows: each
    block ships only its own local top-k (Arrow C++ ``sort_by`` +
    slice — never a Python row loop), so the driver merges at most
    k·n_blocks survivor rows instead of running a full all-to-all sort
    the way ``ds.sort().limit(k)`` would.  ``keys`` must form a total
    order (include a unique tiebreak column) so the result is
    deterministic and matches a SQL ``ORDER BY ... LIMIT k`` oracle
    bit-for-bit.  Nulls sort last (Arrow default) — callers with
    nullable keys should filter or coalesce first if SQL NULLS FIRST
    semantics are needed.

    Returns a ``pyarrow.Table`` (result-sized: ≤ k rows).
    """
    import ray

    keys = [(c, o) for c, o in keys]

    def _local(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        return b.sort_by(keys).slice(0, k)

    small = ds.map_batches(_local, batch_format="pyarrow",
                           zero_copy_batch=True)
    # survivors are ≤ k rows/block — driver merge is result-sized
    tabs = [t for t in ray.get(small.to_arrow_refs()) if t.num_rows]
    if not tabs:
        sch = ds.schema()
        return pa.table({n: pa.array([], type=t)
                         for n, t in zip(sch.names, sch.types)})
    merged = pa.concat_tables(tabs, promote_options="permissive")
    return merged.sort_by(keys).slice(0, k)
