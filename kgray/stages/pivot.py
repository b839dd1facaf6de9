"""Distributed PIVOT (conditional aggregation): one row per group, one
column pair per pivot category — the SQL ``SUM(CASE WHEN pivot = cat
THEN ...)`` / ``PIVOT ... IN (...)`` shape.

Like SQL PIVOT, the category list must be declared up front (an
unbounded category set would make the output schema data-dependent —
run a ``unique()`` first if you need to discover it).  The per-batch
one-hot expansion is pure Arrow kernels (``equal`` + ``if_else``), then
one ``sorted_group_aggregate`` over |categories|·2 numeric columns:
the shuffle carries one row per (block, group) after map-side combine,
never the raw rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .aggregate import sorted_group_aggregate

__all__ = ["pivot_aggregate"]


def _safe(cat: str) -> str:
    return "".join(ch if ch.isalnum() else "_" for ch in str(cat))


def pivot_aggregate(ds, group: str, pivot_col: str, categories: list,
                    value_col: str | None = None):
    """Per ``group`` row: ``n_<cat>`` (count of rows with ``pivot_col ==
    cat``) and, when ``value_col`` is given (int64), ``sum_<cat>``.
    Rows whose pivot value is outside ``categories`` count nowhere
    (SQL PIVOT ... IN semantics).
    """
    cats = list(categories)
    n_names = [f"n_{_safe(c)}" for c in cats]
    s_names = [f"sum_{_safe(c)}" for c in cats] if value_col else []

    def onehot(batch: pa.Table) -> pa.Table:
        cols = {group: batch.column(group)}
        zero = pa.scalar(0, type=pa.int64())
        for cat, n_nm in zip(cats, n_names):
            mask = pc.fill_null(pc.equal(batch.column(pivot_col),
                                         pa.scalar(cat)), False)
            cols[n_nm] = pc.if_else(mask, pa.scalar(1, type=pa.int64()), zero)
        if value_col:
            v = pc.cast(batch.column(value_col), pa.int64())
            for cat, s_nm in zip(cats, s_names):
                mask = pc.fill_null(pc.equal(batch.column(pivot_col),
                                             pa.scalar(cat)), False)
                cols[s_nm] = pc.if_else(mask, v, zero)
        t = pa.table(cols)
        # map-side combine: one row per group leaves the task
        g = t.group_by([group], use_threads=False).aggregate(
            [(nm, "sum") for nm in n_names + s_names])
        return pa.table({group: g.column(group),
                         **{nm: g.column(f"{nm}_sum")
                            for nm in n_names + s_names}})

    prepped = ds.map_batches(onehot, batch_format="pyarrow",
                             zero_copy_batch=True)
    return sorted_group_aggregate(prepped, group,
                                  [(nm, "sum") for nm in n_names + s_names])


def unpivot(ds, id_cols: list, value_cols: list,
            var_name: str = "name", value_name: str = "value"):
    """SQL ``UNPIVOT``: wide → long.  Each input row yields one output
    row per column in ``value_cols``: the ``id_cols`` repeated, the
    column's NAME in ``var_name`` and its value in ``value_name``.
    NULL cells are skipped (SQL UNPIVOT's ``EXCLUDE NULLS`` default).

    Purely per-batch (no shuffle, no state): one vertical concat of
    ``len(value_cols)`` zero-copy column selections per block — the
    output streams and is ``len(value_cols)×`` the input rows at most.
    All ``value_cols`` must share one Arrow type (cast upstream).
    """
    id_cols = list(id_cols)
    value_cols = list(value_cols)

    def explode(batch: pa.Table) -> pa.Table:
        vt = batch.schema.field(value_cols[0]).type
        pieces = []
        for vc in value_cols:
            vals = batch.column(vc)
            t = pa.table({
                **{c: batch.column(c) for c in id_cols},
                var_name: pa.array([vc] * batch.num_rows, type=pa.string()),
                value_name: pc.cast(vals, vt)})
            if vals.null_count:
                t = t.filter(pc.is_valid(vals))
            pieces.append(t)
        if not pieces:
            return pa.table({})
        return pa.concat_tables(pieces)

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)
