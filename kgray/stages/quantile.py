"""Exact distributed per-group discrete quantiles (p50/p95-style
stats — Ray Data's groupby has mean/std but no exact quantile).

Discrete quantile semantics match DuckDB ``quantile_disc``: for a
group of n sorted values, ``q`` selects the element at 0-based index
``max(0, ceil(q·n) − 1)`` (IEEE double ``q·n``, so both engines round
identically).  Exact — no sketch, no interpolation.

Same discipline as the other exchange stages: range-partition sort on
``(group, value)`` makes each group a contiguous ascending run; per
sorted block every interior run indexes its quantiles directly;
boundary-group rows are reduced per block to ``(group, value, count)``
partials before the driver merge — exact for discrete quantiles, and
the driver shipment is bounded by distinct values per block, not by
the boundary groups' row counts (low-cardinality groupings make MOST
groups boundary groups).  The sorted input is materialized (pinned by
the sort barrier anyway); the one-row-per-group output streams.
Null group keys form one group (SQL GROUP BY semantics).

At true scale a single hot group's rows must fit one sort partition
(same contract as every sorted-run stage here); for sketch-tolerant
pipelines a t-digest would trade exactness for bounded memory — this
operator is the exact path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._runs import edge_mask as _null_safe_edge_mask
from ._runs import run_starts

__all__ = ["grouped_quantiles"]


def grouped_quantiles(ds, group: str, value_col: str, qs: list,
                      out_names: list | None = None):
    """One row per ``group``: ``n`` (count) plus one column per quantile
    in ``qs`` (named ``out_names`` or ``q50``-style from the fraction).
    Values must be numeric; output quantile columns keep the value
    column's Arrow type.
    """
    import ray
    import ray.data as rd

    if out_names is None:
        out_names = [f"q{int(round(q * 100)):02d}" for q in qs]
    assert len(out_names) == len(qs)

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    vt = types[value_col]
    out_cols = [group, "n"] + list(out_names)
    out_types = {group: types[group], "n": pa.int64(),
                 **{nm: vt for nm in out_names}}

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = (ds.repartition(n_part).sort([group, value_col]).materialize())

    def _edge_mask(batch: pa.Table):
        return _null_safe_edge_mask(batch.column(group))

    def _quants(t: pa.Table) -> pa.Table:
        """Quantile rows for complete, value-ascending group runs."""
        if t.num_rows == 0:
            return _empty(out_cols, out_types)
        starts = run_starts(t.column(group))
        ends = np.append(starts[1:], t.num_rows)
        counts = ends - starts
        # per (q, run): 0-based index ceil(q*n)-1 into the run
        take_cols = []
        for q in qs:
            idx = starts + np.maximum(
                0, np.ceil(q * counts.astype(np.float64)).astype(np.int64) - 1)
            take_cols.append(idx)
        gcol = t.column(group).take(pa.array(starts, type=pa.int64()))
        cols = {group: gcol, "n": pa.array(counts, type=pa.int64())}
        for nm, idx in zip(out_names, take_cols):
            cols[nm] = t.column(value_col).take(pa.array(idx, type=pa.int64()))
        return pa.table({c: cols[c] for c in out_cols})

    # Edge pass ships (group, value, count) partials, NOT raw rows: a
    # boundary group spanning many blocks (low-cardinality groups make
    # MOST groups boundary groups) is reduced per block to its distinct
    # values — exact for discrete quantiles, and the driver shipment is
    # bounded by distinct (group, value) pairs per block, not row count.
    def edge_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({group: pa.array([], type=out_types[group]),
                          value_col: pa.array([], type=vt),
                          "__cnt": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        edge = batch.filter(_edge_mask(batch))
        if edge.num_rows == 0:
            return empty
        t = edge.select([group, value_col]).append_column(
            "__cnt", pa.array(np.ones(edge.num_rows, dtype=np.int64)))
        g = t.group_by([group, value_col], use_threads=False) \
             .aggregate([("__cnt", "sum")])
        return pa.table({group: g.column(group),
                         value_col: g.column(value_col),
                         "__cnt": g.column("__cnt_sum")})

    def _quants_from_partials(et: pa.Table) -> pa.Table:
        """Exact quantiles from merged (group, value, count) partials."""
        idx = pc.sort_indices(et, sort_keys=[(group, "ascending"),
                                             (value_col, "ascending")])
        et = et.take(idx)
        starts = run_starts(et.column(group))
        ends = np.append(starts[1:], et.num_rows)
        cnt = et.column("__cnt").to_numpy(zero_copy_only=False)
        g_rows, n_rows, q_rows = [], [], [[] for _ in qs]
        for s, e in zip(starts, ends):
            c = cnt[s:e]
            cum = np.cumsum(c)
            n = int(cum[-1])
            g_rows.append(s)
            n_rows.append(n)
            for qi, q in enumerate(qs):
                pos = max(0, int(np.ceil(q * n)) - 1)
                q_rows[qi].append(s + int(np.searchsorted(cum, pos,
                                                          side="right")))
        cols = {group: et.column(group).take(pa.array(g_rows, type=pa.int64())),
                "n": pa.array(n_rows, type=pa.int64())}
        for nm, rows in zip(out_names, q_rows):
            cols[nm] = et.column(value_col).take(pa.array(rows, type=pa.int64()))
        return pa.table({c: cols[c] for c in out_cols})

    edge_refs = srt.map_batches(edge_partials, batch_format="pyarrow",
                                zero_copy_batch=True).to_arrow_refs()
    edge_tables = [t for t in ray.get(edge_refs) if t.num_rows]

    def interior(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(out_cols, out_types)
        return _quants(batch.filter(pc.invert(_edge_mask(batch))))

    interior_ds = srt.map_batches(interior, batch_format="pyarrow",
                                  zero_copy_batch=True)
    if not edge_tables:
        return interior_ds
    merged = pa.concat_tables(edge_tables, promote_options="permissive")
    quants = _quants_from_partials(merged)
    if quants.num_rows == 0:
        return interior_ds
    return interior_ds.union(rd.from_arrow(quants))


def _empty(out_cols, out_types) -> pa.Table:
    return pa.table({c: pa.array([], type=out_types[c]) for c in out_cols})
