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

from ._runs import edge_interior_exchange, nullsafe_sort
from ._runs import edge_mask as _null_safe_edge_mask
from ._runs import run_starts

__all__ = ["grouped_quantiles"]


def grouped_quantiles(ds, group: str, value_col: str, qs: list,
                      out_names: list | None = None,
                      method: str = "disc"):
    """One row per ``group``: ``n`` (count) plus one column per quantile
    in ``qs`` (named ``out_names`` or ``q50``-style from the fraction).
    Values must be numeric.

    ``method="disc"`` (default): discrete — element at 0-based index
    ``max(0, ceil(q·n) − 1)``; output keeps the value column's type.
    ``method="cont"``: continuous — linear interpolation at position
    ``p = q·(n−1)``: ``v[⌊p⌋]·(1−frac) + v[⌈p⌉]·frac`` with
    ``frac = p − ⌊p⌋``, the exact IEEE expression DuckDB's
    ``quantile_cont`` evaluates (verified operand-for-operand), so the
    float64 output matches bit-for-bit.  Both methods are exact over
    the (value, count) edge partials — a histogram loses nothing for
    order statistics.
    """
    import ray

    assert method in ("disc", "cont")
    cont = method == "cont"
    if out_names is None:
        out_names = [f"q{int(round(q * 100)):02d}" for q in qs]
    assert len(out_names) == len(qs)

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    in_vt = types[value_col]
    vt = pa.float64() if cont else types[value_col]
    out_cols = [group, "n"] + list(out_names)
    out_types = {group: types[group], "n": pa.int64(),
                 **{nm: vt for nm in out_names}}

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = nullsafe_sort(ds.repartition(n_part),
                        [group, value_col]).materialize()

    def _edge_mask(batch: pa.Table):
        return _null_safe_edge_mask(batch.column(group))

    def _quants(t: pa.Table) -> pa.Table:
        """Quantile rows for complete, value-ascending group runs."""
        if t.num_rows == 0:
            return _empty(out_cols, out_types)
        starts = run_starts(t.column(group))
        ends = np.append(starts[1:], t.num_rows)
        counts = ends - starts
        gcol = t.column(group).take(pa.array(starts, type=pa.int64()))
        cols = {group: gcol, "n": pa.array(counts, type=pa.int64())}
        if cont:
            vals = t.column(value_col).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            for nm, q in zip(out_names, qs):
                # p = q*(n-1); v_lo*(1-frac) + v_hi*frac (DuckDB's IEEE
                # expression, bit-for-bit)
                p = q * (counts - 1).astype(np.float64)
                lo = np.floor(p)
                frac = p - lo
                v_lo = vals[starts + lo.astype(np.int64)]
                v_hi = vals[starts + np.ceil(p).astype(np.int64)]
                cols[nm] = pa.array(v_lo * (1.0 - frac) + v_hi * frac,
                                    type=pa.float64())
        else:
            for nm, q in zip(out_names, qs):
                # per (q, run): 0-based index ceil(q*n)-1 into the run
                idx = starts + np.maximum(
                    0, np.ceil(q * counts.astype(np.float64)).astype(np.int64) - 1)
                cols[nm] = t.column(value_col).take(pa.array(idx, type=pa.int64()))
        return pa.table({c: cols[c] for c in out_cols})

    # Edge pass ships (group, value, count) partials, NOT raw rows: a
    # boundary group spanning many blocks (low-cardinality groups make
    # MOST groups boundary groups) is reduced per block to its distinct
    # values — exact for discrete quantiles, and the driver shipment is
    # bounded by distinct (group, value) pairs per block, not row count.
    def edge_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({group: pa.array([], type=out_types[group]),
                          value_col: pa.array([], type=in_vt),
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
        vals = (et.column(value_col).to_numpy(zero_copy_only=False)
                .astype(np.float64) if cont else None)
        g_rows, n_rows, q_rows = [], [], [[] for _ in qs]
        for s, e in zip(starts, ends):
            c = cnt[s:e]
            cum = np.cumsum(c)
            n = int(cum[-1])
            g_rows.append(s)
            n_rows.append(n)
            for qi, q in enumerate(qs):
                if cont:
                    p = q * float(n - 1)
                    lo = np.floor(p)
                    frac = p - lo
                    v_lo = vals[s + int(np.searchsorted(cum, int(lo),
                                                        side="right"))]
                    v_hi = vals[s + int(np.searchsorted(cum, int(np.ceil(p)),
                                                        side="right"))]
                    q_rows[qi].append(v_lo * (1.0 - frac) + v_hi * frac)
                else:
                    pos = max(0, int(np.ceil(q * n)) - 1)
                    q_rows[qi].append(s + int(np.searchsorted(cum, pos,
                                                              side="right")))
        cols = {group: et.column(group).take(pa.array(g_rows, type=pa.int64())),
                "n": pa.array(n_rows, type=pa.int64())}
        for nm, rows in zip(out_names, q_rows):
            if cont:
                cols[nm] = pa.array(rows, type=pa.float64())
            else:
                cols[nm] = et.column(value_col).take(
                    pa.array(rows, type=pa.int64()))
        return pa.table({c: cols[c] for c in out_cols})

    def interior(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(out_cols, out_types)
        return _quants(batch.filter(pc.invert(_edge_mask(batch))))

    def merge(edge_tables) -> pa.Table:
        return _quants_from_partials(
            pa.concat_tables(edge_tables, promote_options="permissive"))

    return edge_interior_exchange(srt, edge_partials, interior, merge)


def _empty(out_cols, out_types) -> pa.Table:
    return pa.table({c: pa.array([], type=out_types[c]) for c in out_cols})
