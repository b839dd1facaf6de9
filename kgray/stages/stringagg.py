"""Exact distributed ordered string aggregation (SQL
``string_agg(value, sep ORDER BY ...)`` / ordered ``list()``) — an
aggregate whose result depends on element ORDER, which neither Ray's
groupby nor a plain hash aggregate can express.

Same discipline as the other sorted-run exchange stages: range-partition
sort on ``[key] + order_cols`` makes each group a contiguous run already
in aggregation order; per sorted block every interior run joins its
values vectorized (one ``LargeListArray`` + ``pc.binary_join`` per
block — no Python loop over rows); a boundary run ships ONE
already-joined partial string per block (never raw rows — a hot key
spanning many blocks costs O(blocks) shipped strings), tagged with the
run's first order-column values so the driver can concatenate partials
in global order.  The sorted input is materialized (pinned by the sort
barrier anyway); the one-row-per-key output streams.

Determinism contract (same as SQL): the result is well-defined only if
``order_cols`` is a total order within each key (append a unique
tiebreak column).  With ties *spanning a block boundary* the partial
order would be ambiguous — exactly the rows SQL's own ``string_agg``
returns in nondeterministic order.

``value_col`` must be non-null (SQL skips nulls; callers filter or
fill first — asserted per block).  Null KEYS form one group (SQL
GROUP BY semantics), handled by the null-safe run helpers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._runs import edge_interior_exchange, nullsafe_sort
from ._runs import edge_mask as _null_safe_edge_mask
from ._runs import run_starts

__all__ = ["grouped_string_agg"]


def grouped_string_agg(ds, key: str, order_cols: list, value_col: str,
                       sep: str = ",", out_name: str = "agg"):
    """One row per ``key``: ``n`` (element count) and ``out_name`` =
    the ``sep``-joined ``value_col`` strings in ``order_cols`` order."""
    import ray

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    kt = types[key]
    out_cols = [key, "n", out_name]
    out_types = {key: kt, "n": pa.int64(), out_name: pa.large_string()}

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = nullsafe_sort(ds.repartition(n_part),
                        [key] + list(order_cols)).materialize()

    def _join_runs(t: pa.Table, starts: np.ndarray) -> tuple:
        """(keys_at_starts, counts, joined) for the runs starting at
        ``starts`` — vectorized: one list-array build + one binary_join."""
        ends = np.append(starts[1:], t.num_rows)
        vals = pc.cast(t.column(value_col).combine_chunks(), pa.large_string())
        assert vals.null_count == 0, "string_agg value_col must be non-null"
        offsets = pa.array(np.append(starts, t.num_rows), type=pa.int64())
        lists = pa.LargeListArray.from_arrays(offsets, vals)
        joined = pc.binary_join(lists, pa.scalar(sep, type=pa.large_string()))
        return (t.column(key).take(pa.array(starts, type=pa.int64())),
                pa.array(ends - starts, type=pa.int64()), joined)

    def _edge(batch: pa.Table):
        return _null_safe_edge_mask(batch.column(key))

    # Edge pass: ≤ 2 boundary runs per block, each reduced to ONE
    # (key, first-order..., n, partial) row before collection.
    def edge_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], type=kt),
                          **{c: pa.array([], type=types[c])
                             for c in order_cols},
                          "n": pa.array([], type=pa.int64()),
                          out_name: pa.array([], type=pa.large_string())})
        if batch.num_rows == 0:
            return empty
        edge = batch.filter(_edge(batch))
        if edge.num_rows == 0:
            return empty
        starts = run_starts(edge.column(key))
        keys, counts, joined = _join_runs(edge, starts)
        take = pa.array(starts, type=pa.int64())
        return pa.table({key: keys,
                         **{c: edge.column(c).take(take)
                            for c in order_cols},
                         "n": counts, out_name: joined})

    def interior(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(out_cols, out_types)
        inner = batch.filter(pc.invert(_edge(batch)))
        if inner.num_rows == 0:
            return _empty(out_cols, out_types)
        starts = run_starts(inner.column(key))
        keys, counts, joined = _join_runs(inner, starts)
        return pa.table({key: keys, "n": counts, out_name: joined})

    def merge(edge_tables) -> pa.Table:
        et = pa.concat_tables(edge_tables, promote_options="permissive")
        # global (key, order...) sort puts each key's partials in
        # concatenation order (blocks are disjoint order ranges per key)
        idx = pc.sort_indices(et, sort_keys=[(key, "ascending")] +
                              [(c, "ascending") for c in order_cols])
        et = et.take(idx)
        starts = run_starts(et.column(key))
        ends = np.append(starts[1:], et.num_rows)
        offsets = pa.array(np.append(starts, et.num_rows), type=pa.int64())
        lists = pa.LargeListArray.from_arrays(
            offsets, et.column(out_name).combine_chunks())
        joined = pc.binary_join(lists, pa.scalar(sep, type=pa.large_string()))
        take = pa.array(starts, type=pa.int64())
        n = et.column("n").to_numpy(zero_copy_only=False)
        counts = pa.array(np.add.reduceat(n, starts) if len(starts)
                          else np.array([], dtype=np.int64),
                          type=pa.int64())
        _ = ends
        return pa.table({key: et.column(key).take(take),
                         "n": counts, out_name: joined})

    return edge_interior_exchange(srt, edge_partials, interior, merge)


def _empty(out_cols, out_types) -> pa.Table:
    return pa.table({c: pa.array([], type=out_types[c]) for c in out_cols})
