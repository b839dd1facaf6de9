"""Distributed backward as-of join (Ray Data has no asof operator).

``asof_join(left, right, ...)`` matches every left row to the right
row with the greatest time ≤ the left row's time within the same key —
the classic "latest state as of t" lookup (DuckDB ``ASOF JOIN``,
pandas ``merge_asof``).  Left-join semantics: unmatched left rows keep
null right columns.

Same co-location discipline as ``stages/aggregate.py`` /
``stages/join.py``:

1. union both sides with a side tag, range-partition **sort** on
   ``(key, t)`` — each key's rows become one contiguous run,
2. per sorted block, every *interior* key run resolves its as-of
   locally and vectorized: ``np.searchsorted(right_times, left_times,
   'right') - 1`` (both sides of the run are already time-sorted),
3. rows whose key equals a block's first/last key may continue in a
   neighboring block, so they route through one driver-side resolve.
   The shipment is ≤ 2 *keys* per block, but all ROWS of those keys —
   a single hot key spanning many blocks ships its whole run to the
   driver.  Hot keys must be bounded upstream (salt/split, or
   pre-aggregate the right side), the same contract as fitting a key
   into one sort partition.

Null join keys follow SQL semantics: a null key matches nothing —
null-key left rows are emitted unmatched (null right columns /
zero count), null-key right rows are dropped.

The sorted input is materialized (pinned by the sort's all-to-all
anyway); the join output streams.  Determinism: callers must ensure at
most one right row per ``(key, t)`` (pre-reduce duplicates) or ties at
the matched time are arbitrary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._runs import edge_mask as _null_safe_edge_mask

__all__ = ["asof_join", "windowed_count_join"]


def asof_join(left, right, key: str, left_t: str, right_t: str):
    """Backward as-of left join of two Datasets.

    ``left`` columns: ``key``, ``left_t`` (int64-comparable), payload.
    ``right`` columns: ``key``, ``right_t``, payload.  Non-key column
    names must not overlap.  Returns a Dataset with all left columns
    plus the right payload columns of the matched row (null where no
    right row has ``right_t`` ≤ ``left_t``).
    """
    import ray
    import ray.data as rd

    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    r_payload = [c for c in r_schema.names if c not in (key, right_t)]
    overlap = (set(l_cols)) & set(r_payload + [right_t])
    assert not overlap, f"overlapping columns: {overlap}"
    out_cols = l_cols + r_payload
    types = dict(zip(l_schema.names, l_schema.types))
    for n, t in zip(r_schema.names, r_schema.types):
        types.setdefault(n, t)

    # unified layout: key | __t | __side (0=right, 1=left) | payloads
    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key),
                "__t": pc.cast(batch.column(left_t), pa.int64())}
        for c in l_cols:
            if c != key:
                cols[c] = batch.column(c)
        for c in r_payload:
            cols[c] = pa.nulls(batch.num_rows, type=types[c])
        cols["__side"] = pa.array(np.ones(batch.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key),
                "__t": pc.cast(batch.column(right_t), pa.int64())}
        for c in l_cols:
            if c != key:
                cols[c] = pa.nulls(batch.num_rows, type=types[c])
        for c in r_payload:
            cols[c] = batch.column(c)
        cols["__side"] = pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        return pa.table(cols)

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    unioned = (left.map_batches(tag_left, batch_format="pyarrow",
                                zero_copy_batch=True)
               .union(right.map_batches(tag_right, batch_format="pyarrow",
                                        zero_copy_batch=True))
               .repartition(n_part))
    srt = unioned.sort([key, "__t"]).materialize()

    def _edge_mask(batch: pa.Table):
        # null-safe, and null keys are always routed to the driver pass
        # (the sort clusters them at one end; never let a null poison a
        # filter mask)
        return pc.or_(_null_safe_edge_mask(batch.column(key)),
                      pc.is_null(batch.column(key)))

    def _resolve(t: pa.Table) -> pa.Table:
        """As-of-resolve complete key runs (rows of each key sorted by
        __t; both sides interleaved).  Vectorized per run."""
        if t.num_rows == 0:
            return _empty(out_cols, types)
        nulls = pc.is_null(t.column(key))
        unmatched = None
        if pc.any(nulls).as_py():
            # SQL: null keys match nothing — null-key lefts emit
            # unmatched, null-key rights drop
            nl = t.filter(pc.and_(nulls, pc.equal(t.column("__side"), 1)))
            if nl.num_rows:
                cols = {c: nl.column(c) for c in l_cols}
                for c in r_payload:
                    cols[c] = pa.nulls(nl.num_rows, type=types[c])
                unmatched = pa.table({c: cols[c] for c in out_cols})
            t = t.filter(pc.invert(nulls))
            if t.num_rows == 0:
                return unmatched if unmatched is not None \
                    else _empty(out_cols, types)
        keys_np = t.column(key).to_numpy(zero_copy_only=False)
        times = t.column("__t").to_numpy(zero_copy_only=False)
        side = t.column("__side").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, keys_np[1:] != keys_np[:-1]])
        ends = np.append(starts[1:], len(keys_np))
        left_idx_all, match_idx_all = [], []
        for s, e in zip(starts, ends):
            ls = side[s:e] == 1
            l_pos = np.flatnonzero(ls) + s
            r_pos = np.flatnonzero(~ls) + s
            if l_pos.size == 0:
                continue
            if r_pos.size == 0:
                left_idx_all.append(l_pos)
                match_idx_all.append(np.full(l_pos.size, -1, dtype=np.int64))
                continue
            # right times are sorted within the run; greatest ≤ left t
            m = np.searchsorted(times[r_pos], times[l_pos], side="right") - 1
            left_idx_all.append(l_pos)
            match_idx_all.append(np.where(m >= 0, r_pos[np.clip(m, 0, None)], -1))
        if not left_idx_all:
            return unmatched if unmatched is not None \
                else _empty(out_cols, types)
        l_idx = np.concatenate(left_idx_all)
        m_idx = np.concatenate(match_idx_all)
        lt = t.take(pa.array(l_idx))
        cols = {c: lt.column(c) for c in l_cols}
        matched = m_idx >= 0
        take_r = pa.array(np.where(matched, m_idx, 0), type=pa.int64())
        null_mask = pa.array(~matched)
        for c in r_payload:
            v = t.column(c).take(take_r)
            cols[c] = pc.if_else(null_mask, pa.scalar(None, type=types[c]),
                                 pc.cast(v, types[c]))
        out = pa.table({c: cols[c] for c in out_cols})
        if unmatched is not None:
            out = pa.concat_tables([out, unmatched],
                                   promote_options="permissive")
        return out

    # Pass 1 (cheap): boundary-key rows to the driver — complete runs.
    def edge_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.filter(_edge_mask(batch))

    edge_refs = srt.map_batches(edge_rows, batch_format="pyarrow",
                                zero_copy_batch=True).to_arrow_refs()
    edge_tables = [t for t in ray.get(edge_refs) if t.num_rows]

    # Pass 2 (streaming): interior key runs resolve in-block.
    def interior(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(out_cols, types)
        return _resolve(batch.filter(pc.invert(_edge_mask(batch))))

    interior_ds = srt.map_batches(interior, batch_format="pyarrow",
                                  zero_copy_batch=True)
    if not edge_tables:
        return interior_ds
    et = pa.concat_tables(edge_tables, promote_options="permissive")
    idx = pc.sort_indices(et, sort_keys=[(key, "ascending"),
                                         ("__t", "ascending")])
    resolved = _resolve(et.take(idx))
    if resolved.num_rows == 0:
        return interior_ds
    return interior_ds.union(rd.from_arrow(resolved))


def _empty(out_cols, types) -> pa.Table:
    return pa.table({c: pa.array([], type=types[c]) for c in out_cols})


def windowed_count_join(left, right, key: str, left_t: str, right_t: str,
                        window: int, count_name: str = "n_in_window",
                        value_col: str | None = None,
                        sum_name: str | None = None):
    """Trailing-window interval join, aggregated: for every left row,
    the COUNT of same-key right rows with ``t ∈ [left_t − window,
    left_t]`` (the attribution-window / "recent activity" shape —
    ``LEFT JOIN ... BETWEEN`` + ``GROUP BY`` in SQL), and optionally
    the SUM of a right-side int64 ``value_col`` over the same window
    (``sum_name`` column; 0 when no right rows match, matching
    ``COALESCE(SUM(...), 0)``).

    Emitting the aggregates instead of the matched pairs keeps the
    output exactly one row per left row — a raw interval join's output
    is |matches| and can explode; aggregate in the operator, not after.

    Same plan as :func:`asof_join` (one sort, per-run vectorized
    resolution, edge keys through the driver): counts come from two
    ``searchsorted`` calls per run and sums from a per-run prefix sum —
    no pairwise work at all.
    """
    import ray
    import ray.data as rd

    l_schema = left.schema()
    l_cols = list(l_schema.names)
    assert count_name not in l_cols
    want_sum = value_col is not None
    if want_sum and sum_name is None:
        sum_name = f"sum_{value_col}"
    out_cols = l_cols + [count_name] + ([sum_name] if want_sum else [])
    types = dict(zip(l_schema.names, l_schema.types))
    types[count_name] = pa.int64()
    if want_sum:
        assert sum_name not in l_cols
        types[sum_name] = pa.int64()

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key),
                "__t": pc.cast(batch.column(left_t), pa.int64())}
        for c in l_cols:
            if c != key:
                cols[c] = batch.column(c)
        if want_sum:
            cols["__v"] = pa.nulls(batch.num_rows, type=pa.int64())
        cols["__side"] = pa.array(np.ones(batch.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key),
                "__t": pc.cast(batch.column(right_t), pa.int64())}
        for c in l_cols:
            if c != key:
                cols[c] = pa.nulls(batch.num_rows, type=types[c])
        if want_sum:
            cols["__v"] = pc.cast(batch.column(value_col), pa.int64())
        cols["__side"] = pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        return pa.table(cols)

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    unioned = (left.map_batches(tag_left, batch_format="pyarrow",
                                zero_copy_batch=True)
               .union(right.map_batches(tag_right, batch_format="pyarrow",
                                        zero_copy_batch=True))
               .repartition(n_part))
    srt = unioned.sort([key, "__t"]).materialize()

    def _edge_mask(batch: pa.Table):
        return pc.or_(_null_safe_edge_mask(batch.column(key)),
                      pc.is_null(batch.column(key)))

    def _resolve(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty(out_cols, types)
        nulls = pc.is_null(t.column(key))
        zero_part = None
        if pc.any(nulls).as_py():
            # SQL: null keys match nothing — null-key lefts count 0,
            # null-key rights drop
            nl = t.filter(pc.and_(nulls, pc.equal(t.column("__side"), 1)))
            if nl.num_rows:
                cols = {c: nl.column(c) for c in l_cols}
                cols[count_name] = pa.array(
                    np.zeros(nl.num_rows, dtype=np.int64))
                if want_sum:
                    cols[sum_name] = pa.array(
                        np.zeros(nl.num_rows, dtype=np.int64))
                zero_part = pa.table({c: cols[c] for c in out_cols})
            t = t.filter(pc.invert(nulls))
            if t.num_rows == 0:
                return zero_part if zero_part is not None \
                    else _empty(out_cols, types)
        keys_np = t.column(key).to_numpy(zero_copy_only=False)
        times = t.column("__t").to_numpy(zero_copy_only=False)
        side = t.column("__side").to_numpy(zero_copy_only=False)
        vals = (t.column("__v").to_numpy(zero_copy_only=False)
                if want_sum else None)
        starts = np.flatnonzero(np.r_[True, keys_np[1:] != keys_np[:-1]])
        ends = np.append(starts[1:], len(keys_np))
        l_all, c_all, s_all = [], [], []
        for s, e in zip(starts, ends):
            ls = side[s:e] == 1
            l_pos = np.flatnonzero(ls) + s
            if l_pos.size == 0:
                continue
            r_pos = np.flatnonzero(~ls) + s
            r_t = times[r_pos]
            lt = times[l_pos]
            if r_t.size == 0:
                cnt = np.zeros(l_pos.size, dtype=np.int64)
                if want_sum:
                    s_all.append(np.zeros(l_pos.size, dtype=np.int64))
            else:
                hi = np.searchsorted(r_t, lt, side="right")
                lo = np.searchsorted(r_t, lt - window, side="left")
                cnt = (hi - lo).astype(np.int64)
                if want_sum:
                    # prefix sum over the run's time-sorted right values:
                    # windowed sum = cs[hi] - cs[lo] (exact int64)
                    cs = np.zeros(r_t.size + 1, dtype=np.int64)
                    np.cumsum(vals[r_pos].astype(np.int64), out=cs[1:])
                    s_all.append(cs[hi] - cs[lo])
            l_all.append(l_pos)
            c_all.append(cnt)
        if not l_all:
            return zero_part if zero_part is not None \
                else _empty(out_cols, types)
        l_idx = np.concatenate(l_all)
        lt_tbl = t.take(pa.array(l_idx))
        cols = {c: lt_tbl.column(c) for c in l_cols}
        cols[count_name] = pa.array(np.concatenate(c_all), type=pa.int64())
        if want_sum:
            cols[sum_name] = pa.array(np.concatenate(s_all), type=pa.int64())
        out = pa.table({c: cols[c] for c in out_cols})
        if zero_part is not None:
            out = pa.concat_tables([out, zero_part],
                                   promote_options="permissive")
        return out

    def edge_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.filter(_edge_mask(batch))

    edge_refs = srt.map_batches(edge_rows, batch_format="pyarrow",
                                zero_copy_batch=True).to_arrow_refs()
    edge_tables = [t for t in ray.get(edge_refs) if t.num_rows]

    def interior(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(out_cols, types)
        return _resolve(batch.filter(pc.invert(_edge_mask(batch))))

    interior_ds = srt.map_batches(interior, batch_format="pyarrow",
                                  zero_copy_batch=True)
    if not edge_tables:
        return interior_ds
    et = pa.concat_tables(edge_tables, promote_options="permissive")
    idx = pc.sort_indices(et, sort_keys=[(key, "ascending"),
                                         ("__t", "ascending")])
    resolved = _resolve(et.take(idx))
    if resolved.num_rows == 0:
        return interior_ds
    return interior_ds.union(rd.from_arrow(resolved))
