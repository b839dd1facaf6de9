"""Distributed backward as-of join and trailing-window aggregate join
(Ray Data has neither operator).

``asof_join(left, right, ...)`` matches every left row to the right
row with the greatest time ≤ the left row's time within the same key —
the classic "latest state as of t" lookup (DuckDB ``ASOF JOIN``,
pandas ``merge_asof``).  Left-join semantics: unmatched left rows keep
null right columns.  ``windowed_count_join`` aggregates instead of
matching: COUNT (and optionally SUM of a right value column) of
same-key right rows in the trailing window ``[t − w, t]``.

Plan — the **carry-in exchange** (hot-key-safe, no row-sized driver
shipments):

1. union both sides with a side tag and range-partition **sort** on
   ``(key, t, side)`` with right < left, so each key's rows are one
   contiguous time-sorted run and a right row at the *same* t as a
   left row always sorts at or before it (backward as-of is
   inclusive);
2. a cheap per-block **summary** pass ships only boundary metadata to
   the driver: first/last key, the boundary run's time extent, and the
   run's *carry candidates* — for as-of the single latest right row,
   for the windowed join the right rows within ``w`` of the run's last
   local time (everything older can never fall in a later left row's
   window).  Shipment per block is O(1) for as-of and bounded by the
   window's right-row density for the windowed join — never by a hot
   key's row count;
3. the driver threads carries forward along the sorted block order
   (a backward scan per block over the tiny summaries), and
4. one task per block prepends its carry rows (they sort at-or-before
   the block's first run by construction) and resolves EVERY left row
   locally and vectorized (``searchsorted`` per run; prefix sums for
   windowed SUMs).  No left row ever leaves its block.

Null join keys follow SQL semantics: a null key matches nothing —
null-key left rows are emitted unmatched (null right columns /
zero count), null-key right rows are dropped.

The sorted input is materialized (pinned by the sort's all-to-all
anyway); the resolved output is produced by per-block tasks and
consumed as a Dataset via ``from_arrow_refs`` (blocks stay in the
object store; nothing aggregates on the driver).  Determinism: callers
must ensure at most one right row per ``(key, t)`` (pre-reduce
duplicates) or ties at the matched time are arbitrary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["asof_join", "windowed_count_join"]


# --------------------------------------------------------------- shared plan


def _tagged_sort(left, right, key, left_t, right_t, l_cols, r_payload,
                 types, extra_right=None):
    """Union-tag both sides and sort on (key, __t, __side) with
    right(0) < left(1); returns the materialized sorted Dataset."""
    import ray

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
            cols[c] = (pc.cast(batch.column(extra_right[c]), types[c])
                       if extra_right and c in extra_right
                       else batch.column(c))
        cols["__side"] = pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        return pa.table(cols)

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    unioned = (left.map_batches(tag_left, batch_format="pyarrow",
                                zero_copy_batch=True)
               .union(right.map_batches(tag_right, batch_format="pyarrow",
                                        zero_copy_batch=True))
               .repartition(n_part))
    from ._runs import nullsafe_sort
    return nullsafe_sort(unioned, [key, "__t", "__side"]).materialize()


def _block_summary(t: pa.Table, key: str, keep_right_within: int | None):
    """Boundary metadata for the carry scan: (first_key, last_key,
    first_run_min_t, last_run_max_t, carry_candidates_table).

    ``keep_right_within=None`` → as-of mode: the boundary (last) run's
    single latest right row.  Otherwise windowed mode: the run's right
    rows with t ≥ last_run_max_t − keep_right_within.
    """
    if t.num_rows == 0:
        return None
    keys = t.column(key)
    first_key = keys[0].as_py()
    last_key = keys[t.num_rows - 1].as_py()

    def _run_eq(scalar):
        if not scalar.is_valid:
            return pc.is_null(keys)
        return pc.fill_null(pc.equal(keys, scalar), False)

    first_run = t.filter(_run_eq(keys[0]))
    last_run = t.filter(_run_eq(keys[t.num_rows - 1]))
    first_run_min_t = first_run.column("__t")[0].as_py()
    last_run_max_t = last_run.column("__t")[last_run.num_rows - 1].as_py()

    rights = last_run.filter(pc.equal(last_run.column("__side"), 0))
    if last_key is None or rights.num_rows == 0:
        carry = rights.slice(0, 0)
    elif keep_right_within is None:
        carry = rights.slice(rights.num_rows - 1, 1)
    else:
        rt = rights.column("__t").to_numpy(zero_copy_only=False)
        lo = int(np.searchsorted(rt, last_run_max_t - keep_right_within,
                                 side="left"))
        carry = rights.slice(lo)
    return (first_key, last_key, first_run_min_t, last_run_max_t, carry)


def _thread_carries(summaries, window: int | None):
    """Driver-side backward scan over the ordered per-block summaries:
    carry rows for each block's FIRST run, collected from earlier
    blocks while the run continues.  As-of (window=None) stops at the
    nearest block holding a right row; windowed mode accumulates until
    the run breaks or everything earlier is older than any possible
    window."""
    n = len(summaries)
    carries = [None] * n
    for j in range(n):
        sj = summaries[j]
        if sj is None:
            continue
        first_key, _, first_min_t, _, _ = sj
        if first_key is None:
            continue            # null keys never match — no carry
        collected = []
        for i in range(j - 1, -1, -1):
            si = summaries[i]
            if si is None:
                continue        # empty block: the run continues past it
            i_first, i_last, _, i_max_t, i_carry = si
            if i_last != first_key:
                break           # run does not extend into block i
            if window is not None and i_max_t < first_min_t - window:
                break           # older than any later window
            if i_carry.num_rows:
                collected.append(i_carry)
                if window is None:
                    break       # as-of: nearest right row wins
            if i_first != first_key:
                break           # the run starts inside block i
        if collected:
            collected.reverse()     # oldest → newest (sorted order)
            carries[j] = pa.concat_tables(collected)
    return carries


# ------------------------------------------------------------------- asof


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

    def _resolve(t: pa.Table) -> pa.Table:
        """As-of-resolve complete key runs (rows of each key sorted by
        __t with rights first at ties).  Vectorized per run."""
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

    srt = _tagged_sort(left, right, key, left_t, right_t,
                       l_cols, r_payload, types)
    return _carry_resolve(srt, key, None, _resolve)


def _carry_resolve(srt, key, window, resolve_fn):
    """Run the summary pass, thread carries, and launch one resolve
    task per sorted block (carry rows prepended — they sort at or
    before the block's first run)."""
    import ray
    import ray.data as rd

    block_refs = srt.to_arrow_refs()
    if not block_refs:
        # resolve_fn returns its typed empty output for an empty table
        return rd.from_arrow(resolve_fn(pa.table({})))

    @ray.remote
    def summarize(t: pa.Table):
        return _block_summary(t, key, window)

    @ray.remote
    def resolve(t: pa.Table, carry):
        if carry is not None and carry.num_rows:
            t = pa.concat_tables([carry.select(t.schema.names), t])
        return resolve_fn(t)

    summaries = ray.get([summarize.remote(r) for r in block_refs])
    carries = _thread_carries(summaries, window)
    out_refs = [resolve.remote(r, c) for r, c in zip(block_refs, carries)]
    return rd.from_arrow_refs(out_refs)


def _empty(out_cols, types) -> pa.Table:
    return pa.table({c: pa.array([], type=types[c]) for c in out_cols})


# ----------------------------------------------------------------- windowed


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

    Same carry-in plan as :func:`asof_join`: counts come from two
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

    r_payload = ["__v"] if want_sum else []
    wtypes = dict(types)
    if want_sum:
        wtypes["__v"] = pa.int64()
    srt = _tagged_sort(left, right, key, left_t, right_t, l_cols,
                       r_payload, wtypes,
                       extra_right={"__v": value_col} if want_sum else None)
    return _carry_resolve(srt, key, window, _resolve)
