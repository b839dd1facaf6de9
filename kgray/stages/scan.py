"""Distributed partitioned prefix scan: the SQL running-total window
``SUM(v) OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED PRECEDING)``
(Ray Data has no window functions).

Plan — the scan variant of the carry-in exchange (``stages/asof.py``):

1. range-partition **sort** on ``(key, order_cols...)`` — each key's
   rows become one contiguous run in a globally deterministic order
   (callers must include a tiebreak column so the order is total,
   exactly like the SQL window's ORDER BY);
2. a summary pass ships ONE row per (block, boundary run): the run's
   local value total — never the rows;
3. the driver threads per-block carry offsets along the sorted block
   order (prefix-summing the tiny summaries), and
4. one task per block adds its carry offset to the local per-run
   cumulative sums.  Exact int64 arithmetic throughout.

Null keys form one partition (SQL PARTITION BY semantics — unlike a
join key, a window partition key of NULL still gets window values).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._runs import nullsafe_sort, run_starts

__all__ = ["grouped_running_sum", "grouped_lag", "grouped_lead",
           "grouped_ranks", "grouped_ntile_stats", "grouped_first_last"]


def grouped_running_sum(ds, key: str, order_cols: list, value_col: str,
                        out_name: str = "running_sum"):
    """Append ``out_name``: the running int64 sum of ``value_col``
    within ``key``, ordered by ``order_cols`` (must make the order
    total — include a unique tiebreak).  Returns all input columns
    plus the running sum, one output row per input row.
    """
    import ray
    import ray.data as rd

    schema = ds.schema()
    assert out_name not in schema.names
    out_cols = list(schema.names) + [out_name]
    types = dict(zip(schema.names, schema.types))
    types[out_name] = pa.int64()

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = nullsafe_sort(ds.repartition(n_part),
                        [key] + list(order_cols)).materialize()

    block_refs = srt.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(
            pa.table({c: pa.array([], type=types[c]) for c in out_cols}))

    @ray.remote
    def summarize(t: pa.Table):
        """(first_key, last_key, first_run_total, last_run_total) —
        run totals of the two boundary runs (equal when one key fills
        the block).  Keys may be null (one partition)."""
        if t.num_rows == 0:
            return None
        keys = t.column(key)
        vals = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = run_starts(keys)
        first_end = int(starts[1]) if len(starts) > 1 else t.num_rows
        last_start = int(starts[-1])
        return (keys[0].as_py(), keys[t.num_rows - 1].as_py(),
                int(vals[:first_end].sum()), int(vals[last_start:].sum()))

    summaries = ray.get([summarize.remote(r) for r in block_refs])

    # thread carry offsets: for block j's FIRST run, the total of all
    # earlier blocks' rows of the same key (prefix sum over summaries)
    def _same(a, b):
        return (a is None and b is None) or a == b

    carries = [0] * len(summaries)
    for j, sj in enumerate(summaries):
        if sj is None:
            continue
        first_key = sj[0]
        acc = 0
        for i in range(j - 1, -1, -1):
            si = summaries[i]
            if si is None:
                continue
            i_first, i_last, i_first_tot, i_last_tot = si
            if not _same(i_last, first_key):
                break
            if _same(i_first, i_last):
                acc += i_first_tot       # whole block is the run
                continue                 # run may extend further back
            acc += i_last_tot            # run starts inside block i
            break
        carries[j] = acc

    @ray.remote
    def scan_block(t: pa.Table, carry: int):
        if t.num_rows == 0:
            return pa.table({c: pa.array([], type=types[c])
                             for c in out_cols})
        vals = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cum = np.cumsum(vals)
        starts = run_starts(t.column(key))
        # subtract each run's preceding total so cumsum restarts per run
        base = np.zeros(t.num_rows, dtype=np.int64)
        run_base = cum[starts - 1]       # starts[0] == 0 → cum[-1]; fix below
        run_base[0] = 0
        reps = np.diff(np.append(starts, t.num_rows))
        base = np.repeat(run_base, reps)
        running = cum - base
        running[:int(starts[1]) if len(starts) > 1 else t.num_rows] += carry
        cols = {c: t.column(c) for c in t.schema.names}
        cols[out_name] = pa.array(running, type=pa.int64())
        return pa.table({c: cols[c] for c in out_cols})

    out_refs = [scan_block.remote(r, c) for r, c in zip(block_refs, carries)]
    return rd.from_arrow_refs(out_refs)


def grouped_lag(ds, key: str, order_cols: list, value_col: str,
                out_name: str = "lag"):
    """SQL ``LAG(value) OVER (PARTITION BY key ORDER BY ...)``: each
    row gets the PREVIOUS row's ``value_col`` within its partition
    (null for the partition's first row).  Same carry-in plan as
    :func:`grouped_running_sum`, but the carry is one value per block —
    the boundary run's last ``value_col``.
    """
    import ray
    import ray.data as rd

    schema = ds.schema()
    assert out_name not in schema.names
    out_cols = list(schema.names) + [out_name]
    types = dict(zip(schema.names, schema.types))
    vt = types[value_col]
    types[out_name] = vt

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = nullsafe_sort(ds.repartition(n_part),
                        [key] + list(order_cols)).materialize()

    block_refs = srt.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(
            pa.table({c: pa.array([], type=types[c]) for c in out_cols}))

    @ray.remote
    def summarize(t: pa.Table):
        """(first_key, last_key, last_value) — the boundary run's last
        value, i.e. the LAG carry for the next block if the run
        continues."""
        if t.num_rows == 0:
            return None
        keys = t.column(key)
        return (keys[0].as_py(), keys[t.num_rows - 1].as_py(),
                t.column(value_col)[t.num_rows - 1].as_py())

    summaries = ray.get([summarize.remote(r) for r in block_refs])

    def _same(a, b):
        return (a is None and b is None) or a == b

    carries = [None] * len(summaries)       # previous value or None
    for j, sj in enumerate(summaries):
        if sj is None:
            continue
        first_key = sj[0]
        for i in range(j - 1, -1, -1):
            si = summaries[i]
            if si is None:
                continue
            if not _same(si[1], first_key):
                break
            carries[j] = si[2]              # nearest earlier row's value
            break
        # (a run spanning an entire empty-summary gap keeps scanning)

    @ray.remote
    def lag_block(t: pa.Table, carry):
        if t.num_rows == 0:
            return pa.table({c: pa.array([], type=types[c])
                             for c in out_cols})
        vals = t.column(value_col)
        starts = run_starts(t.column(key))
        # shifted-by-one take: index i-1, with run starts nulled
        idx = np.arange(t.num_rows, dtype=np.int64) - 1
        idx[0] = 0
        lagged = vals.take(pa.array(idx, type=pa.int64()))
        null_at = np.zeros(t.num_rows, dtype=bool)
        null_at[starts] = True
        lagged = pc.if_else(pa.array(null_at), pa.scalar(None, type=vt),
                            lagged)
        if carry is not None:
            # the first run continues from an earlier block: its first
            # row's LAG is the carried value, not null
            first = np.zeros(t.num_rows, dtype=bool)
            first[0] = True
            lagged = pc.if_else(pa.array(first), pa.scalar(carry, type=vt),
                                lagged)
        cols = {c: t.column(c) for c in t.schema.names}
        cols[out_name] = lagged
        return pa.table({c: cols[c] for c in out_cols})

    out_refs = [lag_block.remote(r, c) for r, c in zip(block_refs, carries)]
    return rd.from_arrow_refs(out_refs)


def grouped_lead(ds, key: str, order_cols: list, value_col: str,
                 out_name: str = "lead"):
    """SQL ``LEAD(value) OVER (PARTITION BY key ORDER BY ...)``: each
    row gets the NEXT row's ``value_col`` within its partition (null
    for the partition's last row).  Mirror of :func:`grouped_lag` with
    the carry threaded BACKWARD: each block's carry is the nearest
    later row's value of its last run.
    """
    import ray
    import ray.data as rd

    schema = ds.schema()
    assert out_name not in schema.names
    out_cols = list(schema.names) + [out_name]
    types = dict(zip(schema.names, schema.types))
    vt = types[value_col]
    types[out_name] = vt

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = nullsafe_sort(ds.repartition(n_part),
                        [key] + list(order_cols)).materialize()

    block_refs = srt.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(
            pa.table({c: pa.array([], type=types[c]) for c in out_cols}))

    @ray.remote
    def summarize(t: pa.Table):
        """(first_key, last_key, first_value) — the boundary run's
        first value: the LEAD carry for the PREVIOUS block if the run
        continues."""
        if t.num_rows == 0:
            return None
        keys = t.column(key)
        return (keys[0].as_py(), keys[t.num_rows - 1].as_py(),
                t.column(value_col)[0].as_py())

    summaries = ray.get([summarize.remote(r) for r in block_refs])

    def _same(a, b):
        return (a is None and b is None) or a == b

    carries = [None] * len(summaries)       # next value or None
    for j, sj in enumerate(summaries):
        if sj is None:
            continue
        last_key = sj[1]
        for i in range(j + 1, len(summaries)):
            si = summaries[i]
            if si is None:
                continue
            if not _same(si[0], last_key):
                break
            carries[j] = si[2]              # nearest later row's value
            break

    @ray.remote
    def lead_block(t: pa.Table, carry):
        if t.num_rows == 0:
            return pa.table({c: pa.array([], type=types[c])
                             for c in out_cols})
        n = t.num_rows
        vals = t.column(value_col)
        starts = run_starts(t.column(key))
        idx = np.arange(n, dtype=np.int64) + 1
        idx[-1] = n - 1
        led = vals.take(pa.array(idx, type=pa.int64()))
        # null at each run's LAST row (position start-1 of next run, and n-1)
        null_at = np.zeros(n, dtype=bool)
        null_at[starts[1:] - 1] = True
        null_at[n - 1] = True
        led = pc.if_else(pa.array(null_at), pa.scalar(None, type=vt), led)
        if carry is not None:
            last = np.zeros(n, dtype=bool)
            last[n - 1] = True
            led = pc.if_else(pa.array(last), pa.scalar(carry, type=vt), led)
        cols = {c: t.column(c) for c in t.schema.names}
        cols[out_name] = led
        return pa.table({c: cols[c] for c in out_cols})

    out_refs = [lead_block.remote(r, c) for r, c in zip(block_refs, carries)]
    return rd.from_arrow_refs(out_refs)


def _union_run_starts(t: pa.Table, cols: list) -> np.ndarray:
    """Run starts where ANY of ``cols`` changes (null-safe per column):
    the composite-key run boundaries."""
    acc = None
    for c in cols:
        s = run_starts(t.column(c))
        acc = s if acc is None else np.union1d(acc, s)
    return acc.astype(np.int64)


def grouped_ranks(ds, key: str, order_cols: list):
    """SQL ``ROW_NUMBER() / RANK() / DENSE_RANK() OVER (PARTITION BY
    key ORDER BY order_cols)`` — all three appended as int64 columns
    ``row_number``, ``rank``, ``dense_rank`` (ascending order; ties =
    equal ``order_cols`` tuples, SQL semantics).

    Carry-in exchange: per block one summary row for its LAST run —
    (rows, distinct tie groups, first/last order tuple, within-run rank
    of the last tie group's start).  The driver folds summaries along
    the sorted block order; each block then resolves every row locally.
    No row ever leaves its block.
    """
    import ray
    import ray.data as rd

    schema = ds.schema()
    for c in ("row_number", "rank", "dense_rank"):
        assert c not in schema.names
    out_cols = list(schema.names) + ["row_number", "rank", "dense_rank"]
    types = dict(zip(schema.names, schema.types))
    for c in ("row_number", "rank", "dense_rank"):
        types[c] = pa.int64()
    order_cols = list(order_cols)

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = nullsafe_sort(ds.repartition(n_part),
                        [key] + list(order_cols)).materialize()

    block_refs = srt.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(
            pa.table({c: pa.array([], type=types[c]) for c in out_cols}))

    def _tuple_at(t: pa.Table, i: int):
        return tuple(t.column(c)[i].as_py() for c in order_cols)

    @ray.remote
    def summarize(t: pa.Table):
        if t.num_rows == 0:
            return None
        n = t.num_rows
        kstarts = run_starts(t.column(key))
        tstarts = _union_run_starts(t, [key] + order_cols)
        last_run = int(kstarts[-1])
        l_t = tstarts[tstarts >= last_run]
        return {
            "first_key": t.column(key)[0].as_py(),
            "last_key": t.column(key)[n - 1].as_py(),
            "single_run": len(kstarts) == 1,
            "rows": n - last_run,
            "distinct": len(l_t),
            "first_val": _tuple_at(t, last_run if len(kstarts) > 1 else 0),
            "last_val": _tuple_at(t, n - 1),
            "rank_lgs": int(l_t[-1]) - last_run + 1,
        }

    summaries = ray.get([summarize.remote(r) for r in block_refs])

    def _same(a, b):
        return (a is None and b is None) or a == b

    # forward threading: state describes the in-progress run through
    # the end of the previously seen block
    carries = [None] * len(summaries)
    state = None        # (key, rows, distinct, last_val, rank_lgs)
    for j, s in enumerate(summaries):
        if s is None:
            continue
        if state is not None and _same(state[0], s["first_key"]):
            carries[j] = state
        c = carries[j]
        if s["single_run"] and c is not None:
            bsame = c[3] == s["first_val"]
            rows = c[1] + s["rows"]
            distinct = c[2] + s["distinct"] - (1 if bsame else 0)
            if s["distinct"] == 1 and bsame:
                rank_lgs = c[4]
            else:
                rank_lgs = c[1] + s["rank_lgs"]
            state = (s["last_key"], rows, distinct, s["last_val"], rank_lgs)
        else:
            state = (s["last_key"], s["rows"], s["distinct"],
                     s["last_val"], s["rank_lgs"])

    @ray.remote
    def rank_block(t: pa.Table, carry):
        if t.num_rows == 0:
            return pa.table({c: pa.array([], type=types[c])
                             for c in out_cols})
        n = t.num_rows
        kstarts = run_starts(t.column(key))
        tstarts = _union_run_starts(t, [key] + order_cols)
        row_idx = np.arange(n, dtype=np.int64)
        kreps = np.diff(np.append(kstarts, n))
        run_base = np.repeat(kstarts, kreps)
        rn = row_idx - run_base + 1
        treps = np.diff(np.append(tstarts, n))
        tie_base = np.repeat(tstarts, treps)
        rank = tie_base - run_base + 1
        # dense: tie-group ordinal per row minus the run's first ordinal
        g_ord = np.repeat(np.arange(len(tstarts), dtype=np.int64), treps)
        dense = g_ord - g_ord[run_base] + 1
        if carry is not None:
            _, c_rows, c_distinct, c_last_val, c_rank_lgs = carry
            first_end = int(kstarts[1]) if len(kstarts) > 1 else n
            first_run = row_idx < first_end
            rn[first_run] += c_rows
            rank[first_run] += c_rows
            bsame = c_last_val == tuple(
                t.column(c)[0].as_py() for c in order_cols)
            dense[first_run] += c_distinct - (1 if bsame else 0)
            if bsame:
                # the first tie group continues the carried group
                first_tie_end = int(tstarts[1]) if len(tstarts) > 1 else n
                first_tie_end = min(first_tie_end, first_end)
                rank[:first_tie_end] = c_rank_lgs
        cols = {c: t.column(c) for c in t.schema.names}
        cols["row_number"] = pa.array(rn, type=pa.int64())
        cols["rank"] = pa.array(rank, type=pa.int64())
        cols["dense_rank"] = pa.array(dense, type=pa.int64())
        return pa.table({c: cols[c] for c in out_cols})

    out_refs = [rank_block.remote(r, c) for r, c in zip(block_refs, carries)]
    return rd.from_arrow_refs(out_refs)


def grouped_ntile_stats(ds, key: str, order_cols: list, n_tiles: int = 4):
    """SQL ``NTILE(n) / PERCENT_RANK() / CUME_DIST() OVER (PARTITION BY
    key ORDER BY order_cols)`` appended as ``ntile`` (int64),
    ``percent_rank`` and ``cume_dist`` (float64).

    Composition of existing exchanges — no new shuffle machinery:
    :func:`grouped_ranks` provides row_number/rank, one
    ``sorted_group_aggregate`` provides |partition| and the per-order-
    value tie counts ride along via a max-rank aggregate, and a
    ``sorted_merge_join`` on the partition key attaches sizes.

    * ntile follows SQL semantics: with size = q·n + r, the first r
      buckets get q+1 rows (assigned by row_number, so a total order
      in ``order_cols`` makes it deterministic).
    * percent_rank = (rank − 1) / (size − 1)  (0 when size == 1)
    * cume_dist   = peers(rank) / size, where peers(rank) = the highest
      row_number sharing the row's rank tie group — computed per block
      from the rank column itself (max row_number per (key, rank) run
      rides the same aggregate).
    """
    import pyarrow.compute as _pc

    from .aggregate import sorted_group_aggregate
    from .join import sorted_merge_join

    ranked = grouped_ranks(ds, key, order_cols).materialize()

    sizes = sorted_group_aggregate(
        ranked.map_batches(lambda b: pa.table({
            key: b.column(key),
            "__size": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow"),
        key, [("__size", "sum")])
    # per (key, rank): the tie group's last row_number == cume count
    peers = sorted_group_aggregate(
        ranked.map_batches(lambda b: pa.table({
            key: b.column(key),
            "rank": b.column("rank"),
            "__peer_max": b.column("row_number")}),
            batch_format="pyarrow"),
        [key, "rank"], [("__peer_max", "max")])

    with_size = sorted_merge_join(ranked, sizes, on=key)

    # join peers on (key, rank): encode the pair as one key column to
    # reuse the single-key join (rank < 2^20 per partition is not
    # assumed — use a string pairing)
    def pair_key(b: pa.Table, kcol: str) -> pa.Array:
        ks = b.column(kcol).to_pylist()
        rs = b.column("rank").to_pylist()
        return pa.array([f"{k}\x00{r}" for k, r in zip(ks, rs)],
                        type=pa.string())

    lhs = with_size.map_batches(
        lambda b: b.append_column("__kr", pair_key(b, key)),
        batch_format="pyarrow")
    rhs = peers.map_batches(
        lambda b: pa.table({"__kr": pair_key(b, key),
                            "__peer_max": b.column("__peer_max")}),
        batch_format="pyarrow")
    joined = sorted_merge_join(lhs, rhs, on="__kr")

    def finish(b: pa.Table) -> pa.Table:
        rn = b.column("row_number").to_numpy(zero_copy_only=False)
        rk = b.column("rank").to_numpy(zero_copy_only=False)
        sz = b.column("__size").to_numpy(zero_copy_only=False)
        pm = b.column("__peer_max").to_numpy(zero_copy_only=False)
        q, r = sz // n_tiles, sz % n_tiles
        cut = r * (q + 1)
        in_big = rn <= cut
        with np.errstate(divide="ignore", invalid="ignore"):
            tile = np.where(
                in_big, (rn - 1) // np.maximum(q + 1, 1),
                r + (rn - 1 - cut) // np.maximum(q, 1)) + 1
            prk = np.where(sz > 1, (rk - 1) / (sz - 1), 0.0)
        cume = pm / sz
        cols = {c: b.column(c) for c in b.schema.names
                if not c.startswith("__")}
        cols["ntile"] = pa.array(tile.astype(np.int64))
        cols["percent_rank"] = pa.array(prk.astype(np.float64))
        cols["cume_dist"] = pa.array(cume.astype(np.float64))
        return pa.table(cols)

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def grouped_first_last(ds, key: str, order_cols: list, value_col: str,
                       first_name: str = "first_value",
                       last_name: str = "last_value"):
    """SQL ``FIRST_VALUE(v) / LAST_VALUE(v) OVER (PARTITION BY key
    ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    FOLLOWING)`` — every row gets its partition's first and last value
    in the (total) window order.  One sort; one summary row per block
    (five scalars); carries threaded BOTH ways along the sorted block
    order — forward carries the partition-first value into blocks whose
    first run continues an earlier block, backward the partition-last
    value into blocks whose last run continues a later one.  No row
    ever leaves its block.
    """
    import ray
    import ray.data as rd

    schema = ds.schema()
    assert first_name not in schema.names and last_name not in schema.names
    out_cols = list(schema.names) + [first_name, last_name]
    types = dict(zip(schema.names, schema.types))
    vt = types[value_col]
    types[first_name] = vt
    types[last_name] = vt

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = nullsafe_sort(ds.repartition(n_part),
                        [key] + list(order_cols)).materialize()

    block_refs = srt.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(
            pa.table({c: pa.array([], type=types[c]) for c in out_cols}))

    @ray.remote
    def summarize(t: pa.Table):
        """(first_key, last_key, single_run, block_first_value,
        block_last_value, last_run_first_value, first_run_last_value)."""
        if t.num_rows == 0:
            return None
        keys = t.column(key)
        starts = run_starts(keys)
        second = int(starts[1]) if len(starts) > 1 else t.num_rows
        v = t.column(value_col)
        return (keys[0].as_py(), keys[t.num_rows - 1].as_py(),
                len(starts) == 1,
                v[0].as_py(), v[t.num_rows - 1].as_py(),
                v[int(starts[-1])].as_py(), v[second - 1].as_py())

    summaries = ray.get([summarize.remote(r) for r in block_refs])

    def _same(a, b):
        return (a is None and b is None) or a == b

    # forward: carry = the partition-first value for each block whose
    # FIRST run continues from an earlier block.  State after block j =
    # (last_key, first value of the in-progress run).  Wrapped in a
    # 1-tuple so a legitimately-None first value still carries.
    fwd = [None] * len(summaries)
    state = None
    for j, s in enumerate(summaries):
        if s is None:
            continue
        if state is not None and _same(state[0], s[0]):
            fwd[j] = (state[1],)
        if s[2] and fwd[j] is not None:          # run spans whole block
            state = (s[1], fwd[j][0])
        else:
            state = (s[1], s[3] if s[2] else s[5])

    # backward: carry = the partition-last value for each block whose
    # LAST run continues into a later block.
    bwd = [None] * len(summaries)
    state = None
    for j in range(len(summaries) - 1, -1, -1):
        s = summaries[j]
        if s is None:
            continue
        if state is not None and _same(state[0], s[1]):
            bwd[j] = (state[1],)
        if s[2] and bwd[j] is not None:
            state = (s[0], bwd[j][0])
        else:
            state = (s[0], s[4] if s[2] else s[6])

    @ray.remote
    def fl_block(t: pa.Table, f_carry, b_carry):
        if t.num_rows == 0:
            return pa.table({c: pa.array([], type=types[c])
                             for c in out_cols})
        n = t.num_rows
        vals = t.column(value_col)
        starts = run_starts(t.column(key))
        reps = np.diff(np.append(starts, n))
        fv = vals.take(pa.array(np.repeat(starts, reps), type=pa.int64()))
        ends = np.append(starts[1:], n) - 1
        lv = vals.take(pa.array(np.repeat(ends, reps), type=pa.int64()))
        first_end = int(starts[1]) if len(starts) > 1 else n
        if f_carry is not None:
            m = np.zeros(n, dtype=bool)
            m[:first_end] = True
            fv = pc.if_else(pa.array(m), pa.scalar(f_carry[0], type=vt), fv)
        if b_carry is not None:
            m = np.zeros(n, dtype=bool)
            m[int(starts[-1]):] = True
            lv = pc.if_else(pa.array(m), pa.scalar(b_carry[0], type=vt), lv)
        cols = {c: t.column(c) for c in t.schema.names}
        cols[first_name] = fv
        cols[last_name] = lv
        return pa.table({c: cols[c] for c in out_cols})

    out_refs = [fl_block.remote(r, f, b)
                for r, f, b in zip(block_refs, fwd, bwd)]
    return rd.from_arrow_refs(out_refs)


def grouped_running_max(ds, key: str, order_cols: list, value_col: str,
                        out_name: str = "prev_max"):
    """Append ``out_name``: the EXCLUSIVE running int64 max of
    ``value_col`` within ``key`` ordered by ``order_cols`` — SQL
    ``MAX(v) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)``; each key's first row gets
    NULL.  The watermark primitive of late-data detection: with event
    time as the value and arrival order as the sort, ``v < prev_max``
    is exactly "arrived behind the watermark".

    Same carry-threading exchange as :func:`grouped_running_sum` (the
    fold is max instead of sum — still associative, one scalar carried
    per boundary run); per-run prefix maxes are numpy slices, never a
    Python loop over rows."""
    import ray
    import ray.data as rd

    _MIN = np.iinfo(np.int64).min
    schema = ds.schema()
    assert out_name not in schema.names
    out_cols = list(schema.names) + [out_name]
    types = dict(zip(schema.names, schema.types))
    types[out_name] = pa.int64()

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = nullsafe_sort(ds.repartition(n_part),
                        [key] + list(order_cols)).materialize()

    block_refs = srt.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(
            pa.table({c: pa.array([], type=types[c]) for c in out_cols}))

    @ray.remote
    def summarize(t: pa.Table):
        if t.num_rows == 0 or key not in t.schema.names:
            return None
        keys = t.column(key)
        vals = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = run_starts(keys)
        first_end = int(starts[1]) if len(starts) > 1 else t.num_rows
        last_start = int(starts[-1])
        return (keys[0].as_py(), keys[t.num_rows - 1].as_py(),
                int(vals[:first_end].max()), int(vals[last_start:].max()))

    summaries = ray.get([summarize.remote(r) for r in block_refs])

    def _same(a, b):
        return (a is None and b is None) or a == b

    carries = [_MIN] * len(summaries)
    for j, sj in enumerate(summaries):
        if sj is None:
            continue
        first_key = sj[0]
        acc = _MIN
        for i in range(j - 1, -1, -1):
            si = summaries[i]
            if si is None:
                continue
            i_first, i_last, i_first_max, i_last_max = si
            if not _same(i_last, first_key):
                break
            if _same(i_first, i_last):
                acc = max(acc, i_first_max)
                continue                 # run may extend further back
            acc = max(acc, i_last_max)
            break
        carries[j] = acc

    @ray.remote
    def scan_block(t: pa.Table, carry: int):
        if t.num_rows == 0 or key not in t.schema.names:
            return pa.table({c: pa.array([], type=types[c])
                             for c in out_cols})
        vals = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = run_starts(t.column(key))
        bounds = np.r_[starts, t.num_rows]
        prev = np.empty(t.num_rows, dtype=np.int64)
        for i in range(len(starts)):
            s, e = int(bounds[i]), int(bounds[i + 1])
            prev[s] = _MIN
            if e - s > 1:
                prev[s + 1:e] = np.maximum.accumulate(vals[s:e - 1])
        first_end = int(starts[1]) if len(starts) > 1 else t.num_rows
        prev[:first_end] = np.maximum(prev[:first_end], carry)
        cols = {c: t.column(c) for c in t.schema.names}
        # _MIN marks "no prior row" → SQL NULL
        cols[out_name] = pa.array(prev, type=pa.int64(),
                                  mask=(prev == _MIN))
        return pa.table({c: cols[c] for c in out_cols})

    out_refs = [scan_block.remote(r, c) for r, c in zip(block_refs, carries)]
    return rd.from_arrow_refs(out_refs)
