"""Distributed rolling-window aggregate: the SQL frame
``... OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN k PRECEDING AND
CURRENT ROW)`` for SUM / COUNT / MIN / MAX / AVG in one pass.

Plan — the carry-in exchange (``stages/scan.py``), with a BOUNDED carry:

1. range-partition sort on ``(key, order_cols...)`` (callers include a
   unique tiebreak so the order is total, exactly like the SQL window);
2. per block ONE summary row: the boundary run's LAST ``min(k, run)``
   values (≤ k scalars — never rows; k is the frame size, typically
   single digits);
3. the driver threads carries along the sorted block order — a block's
   carry is the ≤ k values immediately preceding its first row within
   the same key, collected across as many earlier blocks as the run
   spans;
4. one task per block prepends its carry and resolves every row
   locally: frame sums/counts via one prefix-sum subtraction (exact
   int64), min/max per run via a sliding-window view (window ≤ k+1;
   the per-run Python loop is over RUNS, each run's kernel vectorized —
   runs per block = distinct keys per block, orders of magnitude below
   rows).

No input row ever leaves its block; the exchange cost is ≤ k scalars
per block.  ``value_col`` must be non-null int64 (same contract as
``grouped_running_sum``; convert money to cents first).  ``avg`` is the
single IEEE division ``sum / n`` — mirrored literally in the oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._runs import nullsafe_sort, run_starts

__all__ = ["grouped_rolling", "grouped_rolling_quantile"]


def grouped_rolling(ds, key: str, order_cols: list, value_col: str,
                    k: int, prefix: str = "roll"):
    """Append ``{prefix}_sum``, ``{prefix}_n``, ``{prefix}_min``,
    ``{prefix}_max`` (int64) and ``{prefix}_avg`` (float64) over the
    frame of each row's ``k`` preceding rows plus itself, within
    ``key`` ordered by ``order_cols``.  One output row per input row.
    """
    import ray
    import ray.data as rd

    assert k >= 0
    schema = ds.schema()
    new_cols = [f"{prefix}_{s}" for s in ("sum", "n", "min", "max", "avg")]
    for c in new_cols:
        assert c not in schema.names
    out_cols = list(schema.names) + new_cols
    types = dict(zip(schema.names, schema.types))
    for c in new_cols[:4]:
        types[c] = pa.int64()
    types[new_cols[4]] = pa.float64()

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = nullsafe_sort(ds.repartition(n_part),
                        [key] + list(order_cols)).materialize()

    block_refs = srt.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(
            pa.table({c: pa.array([], type=types[c]) for c in out_cols}))

    @ray.remote
    def summarize(t: pa.Table):
        """(first_key, last_key, single_run, tail) — tail = the last
        run's last min(k, run-rows-in-block) values."""
        if t.num_rows == 0:
            return None
        keys = t.column(key)
        vals = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = run_starts(keys)
        last_start = int(starts[-1])
        tail = vals[max(last_start, t.num_rows - k):] if k else \
            np.array([], dtype=np.int64)
        return (keys[0].as_py(), keys[t.num_rows - 1].as_py(),
                len(starts) == 1, tail)

    summaries = ray.get([summarize.remote(r) for r in block_refs])

    def _same(a, b):
        return (a is None and b is None) or a == b

    carries = []
    for j, sj in enumerate(summaries):
        if sj is None:
            carries.append(np.array([], dtype=np.int64))
            continue
        first_key = sj[0]
        parts = []                       # collected back-to-front
        need = k
        for i in range(j - 1, -1, -1):
            if need <= 0:
                break
            si = summaries[i]
            if si is None:
                continue
            if not _same(si[1], first_key):
                break
            tail = si[3][-need:] if need < len(si[3]) else si[3]
            parts.append(tail)
            need -= len(tail)
            if not si[2]:                # run starts inside block i
                break
        carries.append(np.concatenate(parts[::-1])
                       if parts else np.array([], dtype=np.int64))

    @ray.remote
    def roll_block(t: pa.Table, carry: np.ndarray):
        if t.num_rows == 0:
            return pa.table({c: pa.array([], type=types[c])
                             for c in out_cols})
        n = t.num_rows
        nc = len(carry)
        vals = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = np.concatenate([carry, vals]) if nc else vals
        starts = run_starts(t.column(key)).astype(np.int64)
        # extended coordinates: the first run starts at 0 (its carry
        # rows belong to it by construction), later runs shift by nc
        ext_starts = np.concatenate([[0], starts[1:] + nc]) if nc else starts

        m = len(v)
        idx = np.arange(m, dtype=np.int64)
        reps = np.diff(np.append(ext_starts, m))
        rs = np.repeat(ext_starts, reps)          # run start per row
        lo = np.maximum(idx - k, rs)
        S = np.concatenate([[0], np.cumsum(v)])
        fsum = S[idx + 1] - S[lo]
        fn = idx - lo + 1

        fmin = np.empty(m, dtype=np.int64)
        fmax = np.empty(m, dtype=np.int64)
        w = k + 1
        bounds = np.append(ext_starts, m)
        for r in range(len(ext_starts)):
            a, b = int(bounds[r]), int(bounds[r + 1])
            seg = v[a:b]
            if b - a <= w:
                fmin[a:b] = np.minimum.accumulate(seg)
                fmax[a:b] = np.maximum.accumulate(seg)
                continue
            fmin[a:a + w] = np.minimum.accumulate(seg[:w])
            fmax[a:a + w] = np.maximum.accumulate(seg[:w])
            sw = np.lib.stride_tricks.sliding_window_view(seg, w)
            fmin[a + w - 1:b] = sw.min(axis=1)
            fmax[a + w - 1:b] = sw.max(axis=1)

        sl = slice(nc, m)
        cols = {c: t.column(c) for c in t.schema.names}
        cols[new_cols[0]] = pa.array(fsum[sl], type=pa.int64())
        cols[new_cols[1]] = pa.array(fn[sl], type=pa.int64())
        cols[new_cols[2]] = pa.array(fmin[sl], type=pa.int64())
        cols[new_cols[3]] = pa.array(fmax[sl], type=pa.int64())
        cols[new_cols[4]] = pa.array(fsum[sl].astype(np.float64)
                                     / fn[sl].astype(np.float64),
                                     type=pa.float64())
        return pa.table({c: cols[c] for c in out_cols})

    out_refs = [roll_block.remote(r, c) for r, c in zip(block_refs, carries)]
    return rd.from_arrow_refs(out_refs)


def grouped_rolling_quantile(ds, key: str, order_cols: list,
                             value_col: str, k: int,
                             q_num: int = 1, q_den: int = 2,
                             out_col: str = "roll_med"):
    """Rolling ORDER STATISTIC over the same ``ROWS BETWEEN k PRECEDING
    AND CURRENT ROW`` frame: appends ``out_col`` = the frame's
    ``quantile_disc(q_num/q_den)`` value (the element at sorted index
    ``ceil(q·n) - 1`` — DuckDB's discrete-quantile rule, exact on
    int64, no interpolation).

    Same bounded exchange as :func:`grouped_rolling` (≤ k carry values
    per block).  The steady-state kernel is fully vectorized: one
    ``sliding_window_view`` + one ``np.sort(axis=1)`` + one column pick
    per run (O(n·k log k)); only the ≤ k warm-up rows per run pay a
    per-row partition.
    """
    import math

    import ray
    import ray.data as rd

    assert k >= 0 and 0 < q_num <= q_den
    schema = ds.schema()
    assert out_col not in schema.names
    out_cols = list(schema.names) + [out_col]
    types = dict(zip(schema.names, schema.types))
    types[out_col] = pa.int64()

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = nullsafe_sort(ds.repartition(n_part),
                        [key] + list(order_cols)).materialize()
    block_refs = srt.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(
            pa.table({c: pa.array([], type=types[c]) for c in out_cols}))

    @ray.remote
    def summarize(t: pa.Table):
        if t.num_rows == 0:
            return None
        keys = t.column(key)
        vals = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = run_starts(keys)
        last_start = int(starts[-1])
        tail = vals[max(last_start, t.num_rows - k):] if k else \
            np.array([], dtype=np.int64)
        return (keys[0].as_py(), keys[t.num_rows - 1].as_py(),
                len(starts) == 1, tail)

    summaries = ray.get([summarize.remote(r) for r in block_refs])

    def _same(a, b):
        return (a is None and b is None) or a == b

    carries = []
    for j, sj in enumerate(summaries):
        if sj is None:
            carries.append(np.array([], dtype=np.int64))
            continue
        first_key = sj[0]
        parts, need = [], k
        for i in range(j - 1, -1, -1):
            if need <= 0:
                break
            si = summaries[i]
            if si is None:
                continue
            if not _same(si[1], first_key):
                break
            tail = si[3][-need:] if need < len(si[3]) else si[3]
            parts.append(tail)
            need -= len(tail)
            if not si[2]:
                break
        carries.append(np.concatenate(parts[::-1])
                       if parts else np.array([], dtype=np.int64))

    def _qidx(n: int) -> int:
        return -(-(q_num * n) // q_den) - 1          # ceil(q*n) - 1

    @ray.remote
    def roll_block(t: pa.Table, carry: np.ndarray):
        if t.num_rows == 0:
            return pa.table({c: pa.array([], type=types[c])
                             for c in out_cols})
        nc = len(carry)
        vals = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = np.concatenate([carry, vals]) if nc else vals
        starts = run_starts(t.column(key)).astype(np.int64)
        ext_starts = np.concatenate([[0], starts[1:] + nc]) if nc else starts
        m = len(v)
        w = k + 1
        med = np.empty(m, dtype=np.int64)
        bounds = np.append(ext_starts, m)
        for r in range(len(ext_starts)):
            a, b = int(bounds[r]), int(bounds[r + 1])
            seg = v[a:b]
            warm = min(w - 1, b - a)
            for i in range(warm):                     # expanding frames
                fr = np.sort(seg[:i + 1])
                med[a + i] = fr[_qidx(i + 1)]
            if b - a >= w:
                sw = np.sort(
                    np.lib.stride_tricks.sliding_window_view(seg, w),
                    axis=1)
                med[a + w - 1:b] = sw[:, _qidx(w)]
        sl = slice(nc, m)
        cols = {c: t.column(c) for c in t.schema.names}
        cols[out_col] = pa.array(med[sl], type=pa.int64())
        return pa.table({c: cols[c] for c in out_cols})

    out_refs = [roll_block.remote(r, c) for r, c in zip(block_refs, carries)]
    return rd.from_arrow_refs(out_refs)
