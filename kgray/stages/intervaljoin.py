"""Large×large windowed pair join (stream-stream interval join).

``windowed_pair_join(left, right, key, window)`` emits one row per
(left row ℓ, right row r) with equal keys and
``ℓ.ts - window <= r.ts <= ℓ.ts`` — the ad-attribution / event-
correlation shape (each purchase paired with the same user's views in
the trailing hour).  Neither side is broadcast: a tagged union is
sorted on ``(key, ts)`` so every key's rows co-locate, complete key
runs pair IN-BLOCK with two ``searchsorted`` calls plus a vectorized
position explode (never a quadratic python loop), and the ≤2 boundary
runs per block ship rows to one driver merge (the standard sorted-run
exchange).

Scale notes: shuffle volume is the projected (key, ts, id) columns
only — payloads re-join downstream by id if needed.  Pair OUTPUT is
inherently Ω(matches); the window bounds it per left row, and a hot
key's output concentrates where its rows co-locate — same contract as
the LSH bucket pairing (`pipelines/dedup.py:_bucket_pairs`), whose
cap-style knob can front this stage when keys are adversarial.

No reference counterpart (the reference has no joins at all,
`SURVEY.md §2.5`); semantics oracled against a DuckDB BETWEEN join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ._runs import edge_interior_exchange, edge_mask, nullsafe_sort, run_starts

__all__ = ["windowed_pair_join"]

_EMPTY = {"left_id": pa.int64(), "right_id": pa.int64(),
          "key": pa.int64(), "lag": pa.int64()}


def _empty_out() -> pa.Table:
    return pa.table({n: pa.array([], type=t) for n, t in _EMPTY.items()})


def _pair_runs(t: pa.Table) -> pa.Table:
    """Pairs for COMPLETE key runs of a (key, ts)-sorted tagged table
    with columns (key, ts, id, side 0=right/1=left, win)."""
    if t.num_rows == 0:
        return _empty_out()
    keys = t.column("key")
    starts = run_starts(keys)
    bounds = np.r_[starts, t.num_rows]
    ts = t.column("ts").to_numpy(zero_copy_only=False)
    ids = t.column("id").to_numpy(zero_copy_only=False)
    side = t.column("side").to_numpy(zero_copy_only=False)
    win = int(t.column("win")[0].as_py())
    key_np = t.column("key").to_numpy(zero_copy_only=False)
    out_l, out_r, out_k, out_g = [], [], [], []
    for i in range(len(starts)):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        s = side[lo:hi]
        lmask = s == 1
        if not lmask.any() or lmask.all():
            continue
        Lt, Lid = ts[lo:hi][lmask], ids[lo:hi][lmask]
        Rt, Rid = ts[lo:hi][~lmask], ids[lo:hi][~lmask]
        a = np.searchsorted(Rt, Lt - win, side="left")
        b = np.searchsorted(Rt, Lt, side="right")
        cnt = b - a
        tot = int(cnt.sum())
        if tot == 0:
            continue
        li = np.repeat(np.arange(len(Lt)), cnt)
        rpos = (np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
                + np.repeat(a, cnt))
        out_l.append(Lid[li])
        out_r.append(Rid[rpos])
        out_k.append(np.full(tot, key_np[lo]))
        out_g.append(Lt[li] - Rt[rpos])
    if not out_l:
        return _empty_out()
    return pa.table({"left_id": pa.array(np.concatenate(out_l), type=pa.int64()),
                     "right_id": pa.array(np.concatenate(out_r), type=pa.int64()),
                     "key": pa.array(np.concatenate(out_k), type=pa.int64()),
                     "lag": pa.array(np.concatenate(out_g), type=pa.int64())})


def windowed_pair_join(left, right, key: str, ts: str, id_col: str,
                       window: int):
    """Pair every left row with the right rows of the same ``key``
    whose ``ts`` lies in ``[left.ts - window, left.ts]`` (inclusive).

    ``left`` / ``right``: Datasets holding at least (key, ts, id_col);
    ``ts`` must be int64 (epoch units of the caller's choosing) and
    ``window`` is in the same units.  Null keys never match (SQL).
    Output: (left_id, right_id, key, lag) with ``lag = left.ts -
    right.ts`` ∈ [0, window].
    """
    def tag(side_val: int):
        def fn(b: pa.Table) -> pa.Table:
            kc = b.column(key)
            keep = pc.invert(pc.is_null(kc))
            b = b.filter(keep)
            n = b.num_rows
            return pa.table({
                "key": pc.cast(b.column(key), pa.int64()),
                "ts": pc.cast(b.column(ts), pa.int64()),
                "id": pc.cast(b.column(id_col), pa.int64()),
                "side": pa.array(np.full(n, side_val, dtype=np.int8)),
                "win": pa.array(np.full(n, window, dtype=np.int64))})
        return fn

    tagged = (left.map_batches(tag(1), batch_format="pyarrow",
                               zero_copy_batch=True)
              .union(right.map_batches(tag(0), batch_format="pyarrow",
                                       zero_copy_batch=True)))
    srt = nullsafe_sort(tagged, ["key", "ts"])

    def edge_rows(b: pa.Table) -> pa.Table:
        return b.filter(edge_mask(b.column("key")))

    def interior(b: pa.Table) -> pa.Table:
        return _pair_runs(b.filter(pc.invert(edge_mask(b.column("key")))))

    def merge(edge_tables) -> pa.Table:
        et = pa.concat_tables(edge_tables, promote_options="permissive")
        idx = pc.sort_indices(et, sort_keys=[("key", "ascending"),
                                             ("ts", "ascending")])
        return _pair_runs(et.take(idx))

    return edge_interior_exchange(srt, edge_rows, interior, merge)
