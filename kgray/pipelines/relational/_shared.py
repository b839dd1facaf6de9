"""Shared constants and private helpers for the relational pipeline
family modules (split from the former single-file module)."""

from __future__ import annotations
import math
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ...stages.aggregate import sorted_group_aggregate

_VALUE_BANDS = [("micro", 0.0, 10.0), ("small", 10.0, 50.0),
                ("mid", 50.0, 150.0), ("large", 150.0, 1e18)]

_VALUE_TIERS = [("over_10", 10.0, 1e18), ("over_50", 50.0, 1e18),
                ("over_150", 150.0, 1e18)]

PACK_KEY_MAX = 1 << 31          # a·2³² + b stays exact in SIGNED int64

# Poisson(1) inverse-CDF thresholds on a 2^40 grid (floor(cum·2^40) —
# exact integers, inlined identically in the SQL oracle)
_POIS_TH = (404487723187, 808975446375, 1011219307969,
            1078633928500, 1095487583633, 1098858314660)

_B_BOOT = 64

_M40 = 1 << 40

# Discrete-Laplace(α=e⁻¹) inverse-CDF thresholds on the 2^40 grid,
# support truncated to [-12, 12] (tail mass < 7e-6 folded into the
# extremes); floor(cum·2^40) — exact integers, inlined identically in
# the SQL oracle.
_DLAP_TH = (3121904, 11608119, 34676044, 97381167, 267831360,
            731163025, 1990629070, 5414212734, 14720477996,
            40017529749, 108782045841, 295703380377, 803808247398,
            990729581934, 1059494098026, 1084791149779, 1094097415041,
            1097520998705, 1098780464750, 1099243796415, 1099414246608,
            1099476951731, 1099500019656, 1099508505871)

_SEARCH_QUERIES = ("ring", "sma", "idget", "olt", "blue")

# (child_table, child_col, parent_table, parent_col) candidates probed
# by join_key_inference — a mix of true FKs and a noise pair.
_FK_CANDIDATES = [
    ("events", "user_id", "customer", "c_custkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("customer", "c_custkey", "events", "user_id"),
    ("events", "event_id", "orders", "o_orderkey"),
]

# (det_col, dep_col) functional-dependency candidates over events.
_FD_PAIRS = [("event_id", "user_id"),
             ("user_id", "event_type"),
             ("event_type", "user_id")]

_ATTRIB_ITERS = 16

_ATTRIB_UNIT = 10 ** 12


def _cents(col: pa.ChunkedArray) -> pa.Array:
    """floor(x*100 + 0.5) — one IEEE multiply+add+floor per element,
    mirrored literally in the SQL oracles, so both engines produce the
    same integer regardless of rounding-mode conventions."""
    return pc.cast(pc.floor(pc.add(pc.multiply(col, pa.scalar(100.0)),
                                   pa.scalar(0.5))), pa.int64())


def _orders_by_cust_date(sf_dir: str):
    return (rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey",
                                     "o_orderdate"])
            .map_batches(lambda b: pa.table({
                "o_custkey": b.column("o_custkey"),
                "o_orderkey": b.column("o_orderkey"),
                "date_us": pc.cast(b.column("o_orderdate"), pa.int64())}),
                batch_format="pyarrow", zero_copy_batch=True))


def _events_type_dow(sf_dir: str):
    """(event_type, dow, n_events, value_cents) prep: day-of-week via
    integer epoch-day arithmetic so both engines agree exactly
    (1970-01-01 was a Thursday → +4)."""
    def prep(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        dow = (us // 86_400_000_000 + 4) % 7
        return pa.table({
            "event_type": b.column("event_type"),
            "dow": pa.array(dow, type=pa.int64()),
            "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "value_cents": _cents(b.column("value"))})

    return (rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type", "value"])
            .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))


def _copurchase_pair_counts(sf_dir: str, wide: bool | None = None):
    """Co-purchase pair counts over orders — the shared front of
    :func:`part_copurchase_topk` and :func:`copurchase_triangles`.

    Instead of materializing the quadratic self-join, rows sort once on
    (orderkey, partkey) and each block expands only its COMPLETE runs
    into pair counts (order sizes are bounded — tens of lineitems — so
    per-run expansion is O(m²) with tiny m); boundary runs ship their
    raw rows (≤ 2 orders × m rows per block) through the standard
    edge/interior exchange.

    Key layout (r3 VERDICT #7): pairs pack as ``a·2³² + b`` so the
    global reduction is a single-key integer aggregate — EXACT only
    while every partkey < 2³¹ (above that ``a << 32`` overflows signed
    int64).  The bound is checked from the parquet column statistics
    (footer-only); at or beyond it the WIDE plan keeps the pair as a
    2×64-bit composite key (``part_a``, ``part_b``) through the same
    exchange — identical counts, pinned by
    ``tests/test_wide_key_pairs.py``.  ``wide=None`` auto-detects.
    """
    from collections import Counter as _Counter

    from ...stages._runs import edge_interior_exchange, edge_mask, run_starts

    if wide is None:
        pf = pq.ParquetFile(f"{sf_dir}/lineitem.parquet")
        ci = pf.schema_arrow.get_field_index("l_partkey")
        mx = 0
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(ci).statistics
            if st is None or st.max is None:       # no stats → be safe
                mx = PACK_KEY_MAX
                break
            mx = max(mx, int(st.max))
        wide = mx >= PACK_KEY_MAX

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    srt = li.sort(["l_orderkey", "l_partkey"])

    def _pair_counts(order_keys, part_keys) -> pa.Table:
        """(pair -> count) over contiguous equal-orderkey runs."""
        c = _Counter()
        starts = run_starts(order_keys)
        bounds = np.r_[starts, len(order_keys)]
        parts = part_keys.to_numpy(zero_copy_only=False)
        if not wide and len(parts) and int(parts.max()) >= PACK_KEY_MAX:
            raise ValueError(
                f"partkey >= 2^31 breaks the a·2^32+b packing; "
                f"use _copurchase_pair_counts(wide=True)")
        for i in range(len(starts)):
            run = parts[bounds[i]:bounds[i + 1]]
            m = len(run)
            for x in range(m - 1):
                a = run[x]
                for y in range(x + 1, m):
                    if run[y] != a:          # SQL: l1.partkey < l2.partkey
                        if wide:
                            c[(int(a), int(run[y]))] += 1
                        else:
                            c[(int(a) << 32) | int(run[y])] += 1
        if wide:
            return pa.table({
                "part_a": pa.array([k[0] for k in c], type=pa.int64()),
                "part_b": pa.array([k[1] for k in c], type=pa.int64()),
                "n_copurchase": pa.array(list(c.values()),
                                         type=pa.int64())})
        return pa.table({
            "pair": pa.array(list(c.keys()), type=pa.int64()),
            "n_copurchase": pa.array(list(c.values()), type=pa.int64())})

    def edge_fn(batch: pa.Table) -> pa.Table:
        return batch.filter(edge_mask(batch.column("l_orderkey")))

    def interior_fn(batch: pa.Table) -> pa.Table:
        interior = batch.filter(
            pc.invert(edge_mask(batch.column("l_orderkey"))))
        return _pair_counts(interior.column("l_orderkey"),
                            interior.column("l_partkey"))

    def merge_fn(edge_tables):
        t = pa.concat_tables(edge_tables)
        t = t.take(pc.sort_indices(t, sort_keys=[("l_orderkey", "ascending"),
                                                 ("l_partkey", "ascending")]))
        return _pair_counts(t.column("l_orderkey"), t.column("l_partkey"))

    pairs = edge_interior_exchange(srt, edge_fn, interior_fn, merge_fn)
    if wide:
        return sorted_group_aggregate(pairs, ["part_a", "part_b"],
                                      [("n_copurchase", "sum")],
                                      precombine=False)
    return sorted_group_aggregate(pairs, "pair",
                                  [("n_copurchase", "sum")],
                                  precombine=False)


def _unpack_pair(b: pa.Table) -> pa.Table:
    if "part_a" in b.schema.names:           # wide plan: already unpacked
        return b.select(["part_a", "part_b", "n_copurchase"])
    p = b.column("pair").to_numpy(zero_copy_only=False)
    return pa.table({
        "part_a": pa.array(p >> 32, type=pa.int64()),
        "part_b": pa.array(p & 0xFFFFFFFF, type=pa.int64()),
        "n_copurchase": b.column("n_copurchase")})


def _typed_users(sf_dir: str, event_type: str):
    def prep(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("event_type"), pa.scalar(event_type))
        m = pc.fill_null(m, False)
        return b.filter(m).select(["user_id"])
    return (rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
            .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))


def _funnel_depths(user, k, ts, n_stages: int):
    """Per-run funnel depth over arrays sorted by (user, ts): stage j's
    frontier = segmented min of type-j timestamps strictly greater than
    that row's stage-(j-1) frontier.  Fully vectorized (numpy
    reduceat); returns (run_start_indices, depth_per_run)."""
    from ...stages._runs import run_starts

    starts = run_starts(user)
    if starts.size == 0:
        return starts, np.zeros(0, dtype=np.int64)
    INF = np.iinfo(np.int64).max
    run_id = np.zeros(len(ts), dtype=np.int64)
    run_id[starts[1:]] = 1
    run_id = np.cumsum(run_id)
    depth = np.zeros(starts.size, dtype=np.int64)
    f_prev = np.full(starts.size, -1, dtype=np.int64)   # ts are >= 0
    for j in range(n_stages):
        cand = np.where((k == j) & (ts > f_prev[run_id]), ts, INF)
        f_j = np.minimum.reduceat(cand, starts)
        reached = f_j < INF
        depth += (reached & (depth == j)).astype(np.int64)
        f_prev = np.where(reached, f_j, INF)            # dead runs stay dead
    return starts, depth


def _skyline_2d(price: np.ndarray, date: np.ndarray):
    """Indices of the 2-D maxima (skyline) of (price, date): points not
    dominated (≥ in both, > in one) by any other.  O(m log m): sort by
    price desc; within an equal-price group only max-date points
    survive, and only if that date strictly beats every strictly-
    higher-price date seen so far.  Duplicate points co-survive."""
    order = np.lexsort((-date, -price))
    p, d = price[order], date[order]
    keep = np.zeros(len(p), dtype=bool)
    best = None                               # max date at higher price
    i = 0
    while i < len(p):
        j = i
        while j < len(p) and p[j] == p[i]:
            j += 1
        gmax = d[i]                           # group sorted date desc
        if best is None or gmax > best:
            k = i
            while k < j and d[k] == gmax:
                keep[k] = True
                k += 1
            best = gmax if best is None else max(best, gmax)
        i = j
    return order[keep]


def _burst_mask(c: np.ndarray, t: np.ndarray, s: np.ndarray,
                sxx: np.ndarray) -> np.ndarray:
    """Exact integer burst predicate ``(cT−S) > 0 AND (cT−S)² > 9(T·Sxx−S²)``
    with an overflow guard: the int64 fast path is exact only while the
    squared terms stay below 2^62 (float64 magnitude estimate, 2x
    margin); past that numpy would silently wrap (ADVICE r2), so fall
    back to exact Python ints — callers pass hourly-reduced rows
    (types × hours), so the slow path is output-sized."""
    if len(c) == 0:
        return np.zeros(0, dtype=bool)
    est = max(
        float(np.max(np.abs(c.astype(np.float64) * t
                            - s.astype(np.float64))) ** 2),
        float(9.0 * np.max(np.abs(t.astype(np.float64)
                                  * sxx.astype(np.float64)))),
        float(9.0 * np.max(s.astype(np.float64) ** 2)))
    if est < float(2 ** 62):
        dev = c * t - s
        var_t2 = t * sxx - s * s            # T²·σ², exact
        return (dev > 0) & (dev * dev > 9 * var_t2)
    return np.fromiter(
        ((int(ci) * int(ti) - int(si)) > 0
         and (int(ci) * int(ti) - int(si)) ** 2
         > 9 * (int(ti) * int(xi) - int(si) * int(si))
         for ci, ti, si, xi in zip(c, t, s, sxx)),
        dtype=bool, count=len(c))


def _md5_rank15(vals: np.ndarray) -> np.ndarray:
    """First 15 hex chars of md5(str(v)) as int64 (60 bits — sign-safe)
    — matches DuckDB ``CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1,
    15)) AS BIGINT)`` bitwise.  The deterministic "random" order every
    sampling op in the repo derives from."""
    import hashlib

    out = np.empty(len(vals), dtype=np.int64)
    for i, v in enumerate(vals):
        out[i] = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
    return out


def _canonical_url(url: str) -> str:
    """Canonical form: drop #fragment, lowercase scheme://host and
    strip a :443 default port, strip trailing slashes from the path,
    drop utm_* query params, sort the survivors.  Mirrored
    operand-for-operand by the DuckDB oracle expression."""
    import re as _re
    s = url.split("#", 1)[0]
    base, _, q = s.partition("?")
    m = _re.match(r"^[^/]+//[^/]+", base)
    pre = m.group(0) if m else ""
    rest = base[len(pre):]
    pre = pre.lower().replace(":443", "")
    rest = rest.rstrip("/")
    params = sorted(p for p in q.split("&")
                    if p and not p.startswith("utm_"))
    return pre + rest + ("?" + "&".join(params) if params else "")


def _dp_quantile_pick(sf_dir: str, q_num: int, q_den: int,
                      salt: bytes):
    """Shared exponential-mechanism quantile core: exact cents
    histogram → utility −|cum − n·q_num//q_den| → exact 2^u bigint
    weights → md5-128 inverse-CDF draw.  Returns (picked_cents, n,
    n_candidates)."""
    import hashlib

    hist = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_type", "value"]).map_batches(
            lambda b: (lambda t: pa.table({
                "cents": _cents(t.column("value")),
                "c": pa.array(np.ones(t.num_rows, dtype=np.int64))}))(
                b.filter(pc.equal(b.column("event_type"),
                                  pa.scalar("purchase")))),
            batch_format="pyarrow", zero_copy_batch=True),
        ["cents"], [("c", "sum")], precombine=True).take_all()

    vals = sorted((int(r["cents"]), int(r["c"])) for r in hist)
    n = sum(c for _, c in vals)
    target = n * q_num // q_den
    cum = 0
    weights = []
    for v, c in vals:
        cum += c
        u = -abs(cum - target)
        weights.append(1 << (u + 1024) if u > -1024 else 0)
    # (the +1024 shift cancels in the ratio r/T — pure scaling)
    T = sum(weights)
    M = int(hashlib.md5(salt).hexdigest(), 16)
    r = (M * T) >> 128
    acc = 0
    pick = vals[-1][0] if vals else 0
    for (v, _c), w in zip(vals, weights):
        acc += w
        if r < acc:
            pick = v
            break
    return pick, n, len(vals)


def _path_of(k: int) -> str:
    chain = [k]
    cur = k
    while cur >= 1:
        cur //= 4
        chain.append(cur)
    chain.reverse()
    return "/".join(str(x) for x in chain)


