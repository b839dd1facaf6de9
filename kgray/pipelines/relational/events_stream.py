"""Event-stream shapes: hourly/windowed/watermark aggregates, as-of and interval joins against orders, sessionization-adjacent rollups, pagination.

Split from the former single-file relational pipeline module; see
``kgray/pipelines/relational/__init__.py`` for the package map.
"""

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

from ._shared import (  # noqa: F401
    _burst_mask,
    _cents,
    _events_type_dow,
)


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event type: count + value cents sum.
    The window key is the integer epoch-hour so engines agree exactly."""
    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())       # µs since epoch
        hour = pc.divide(ts, pa.scalar(3_600_000_000, type=pa.int64()))
        return pa.table({
            "event_type": batch.column("event_type"),
            "epoch_hour": pc.cast(hour, pa.int64()),
            "n_events": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "value_cents": _cents(batch.column("value")),
        })

    prepped = (rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])
               .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))
    return sorted_group_aggregate(prepped, ["event_type", "epoch_hour"],
                                  [("n_events", "sum"), ("value_cents", "sum")])


def events_hopping(sf_dir: str, window_hours: int = 3):
    """Hopping-window aggregate (window = ``window_hours`` h, hop = 1 h):
    each event contributes to every hourly-anchored window covering it
    (``window_hour`` = the window's start hour; an event at hour h
    falls in windows starting h-L+1 .. h).  Vectorized explode (Arrow
    ``take`` with a repeated index — no row loop), then the same
    partial-aggregate + groupby as the tumbling path; rows leaving each
    map task ≈ distinct (type, window) per batch, not ×window_hours."""
    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())
        hour = pc.cast(pc.divide(ts, pa.scalar(3_600_000_000, type=pa.int64())),
                       pa.int64()).to_numpy(zero_copy_only=False)
        cents = _cents(batch.column("value")).to_numpy(zero_copy_only=False)
        n = len(hour)
        idx = np.repeat(np.arange(n, dtype=np.int64), window_hours)
        off = np.tile(np.arange(window_hours, dtype=np.int64), n)
        exploded = pa.table({
            "event_type": batch.column("event_type").take(pa.array(idx)),
            "window_hour": pa.array(hour[idx] - off, type=pa.int64()),
            "n_events": pa.array(np.ones(n * window_hours, dtype=np.int64)),
            "value_cents": pa.array(cents[idx], type=pa.int64()),
        })
        # map-side combine before the shuffle
        g = exploded.group_by(["event_type", "window_hour"],
                              use_threads=False).aggregate(
            [("n_events", "sum"), ("value_cents", "sum")])
        return pa.table({"event_type": g.column("event_type"),
                         "window_hour": g.column("window_hour"),
                         "n_events": g.column("n_events_sum"),
                         "value_cents": g.column("value_cents_sum")})

    prepped = (rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])
               .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))
    return sorted_group_aggregate(prepped, ["event_type", "window_hour"],
                                  [("n_events", "sum"), ("value_cents", "sum")])


def events_asof_orders(sf_dir: str):
    """Distributed backward as-of join: each event matched to the most
    recent order of the same customer (user_id = o_custkey) at or
    before the event time — ``stages/asof.py`` (sort-co-located
    per-run ``searchsorted``, edge keys through a driver pass).

    The right side is pre-reduced to one row per (custkey, orderdate)
    keeping the max orderkey, so ties at the matched time are
    deterministic in both engines (the SQL oracle mirrors this)."""
    from ...stages.asof import asof_join

    events = (rd.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["event_id", "ts", "user_id"])
              .map_batches(lambda b: pa.table({
                  "user_id": b.column("user_id"),
                  "event_id": b.column("event_id"),
                  "ev_us": pc.cast(b.column("ts"), pa.int64())}),
                  batch_format="pyarrow", zero_copy_batch=True))
    orders = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey", "o_orderdate"])
              .map_batches(lambda b: pa.table({
                  "user_id": b.column("o_custkey"),
                  "ord_us": pc.cast(b.column("o_orderdate"), pa.int64()),
                  "o_orderkey": b.column("o_orderkey")}),
                  batch_format="pyarrow", zero_copy_batch=True))
    orders_1 = sorted_group_aggregate(orders, ["user_id", "ord_us"],
                                      [("o_orderkey", "max")])
    return asof_join(events, orders_1, key="user_id",
                     left_t="ev_us", right_t="ord_us")


def events_recent_orders(sf_dir: str, days: int = 30):
    """Trailing-window interval join (``stages/asof.py:
    windowed_count_join``): per event, how many orders the same
    customer placed in the preceding ``days`` (inclusive) — the
    attribution-window shape, aggregated in the operator so the output
    stays one row per event."""
    from ...stages.asof import windowed_count_join

    events = (rd.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["event_id", "ts", "user_id"])
              .map_batches(lambda b: pa.table({
                  "user_id": b.column("user_id"),
                  "event_id": b.column("event_id"),
                  "ev_us": pc.cast(b.column("ts"), pa.int64())}),
                  batch_format="pyarrow", zero_copy_batch=True))
    orders = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderdate"])
              .map_batches(lambda b: pa.table({
                  "user_id": b.column("o_custkey"),
                  "ord_us": pc.cast(b.column("o_orderdate"), pa.int64())}),
                  batch_format="pyarrow", zero_copy_batch=True))
    window_us = days * 86_400 * 1_000_000
    return windowed_count_join(events, orders, key="user_id",
                               left_t="ev_us", right_t="ord_us",
                               window=window_us,
                               count_name="n_recent_orders")


def events_recent_order_value(sf_dir: str, days: int = 30):
    """Trailing-window interval join with a windowed SUM: per event,
    the count AND total value (integer cents) of the same customer's
    orders in the preceding ``days`` — the windowed-aggregate shape
    (``COALESCE(SUM(...), 0)`` over a BETWEEN join in SQL), computed
    with per-run prefix sums instead of pair materialization."""
    from ...stages.asof import windowed_count_join

    events = (rd.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["event_id", "ts", "user_id"])
              .map_batches(lambda b: pa.table({
                  "user_id": b.column("user_id"),
                  "event_id": b.column("event_id"),
                  "ev_us": pc.cast(b.column("ts"), pa.int64())}),
                  batch_format="pyarrow", zero_copy_batch=True))
    orders = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderdate",
                                       "o_totalprice"])
              .map_batches(lambda b: pa.table({
                  "user_id": b.column("o_custkey"),
                  "ord_us": pc.cast(b.column("o_orderdate"), pa.int64()),
                  "total_cents": _cents(b.column("o_totalprice"))}),
                  batch_format="pyarrow", zero_copy_batch=True))
    window_us = days * 86_400 * 1_000_000
    return windowed_count_join(events, orders, key="user_id",
                               left_t="ev_us", right_t="ord_us",
                               window=window_us,
                               count_name="n_recent_orders",
                               value_col="total_cents",
                               sum_name="recent_cents")


def events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, epoch_day): subtotals at every key
    prefix plus the grand total — ``stages/aggregate.py:
    rollup_aggregate`` (finest level distributed, coarser levels
    re-aggregate the reduced output)."""
    from ...stages.aggregate import rollup_aggregate

    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())
        day = pc.divide(ts, pa.scalar(86_400_000_000, type=pa.int64()))
        return pa.table({
            "event_type": batch.column("event_type"),
            "epoch_day": pc.cast(day, pa.int64()),
            "n_events": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "value_cents": _cents(batch.column("value")),
        })

    prepped = (rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])
               .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))
    return rollup_aggregate(prepped, ["event_type", "epoch_day"],
                            [("n_events", "sum"), ("value_cents", "sum")])


def events_orders_daily(sf_dir: str):
    """Full-outer join demo: daily event counts ⋈ daily order counts on
    the epoch day — days present on either side survive (counts
    zero-filled, COALESCE in the oracle).  Both inputs are pre-reduced
    with ``sorted_group_aggregate`` so the join sees one row per day
    per side."""
    from ...stages.join import sorted_merge_join

    ev = (rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
          .map_batches(lambda b: pa.table({
              "epoch_day": pc.cast(pc.divide(pc.cast(b.column("ts"), pa.int64()),
                                             pa.scalar(86_400_000_000, type=pa.int64())),
                                   pa.int64()),
              "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
              batch_format="pyarrow", zero_copy_batch=True))
    ev_daily = sorted_group_aggregate(ev, "epoch_day", [("n_events", "sum")])

    od = (rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate"])
          .map_batches(lambda b: pa.table({
              "epoch_day": pc.cast(pc.divide(pc.cast(b.column("o_orderdate"), pa.int64()),
                                             pa.scalar(86_400_000_000, type=pa.int64())),
                                   pa.int64()),
              "n_orders": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
              batch_format="pyarrow", zero_copy_batch=True))
    od_daily = sorted_group_aggregate(od, "epoch_day", [("n_orders", "sum")])

    joined = sorted_merge_join(ev_daily, od_daily, on="epoch_day", how="outer")
    return joined.map_batches(lambda b: pa.table({
        "epoch_day": b.column("epoch_day"),
        "n_events": pc.fill_null(b.column("n_events"), 0),
        "n_orders": pc.fill_null(b.column("n_orders"), 0)}),
        batch_format="pyarrow", zero_copy_batch=True)


def events_cube(sf_dir: str):
    """GROUP BY CUBE(event_type, dow) — all four grouping sets
    (``stages/aggregate.py:cube_aggregate``: input aggregated once at
    the finest grain, coarser sets fold the reduced output)."""
    from ...stages.aggregate import cube_aggregate

    return cube_aggregate(_events_type_dow(sf_dir), ["event_type", "dow"],
                          [("n_events", "sum"), ("value_cents", "sum")])


def events_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((event_type), (dow)) — the two marginal
    aggregates only, no finest level and no grand total in the output."""
    from ...stages.aggregate import grouping_sets_aggregate

    return grouping_sets_aggregate(
        _events_type_dow(sf_dir), ["event_type", "dow"],
        [("n_events", "sum"), ("value_cents", "sum")],
        sets=[["event_type"], ["dow"]])


def event_user_distinct_hll(sf_dir: str, p: int = 12):
    """Approximate per-event-type distinct users via HyperLogLog
    (``stages/sketch.py``): fixed 2^p-register partials per
    (block, type), merged by elementwise max — deterministic, so the
    committed fixture is an exact oracle; accuracy vs the exact
    distinct count is pinned in tests (type_user_counts is the exact
    twin of this query)."""
    from ...stages.sketch import hll_group_distinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return hll_group_distinct(ev, "event_type", "user_id", p=p)


def events_hash_sample(sf_dir: str, rate_permille: int = 50):
    """Deterministic ~5% Bernoulli sample of events keyed on md5 of the
    event id (``functions/sampling.py``) — identical across runs,
    retries, partitionings and engines; streams with no shuffle."""
    from ...functions.sampling import hash_sample

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type"])
    return hash_sample(ev, "event_id", rate_permille)


def events_hourly_dense(sf_dir: str):
    """Gap-filled time series: the tumbling hourly count per event
    type, DENSIFIED to every hour between the global min and max —
    missing (type, hour) cells become explicit zeros (the
    ``generate_series`` + LEFT JOIN + COALESCE shape; downstream
    trend/seasonality models need the zeros).

    The heavy side (raw events) streams through one combined count
    aggregate; the dense frame is hours×types — output-sized by
    definition — built as a Dataset and filled via one broadcast join
    of the (equally reduced) sparse counts."""
    from ...stages.broadcast import broadcast_join

    def prep(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())
        hour = pc.divide(ts, pa.scalar(3_600_000_000, type=pa.int64()))
        return pa.table({
            "event_type": batch.column("event_type"),
            "epoch_hour": pc.cast(hour, pa.int64()),
            "n_events": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    prepped = (rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])
               .map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True))
    sparse_ds = sorted_group_aggregate(prepped, ["event_type", "epoch_hour"],
                                       [("n_events", "sum")])
    # the aggregate output is (types × active hours) — output-sized;
    # collecting it to build the dense frame is collecting the result
    sparse = pa.Table.from_pandas(sparse_ds.to_pandas(),
                                  preserve_index=False)
    types = sorted(set(sparse.column("event_type").to_pylist()))
    hours = sparse.column("epoch_hour").to_numpy(zero_copy_only=False)
    lo, hi = int(hours.min()), int(hours.max())
    n_hours = hi - lo + 1
    t_idx = {t: i for i, t in enumerate(types)}
    all_hours = np.tile(np.arange(lo, hi + 1, dtype=np.int64), len(types))
    all_types = np.repeat(np.arange(len(types), dtype=np.int64), n_hours)
    dense = pa.table({
        "event_type": pa.array([types[i] for i in all_types],
                               type=pa.string()),
        "epoch_hour": pa.array(all_hours),
        "__k": pa.array(all_types * (2 ** 40) + all_hours)})
    s_types = np.array([t_idx[t] for t in
                        sparse.column("event_type").to_pylist()],
                       dtype=np.int64)
    dim = pa.table({"__k": pa.array(s_types * (2 ** 40) + hours),
                    "n_events": sparse.column("n_events")})
    filled = broadcast_join(rd.from_arrow(dense), dim, on="__k", how="left")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b.column("event_type"),
            "epoch_hour": b.column("epoch_hour"),
            "n_events": pc.fill_null(b.column("n_events"),
                                     pa.scalar(0, type=pa.int64()))})

    return filled.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def events_hourly_incremental(sf_dir: str, delta_permille: int = 100):
    """Incremental view maintenance: an md5-selected ~10% of events
    plays the 'newly arrived batch'; the maintained hourly aggregate is
    the BASE aggregate (old data, aggregated once and in production
    never rescanned) merged with the DELTA batch's aggregate — a plain
    groupby-sum over the two partial tables, valid because every
    aggregate in this engine is a mergeable partial.  The oracle is the
    full recompute over all events: merge(base, delta) == full is
    exactly the law incremental maintenance relies on, here enforced
    bitwise by the gate."""
    from ...functions.sampling import _md5_bucket

    def prep(batch: pa.Table, want_delta: bool) -> pa.Table:
        sel = _md5_bucket(batch.column("event_id").to_pylist(),
                          1000) < delta_permille
        b = batch.filter(pa.array(sel if want_delta else ~sel))
        ts = pc.cast(b.column("ts"), pa.int64())
        hour = pc.divide(ts, pa.scalar(3_600_000_000, type=pa.int64()))
        return pa.table({
            "event_type": b.column("event_type"),
            "epoch_hour": pc.cast(hour, pa.int64()),
            "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "value_cents": _cents(b.column("value"))})

    def scan():
        return rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "event_type",
                                        "value"])

    base = sorted_group_aggregate(
        scan().map_batches(lambda b: prep(b, False),
                           batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "epoch_hour"],
        [("n_events", "sum"), ("value_cents", "sum")])
    delta = sorted_group_aggregate(
        scan().map_batches(lambda b: prep(b, True),
                           batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "epoch_hour"],
        [("n_events", "sum"), ("value_cents", "sum")])
    # the maintenance step itself: merge two partial aggregates — the
    # base is touched only at this (already reduced) grain
    return sorted_group_aggregate(
        base.union(delta), ["event_type", "epoch_hour"],
        [("n_events", "sum"), ("value_cents", "sum")], precombine=False)


def events_ctr_wilson(sf_dir: str, z: float = 1.96,
                      success_cents: int = 25000):
    """Per-type success-rate estimate with a Wilson-score lower bound —
    the statistically-honest way to rank segments by conversion when
    sample sizes differ.  Counts are exact distributed integers; the
    Wilson expression is evaluated ONCE per reduced row, mirrored
    operand-for-operand in SQL (sqrt is IEEE-correctly-rounded on both
    engines, verified bitwise)."""
    def prep(b: pa.Table) -> pa.Table:
        vc = _cents(b.column("value"))
        return pa.table({
            "event_type": b.column("event_type"),
            "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "k": pc.cast(pc.greater(vc, pa.scalar(success_cents,
                                                  type=pa.int64())),
                         pa.int64())})

    agg = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_type", "value"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "event_type", [("n", "sum"), ("k", "sum")])

    def wilson(b: pa.Table) -> pa.Table:
        import math
        n = b.column("n").to_pylist()
        k = b.column("k").to_pylist()
        rate, lo = [], []
        for ni, ki in zip(n, k):
            p = ki / ni
            denom = 1.0 + z * z / ni
            center = p + z * z / (2.0 * ni)
            rad = z * math.sqrt(p * (1.0 - p) / ni
                                + z * z / (4.0 * ni * ni))
            rate.append(p)
            lo.append((center - rad) / denom)
        return pa.table({
            "event_type": b.column("event_type"),
            "n": b.column("n"), "k": b.column("k"),
            "rate": pa.array(rate, type=pa.float64()),
            "wilson_lo": pa.array(lo, type=pa.float64())})

    return agg.map_batches(wilson, batch_format="pyarrow",
                           zero_copy_batch=True)


def events_hourly_bursts(sf_dir: str):
    """Burst (anomaly) detection over each type's hourly series with
    ZERO floating point: hour h bursts when
    ``count > mean + 3σ``, algebraically rearranged to the exact
    integer predicate ``(c·T − S) > 0 AND (c·T − S)² > 9·(T·Sxx − S²)``
    (T = hours in the series, S = Σc, Sxx = Σc²) — no sqrt, no
    division, no rounding mode to disagree on.  Two reduced aggregates
    (hourly counts, then per-type moments over ≤ hours rows) and one
    broadcast join; the raw stream is scanned once."""
    from ...stages.broadcast import broadcast_join

    def prep(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("ts"), pa.int64())
        hour = pc.divide(ts, pa.scalar(3_600_000_000, type=pa.int64()))
        return pa.table({
            "event_type": b.column("event_type"),
            "epoch_hour": pc.cast(hour, pa.int64()),
            "c": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    hourly = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["ts", "event_type"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "epoch_hour"], [("c", "sum")]).materialize()

    def moments(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b.column("event_type"),
            "t_hours": pa.array(np.ones(len(c), dtype=np.int64)),
            "s": pa.array(c), "sxx": pa.array(c * c)})

    mom = sorted_group_aggregate(
        hourly.map_batches(moments, batch_format="pyarrow",
                           zero_copy_batch=True),
        "event_type",
        [("t_hours", "sum"), ("s", "sum"), ("sxx", "sum")]).to_pandas()
    mom_tbl = pa.Table.from_pandas(mom, preserve_index=False)

    joined = broadcast_join(hourly, mom_tbl, on="event_type")

    def flag(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False)
        t = b.column("t_hours").to_numpy(zero_copy_only=False)
        s = b.column("s").to_numpy(zero_copy_only=False)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False)
        k = b.filter(pa.array(_burst_mask(c, t, s, sxx)))
        return pa.table({
            "event_type": k.column("event_type"),
            "epoch_hour": k.column("epoch_hour"),
            "c": k.column("c")})

    return joined.map_batches(flag, batch_format="pyarrow",
                              zero_copy_batch=True)


def events_keyset_page(sf_dir: str, after_us: int = 1_705_000_000_000_000,
                       after_id: int = -1, page_size: int = 200):
    """Keyset (cursor) pagination — the scalable alternative to
    OFFSET: rows strictly after the cursor ``(ts, event_id)`` in the
    total order, first ``page_size``.  The tuple comparison is one
    vectorized mask per batch (pushdown-friendly: at scale the ts
    bound also prunes row groups); only matching rows enter the sort,
    and the limit keeps the output page-sized."""
    def keyset(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("ts"), pa.int64())
        eid = b.column("event_id")
        gt = pc.greater(ts, pa.scalar(after_us, type=pa.int64()))
        eq = pc.equal(ts, pa.scalar(after_us, type=pa.int64()))
        tie = pc.and_(eq, pc.greater(eid, pa.scalar(after_id,
                                                    type=pa.int64())))
        mask = pc.fill_null(pc.or_(gt, tie), False)
        k = b.filter(mask)
        return pa.table({
            "ev_us": pc.cast(k.column("ts"), pa.int64()),
            "event_id": k.column("event_id"),
            "user_id": k.column("user_id"),
            "event_type": k.column("event_type")})

    return (rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_id", "user_id",
                                     "event_type"])
            .map_batches(keyset, batch_format="pyarrow",
                         zero_copy_batch=True)
            .sort(["ev_us", "event_id"]).limit(page_size))


def events_out_of_order(sf_dir: str, jitter: int = 200):
    """Late-data detection (the watermark primitive of a streaming
    ingest): per user, an event is LATE when its event time precedes
    the maximum event time among the user's earlier ARRIVALS.  The
    synthetic stream is generated perfectly time-ordered (0 late rows
    — verified), so the arrival sequence simulates a bounded-jitter
    ingest deterministically: ``arr = event_id + md5(event_id) %
    jitter`` (ties broken by event_id) — the md5-derived reorder is a
    pure function of the data, identical across runs and engines, and
    bounded by ``jitter`` positions, exactly the disorder a watermark
    with bounded lateness is designed for.

    One ``grouped_running_max`` exchange (exclusive prefix max, one
    carried scalar per boundary run); output is only the late rows
    with their watermark and lateness, exact int64 µs."""
    from ...functions.sampling import _md5_bucket
    from ...stages.scan import grouped_running_max

    def prep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "event_id": pa.array([], type=pa.int64()),
                             "arr": pa.array([], type=pa.int64()),
                             "ts_us": pa.array([], type=pa.int64())})
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        j = _md5_bucket(eid.tolist(), jitter)
        return pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "arr": pa.array(eid + j, type=pa.int64()),
            "ts_us": pc.cast(b.column("ts"), pa.int64())})

    ev = (rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["user_id", "event_id", "ts"])
          .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))
    wm = grouped_running_max(ev, "user_id", ["arr", "event_id"], "ts_us",
                             out_name="wm_us")

    def late(b: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.less(b.column("ts_us"), b.column("wm_us")),
                         False)
        t = b.filter(m)
        return pa.table({
            "user_id": t.column("user_id"),
            "event_id": t.column("event_id"),
            "ts_us": t.column("ts_us"),
            "wm_us": t.column("wm_us"),
            "late_us": pc.subtract_checked(t.column("wm_us"),
                                           t.column("ts_us"))})

    return wm.map_batches(late, batch_format="pyarrow",
                          zero_copy_batch=True)


def events_user_time_rect(sf_dir: str, user_lo: int = 30, user_hi: int = 59,
                          ts_lo: str = "2024-01-10",
                          ts_hi: str = "2024-01-17"):
    """Rectangle query over the event stream — (user band × time band)
    — served from a Z-ORDER layout: events are laid out once sorted by
    the morton interleave of (user_id, ts_us), so every file's footer
    min/max is tight on BOTH dimensions and the rectangle prunes at
    file granularity in each (``stages/layout.py:write_zorder_layout``;
    the prune is asserted by test, and a plain single-column range
    layout demonstrably cannot prune the second dimension).  Same
    atomic-rename + content-fingerprint cache discipline as
    ``orders_price_band``.  Output: exact event count + value cents
    sum over the rectangle."""
    import hashlib
    import os
    import shutil

    from ...stages.layout import read_zrect, write_zorder_layout

    src_path = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src_path)
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}"
        .encode()).hexdigest()[:10]
    out = f"/tmp/kgray_zorder/events_{tag}"
    if not os.path.exists(os.path.join(out, "_DONE")):
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        src = (rd.read_parquet(src_path,
                               columns=["event_id", "user_id", "ts",
                                        "value"])
               .map_batches(lambda b: pa.table({
                   "event_id": b.column("event_id"),
                   "user_id": b.column("user_id"),
                   "ts_us": pc.cast(b.column("ts"), pa.int64()),
                   "value_cents": _cents(b.column("value"))}),
                   batch_format="pyarrow", zero_copy_batch=True)
               .repartition(16))
        write_zorder_layout(src, ["user_id", "ts_us"], tmp)
        with open(os.path.join(tmp, "_DONE"), "w") as f:
            f.write("ok\n")
        shutil.rmtree(out, ignore_errors=True)
        os.rename(tmp, out)

    lo_us = int(pd.Timestamp(ts_lo).value // 1000)
    hi_us = int(pd.Timestamp(ts_hi).value // 1000) - 1   # closed band
    rect = read_zrect(out, {"user_id": (user_lo, user_hi),
                            "ts_us": (lo_us, hi_us)})

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_events": pa.array([b.num_rows], type=pa.int64()),
            "sum_value_cents": pa.array(
                [pc.sum(b.column("value_cents")).as_py() or 0],
                type=pa.int64())})

    parts = rect.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    return pa.table({
        "n_events": pa.array([sum(r["n_events"] for r in parts)],
                             type=pa.int64()),
        "sum_value_cents": pa.array(
            [sum(r["sum_value_cents"] for r in parts)],
            type=pa.int64())})


def events_orders_join_profile(sf_dir: str, k: int = 10):
    """Join-size profile (optimizer statistics): the EXACT output
    cardinality of ``events ⋈ orders ON user_id = o_custkey`` computed
    WITHOUT running the join — ``|A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k)`` over
    the two key-count tables (each pre-reduced, key-sized) — plus the
    ``k`` heaviest keys by contribution.  This is how a planner decides
    broadcast-vs-shuffle and detects skew BEFORE paying the exchange:
    the profile costs two aggregates and one key-sized join, never the
    fact×fact output.  Ties break on the key; all integer."""
    from ...stages.join import sorted_merge_join
    from ...stages.topk import global_topk

    ev = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(lambda b: pa.table({
            "key": b.column("user_id"),
            "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["key"], [("n_events", "sum")], precombine=True)
    od = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(lambda b: pa.table({
            "key": b.column("o_custkey"),
            "n_orders": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["key"], [("n_orders", "sum")], precombine=True)

    prod = sorted_merge_join(ev, od, on="key").map_batches(
        lambda b: pa.table({
            "key": b.column("key"),
            "n_events": b.column("n_events"),
            "n_orders": b.column("n_orders"),
            "join_rows": pc.multiply(b.column("n_events"),
                                     b.column("n_orders"))}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    total = prod.sum("join_rows") or 0
    top = global_topk(prod, [("join_rows", "descending"),
                             ("key", "ascending")], k)
    n = top.num_rows
    return top.append_column(
        "total_join_rows", pa.array([total] * n, type=pa.int64()))


def events_watermark_hourly(sf_dir: str, jitter: int = 200,
                            allowed_us: int = 3_600_000_000):
    """Watermark-gated hourly aggregation — what a streaming engine
    actually DOES with late data (``events_out_of_order`` only detects
    it): under the same deterministic md5-jittered arrival order, a
    row is ACCEPTED iff its event time is no more than ``allowed_us``
    behind the user's watermark (the exclusive prefix max of event
    time in arrival order); survivors aggregate into per-(type, hour)
    counts and cents.  One ``grouped_running_max`` exchange + one
    mergeable aggregate; the drop rule is pure int64 comparison."""
    from ...functions.sampling import _md5_bucket
    from ...stages.scan import grouped_running_max

    def prep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "event_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "arr": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
                "ts_us": pa.array([], type=pa.int64())})
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        j = _md5_bucket(eid.tolist(), jitter)
        return pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
            "arr": pa.array(eid + j, type=pa.int64()),
            "cents": _cents(b.column("value")),
            "ts_us": pc.cast(b.column("ts"), pa.int64())})

    ev = (rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["user_id", "event_id", "event_type",
                                   "value", "ts"])
          .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))
    wm = grouped_running_max(ev, "user_id", ["arr", "event_id"], "ts_us",
                             out_name="wm_us")

    def accept(b: pa.Table, _w=allowed_us) -> pa.Table:
        late = pc.fill_null(pc.less(
            b.column("ts_us"),
            pc.subtract_checked(b.column("wm_us"),
                                pa.scalar(_w, type=pa.int64()))), False)
        t = b.filter(pc.invert(late))
        hour = pc.divide(t.column("ts_us"),
                         pa.scalar(3_600_000_000, type=pa.int64()))
        return pa.table({
            "event_type": t.column("event_type"),
            "epoch_hour": pc.cast(hour, pa.int64()),
            "n_events": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "value_cents": t.column("cents")})

    return sorted_group_aggregate(
        wm.map_batches(accept, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type", "epoch_hour"],
        [("n_events", "sum"), ("value_cents", "sum")], precombine=True)


def event_sequence_patterns(sf_dir: str):
    """Sequential pattern mining at the 2-sequence level: for every
    ordered type pair (a, b), how many users did a BEFORE b (some
    occurrence of a precedes some occurrence of b — equivalently
    ``min_ts(a) < max_ts(b)``, so the whole mine reduces to one
    (user, type) MIN/MAX aggregate + a user-keyed self-join of a
    ≤k-rows-per-user table).  The support table behind 'users who
    browse then buy' product questions."""
    from ...stages.join import sorted_merge_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    ut = sorted_group_aggregate(
        ev.map_batches(lambda b: pa.table({
            "user_id": b.column("user_id"),
            "event_type": b.column("event_type"),
            "mn": pc.cast(b.column("ts"), pa.int64()),
            "mx": pc.cast(b.column("ts"), pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "event_type"], [("mn", "min"), ("mx", "max")],
        precombine=True).materialize()

    left = ut.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"), "type_a": b.column("event_type"),
        "mn_a": b.column("mn")}), batch_format="pyarrow",
        zero_copy_batch=True)
    right = ut.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"), "type_b": b.column("event_type"),
        "mx_b": b.column("mx")}), batch_format="pyarrow",
        zero_copy_batch=True)

    def keep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.not_equal(b.column("type_a"), b.column("type_b")),
                    pc.less(b.column("mn_a"), b.column("mx_b")))
        t = b.filter(m)
        return pa.table({
            "type_a": t.column("type_a"), "type_b": t.column("type_b"),
            "n_users": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    return sorted_group_aggregate(
        sorted_merge_join(left, right, on="user_id")
        .map_batches(keep, batch_format="pyarrow"),
        ["type_a", "type_b"], [("n_users", "sum")], precombine=True)


def events_adoption_curve(sf_dir: str):
    """User-adoption curve: per day, how many users had their FIRST
    event that day, plus the running cumulative — the growth chart.
    One per-user MIN reduce, one day histogram, and a days-sized
    prefix sum on the driver."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    first = sorted_group_aggregate(
        ev.map_batches(lambda b: pa.table({
            "user_id": b.column("user_id"),
            "first_us": pc.cast(b.column("ts"), pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], [("first_us", "min")], precombine=True)
    hist = sorted_group_aggregate(
        first.map_batches(lambda b: pa.table({
            "day": pc.cast(pc.divide(b.column("first_us"),
                                     pa.scalar(86_400_000_000,
                                               type=pa.int64())),
                           pa.int64()),
            "n_new": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["day"], [("n_new", "sum")]).take_all()
    hist.sort(key=lambda r: r["day"])
    days = [int(r["day"]) for r in hist]
    new = [int(r["n_new"]) for r in hist]
    cum, acc = [], 0
    for n in new:
        acc += n
        cum.append(acc)
    return pa.table({
        "day": pa.array(days, type=pa.int64()),
        "n_new": pa.array(new, type=pa.int64()),
        "n_cum": pa.array(cum, type=pa.int64())})


def events_hourly_ewma(sf_dir: str):
    """Integer exponential smoothing of the hourly count series
    (α = 1/4): ``s' = (3·s + c_fp) // 4`` over micro-unit counts — the
    EWMA a monitoring pipeline tracks, in the one form that replays
    bitwise (every float EWMA drifts with fold order; the integer
    recurrence has exactly one legal order and the oracle replays it
    as a RECURSIVE CTE stepping the hour index).  The hourly reduction
    is distributed; the per-type fold runs on the driver over the
    output-sized (types × hours) series."""
    def prep(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("ts"), pa.int64())
        return pa.table({
            "event_type": b.column("event_type"),
            "hour": pc.cast(pc.divide(ts, pa.scalar(3_600_000_000,
                                                    type=pa.int64())),
                            pa.int64()),
            "c": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    hourly = sorted_group_aggregate(
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hour"], [("c", "sum")], precombine=True) \
        .take_all()

    by_type = {}
    for r in hourly:
        by_type.setdefault(r["event_type"], []).append(
            (int(r["hour"]), int(r["c"])))
    out_t, out_h, out_c, out_s = [], [], [], []
    for t in sorted(by_type):
        series = sorted(by_type[t])
        s = None
        for h, c in series:
            c_fp = c * 1_000_000
            s = c_fp if s is None else (3 * s + c_fp) // 4
            out_t.append(t)
            out_h.append(h)
            out_c.append(c)
            out_s.append(s)
    return pa.table({
        "event_type": pa.array(out_t, type=pa.string()),
        "hour": pa.array(out_h, type=pa.int64()),
        "n_events": pa.array(out_c, type=pa.int64()),
        "ewma_fp": pa.array(out_s, type=pa.int64())})


def events_user_bloom_lookup(sf_dir: str, n_keys: int = 3):
    """Point lookup through a BLOOM-sidecar file index — the skipping
    story zone maps can't tell: ``user_id`` is uncorrelated with file
    order, so every file's min/max spans the keyspace and range pruning
    keeps 100%; a per-file bloom filter prunes to ~the files that
    actually hold the probed keys (false positives read harmlessly,
    false negatives are impossible).  Lookup keys are the ``n_keys``
    users with the smallest md5-rank (the repo's deterministic sampling
    order, mirrored by the oracle's ``ORDER BY rank LIMIT``); output is
    each key's exact event count + cents sum.

    The layout (16 deliberately key-shuffled files + sidecars) caches
    under /tmp with the content-fingerprint + atomic-rename discipline
    (``orders_price_band``); the per-file bloom build is one Ray task
    per FILE.  Pruning is asserted by test, not assumed."""
    import hashlib
    import os
    import shutil

    from ...stages.layout import bloom_files_for_keys, write_bloom_layout
    from ...stages.topk import global_topk

    src_path = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src_path)
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}|bloom"
        .encode()).hexdigest()[:10]
    out = f"/tmp/kgray_bloomlayout/events_{tag}"
    if not os.path.exists(os.path.join(out, "_DONE")):
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        src = (rd.read_parquet(src_path, columns=["user_id", "value"])
               .map_batches(lambda b: pa.table({
                   "user_id": b.column("user_id"),
                   "cents": _cents(b.column("value"))}),
                   batch_format="pyarrow", zero_copy_batch=True)
               .repartition(16))
        write_bloom_layout(src, "user_id", tmp)
        with open(os.path.join(tmp, "_DONE"), "w") as f:
            f.write("ok\n")
        shutil.rmtree(out, ignore_errors=True)
        os.rename(tmp, out)

    # deterministic probe keys: bottom-n_keys users by md5 rank
    def rank_rows(b: pa.Table) -> pa.Table:
        users = b.column("user_id").to_pylist()
        rk = np.fromiter(
            (int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
             for u in users), dtype=np.int64, count=len(users))
        return pa.table({"user_id": b.column("user_id"),
                         "rk": pa.array(rk, type=pa.int64())})

    distinct = sorted_group_aggregate(
        rd.read_parquet(src_path, columns=["user_id"]).map_batches(
            lambda b: pa.table({
                "user_id": b.column("user_id"),
                "c": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], [("c", "sum")], precombine=True)
    top = global_topk(distinct.map_batches(rank_rows,
                                           batch_format="pyarrow",
                                           zero_copy_batch=True),
                      [("rk", "ascending"), ("user_id", "ascending")],
                      n_keys)
    keys = sorted(top.column("user_id").to_pylist())

    cand, _all = bloom_files_for_keys(out, [str(k) for k in keys])
    key_set = pa.array(keys, type=pa.int64())

    def probe(b: pa.Table) -> pa.Table:
        hit = b.filter(pc.is_in(b.column("user_id"), value_set=key_set))
        return pa.table({
            "user_id": hit.column("user_id"),
            "n_events": pa.array(np.ones(hit.num_rows, dtype=np.int64)),
            "sum_cents": hit.column("cents")})

    res = sorted_group_aggregate(
        rd.read_parquet(cand).map_batches(
            probe, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], [("n_events", "sum"), ("sum_cents", "sum")])
    return res.sort("user_id")


def events_dow_hour_profile(sf_dir: str):
    """Calendar-heatmap profile: event count and exact cents sum per
    (ISO day-of-week, hour-of-day) cell — the seasonality surface a
    traffic dashboard renders.  Arrow's ``day_of_week(count_from_zero=
    False, week_start=1)`` equals DuckDB ``isodow`` (Mon=1..Sun=7) and
    ``pc.hour`` equals ``EXTRACT(hour ...)`` (proleptic Gregorian both
    sides, the `orders_monthly_seasonality` precedent)."""
    def prep(b: pa.Table) -> pa.Table:
        ts = b.column("ts")
        return pa.table({
            "dow": pc.cast(pc.day_of_week(ts, count_from_zero=False,
                                          week_start=1), pa.int64()),
            "hour": pc.cast(pc.hour(ts), pa.int64()),
            "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "sum_cents": _cents(b.column("value"))})

    return sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["ts", "value"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True),
        ["dow", "hour"], [("n_events", "sum"), ("sum_cents", "sum")],
        precombine=True).sort(["dow", "hour"])


def events_type_peak_hour(sf_dir: str):
    """Per-type peak hour with ties — the groupwise argmax-with-ties
    shape (`top_supplier_revenue`'s Q15 discipline, per group): for
    each event type, every epoch hour achieving that type's maximum
    hourly count.  One (type, hour) aggregate, then a per-type max
    broadcast join — both exchanges are output-sized."""
    hourly = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_type", "ts"]).map_batches(
            lambda b: pa.table({
                "event_type": b.column("event_type"),
                "hr": pc.divide(pc.cast(b.column("ts"), pa.int64()),
                                pa.scalar(3600_000_000)),
                "n": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hr"], [("n", "sum")],
        precombine=True).materialize()

    mx: dict = {}
    for r in hourly.take_all():          # (type, hour) table: output-sized
        t, n = r["event_type"], int(r["n"])
        if n > mx.get(t, 0):
            mx[t] = n

    def keep_peaks(b: pa.Table) -> pa.Table:
        # empty blocks off a sorted/aggregated dataset can carry an
        # EMPTY schema (NOTES #66) — typed-empty substitute
        if b.num_rows == 0 or "n" not in b.schema.names:
            return pa.table({
                "event_type": pa.array([], type=pa.string()),
                "peak_hour": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64())})
        m = pa.array([mx[t] for t in
                      b.column("event_type").to_pylist()],
                     type=pa.int64())
        t = b.filter(pc.equal(b.column("n"), m))
        return pa.table({
            "event_type": t.column("event_type"),
            "peak_hour": t.column("hr"),
            "n_events": t.column("n")})

    return hourly.map_batches(keep_peaks, batch_format="pyarrow",
                              zero_copy_batch=True
                              ).sort(["event_type", "peak_hour"])


def events_weekly_hll_merge(sf_dir: str, p: int = 12):
    """Sketch-merge algebra as an audited output (the `orders_join_ivm`
    discipline): weekly distinct-user HLL estimates computed TWO ways —
    (a) merging the seven constituent DAILY register arrays by
    elementwise max, (b) direct weekly registers from the raw stream —
    must agree register-for-register (max-merge associativity: the
    property that lets a 100-TB pipeline keep per-partition sketches
    and roll them up without re-scanning).  ``merge_law_ok`` lands in
    the gated output, so the driver's value hash enforces the law.
    Weeks are Monday-anchored (`weekly_retention`'s integer rule)."""
    import ray

    from ...stages.sketch import _hash_strings, _hll_registers, \
        hll_estimate

    m = 1 << p

    def partials(b: pa.Table) -> pa.Table:
        days = (pc.divide(pc.cast(b.column("ts"), pa.int64()),
                          pa.scalar(86_400_000_000))
                .to_numpy(zero_copy_only=False))
        weeks = days - ((days + 3) % 7)
        users = b.column("user_id").to_pylist()
        hashes = _hash_strings([str(u) for u in users])
        out_k, out_key, out_r = [], [], []
        for kind, keys in (("d", days), ("w", weeks)):
            by = {}
            for i, k in enumerate(keys):
                by.setdefault(int(k), []).append(i)
            for k, idxs in by.items():
                regs = _hll_registers(
                    hashes[np.array(idxs, dtype=np.int64)], p)
                out_k.append(kind)
                out_key.append(k)
                out_r.append(regs.tobytes())
        return pa.table({
            "kind": pa.array(out_k, type=pa.string()),
            "key": pa.array(out_key, type=pa.int64()),
            "regs": pa.array(out_r, type=pa.binary())})

    parts = [t for t in ray.get(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["ts", "user_id"]).map_batches(
            partials, batch_format="pyarrow",
            zero_copy_batch=True).to_arrow_refs()) if t.num_rows]
    daily, weekly = {}, {}
    for t in parts:
        for kind, key, rb in zip(t.column("kind").to_pylist(),
                                 t.column("key").to_pylist(),
                                 t.column("regs").to_pylist()):
            tgt = daily if kind == "d" else weekly
            regs = np.frombuffer(rb, dtype=np.uint8)
            if key in tgt:
                tgt[key] = np.maximum(tgt[key], regs)
            else:
                tgt[key] = regs.copy()

    out = []
    for wk in sorted(weekly):
        member_days = [d for d in daily if d - ((d + 3) % 7) == wk]
        merged = np.zeros(m, dtype=np.uint8)
        for d in member_days:
            merged = np.maximum(merged, daily[d])
        direct = weekly[wk]
        ok = int(np.array_equal(merged, direct))
        out.append({
            "week_day": wk,
            "n_days": len(member_days),
            "est_direct": int(np.floor(hll_estimate(direct))),
            "est_merged": int(np.floor(hll_estimate(merged))),
            "merge_law_ok": ok})
    return pa.table({
        "week_day": pa.array([r["week_day"] for r in out],
                             type=pa.int64()),
        "n_days": pa.array([r["n_days"] for r in out], type=pa.int64()),
        "est_direct": pa.array([r["est_direct"] for r in out],
                               type=pa.int64()),
        "est_merged": pa.array([r["est_merged"] for r in out],
                               type=pa.int64()),
        "merge_law_ok": pa.array([r["merge_law_ok"] for r in out],
                                 type=pa.int64())})


