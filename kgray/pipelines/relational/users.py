"""Per-user behavioral features: running/rolling/trailing windows, gaps, streaks, funnels, retention inputs, skew diagnostics.

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
    _cents,
    _funnel_depths,
)


def user_running_value(sf_dir: str):
    """Partitioned running total (the SQL window ``SUM ... OVER
    (PARTITION BY user ORDER BY ts ROWS UNBOUNDED PRECEDING)``) —
    ``stages/scan.py`` prefix-scan exchange: per-block cumsums plus
    driver-threaded carry offsets, one row out per row in.  Ordered by
    (ts, event_id) so the window order is total in both engines."""
    from ...stages.scan import grouped_running_sum

    prepped = (rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id", "value"])
               .map_batches(lambda b: pa.table({
                   "user_id": b.column("user_id"),
                   "event_id": b.column("event_id"),
                   "ev_us": pc.cast(b.column("ts"), pa.int64()),
                   "value_cents": _cents(b.column("value"))}),
                   batch_format="pyarrow", zero_copy_batch=True))
    return grouped_running_sum(prepped, key="user_id",
                               order_cols=["ev_us", "event_id"],
                               value_col="value_cents",
                               out_name="running_cents")


def user_event_gaps(sf_dir: str):
    """LAG window (``stages/scan.py:grouped_lag``): per event, µs since
    the same user's previous event (−1 for each user's first event —
    COALESCE in the oracle keeps the column exact int64)."""
    from ...stages.scan import grouped_lag

    prepped = (rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id"])
               .map_batches(lambda b: pa.table({
                   "user_id": b.column("user_id"),
                   "event_id": b.column("event_id"),
                   "ev_us": pc.cast(b.column("ts"), pa.int64())}),
                   batch_format="pyarrow", zero_copy_batch=True))
    lagged = grouped_lag(prepped, key="user_id",
                         order_cols=["ev_us", "event_id"],
                         value_col="ev_us", out_name="prev_us")
    return lagged.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"),
        "event_id": b.column("event_id"),
        "ev_us": b.column("ev_us"),
        "gap_us": pc.fill_null(pc.subtract(b.column("ev_us"),
                                           b.column("prev_us")),
                               pa.scalar(-1, type=pa.int64()))}),
        batch_format="pyarrow", zero_copy_batch=True)


def users_both_active(sf_dir: str):
    """Distributed INTERSECT (distinct): user ids appearing in BOTH the
    events stream and the orders table — ``stages/setops.py``."""
    from ...stages.setops import set_op

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    od = (rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
          .map_batches(lambda b: pa.table({"user_id": b.column("o_custkey")}),
                       batch_format="pyarrow", zero_copy_batch=True))
    return set_op(ev, od, "intersect")


def buyers_never_active(sf_dir: str):
    """Distributed EXCEPT (distinct): customer ids with orders but no
    event activity — ``stages/setops.py``."""
    from ...stages.setops import set_op

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    od = (rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
          .map_batches(lambda b: pa.table({"user_id": b.column("o_custkey")}),
                       batch_format="pyarrow", zero_copy_batch=True))
    return set_op(od, ev, "except")


def user_next_event_gap(sf_dir: str):
    """LEAD window (``stages/scan.py:grouped_lead``): per event, µs
    until the same user's next event (−1 for each user's last event —
    COALESCE in the oracle keeps the column exact int64)."""
    from ...stages.scan import grouped_lead

    prepped = (rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id"])
               .map_batches(lambda b: pa.table({
                   "user_id": b.column("user_id"),
                   "event_id": b.column("event_id"),
                   "ev_us": pc.cast(b.column("ts"), pa.int64())}),
                   batch_format="pyarrow", zero_copy_batch=True))
    led = grouped_lead(prepped, key="user_id",
                       order_cols=["ev_us", "event_id"],
                       value_col="ev_us", out_name="next_us")
    return led.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"),
        "event_id": b.column("event_id"),
        "ev_us": b.column("ev_us"),
        "gap_us": pc.fill_null(pc.subtract(b.column("next_us"),
                                           b.column("ev_us")),
                               pa.scalar(-1, type=pa.int64()))}),
        batch_format="pyarrow", zero_copy_batch=True)


def user_event_sample(sf_dir: str, k: int = 5):
    """Per-user deterministic k-event sample (smallest md5(event_id) —
    a stable reservoir) with a 1-based sample_rank, via the grouped
    top-k exchange."""
    from ...functions.sampling import group_sample

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id"])
    return group_sample(ev, group="user_id", key_col="event_id", k=k)


def user_event_type_seq(sf_dir: str):
    """Ordered string aggregation (``stages/stringagg.py``): per user,
    the comma-joined sequence of event types ordered by (ts, event_id)
    — a total order (event_id unique), so the SQL
    ``string_agg(... ORDER BY ts, event_id)`` result is deterministic
    and the strings match byte-for-byte."""
    from ...stages.stringagg import grouped_string_agg

    prepped = (rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
               .map_batches(lambda b: pa.table({
                   "user_id": b.column("user_id"),
                   "ev_us": pc.cast(b.column("ts"), pa.int64()),
                   "event_id": b.column("event_id"),
                   "event_type": b.column("event_type")}),
                   batch_format="pyarrow", zero_copy_batch=True))
    agg = grouped_string_agg(prepped, key="user_id",
                             order_cols=["ev_us", "event_id"],
                             value_col="event_type", sep=",",
                             out_name="type_seq")
    return agg.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"),
        "n_events": b.column("n"),
        "type_seq": pc.cast(b.column("type_seq"), pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True)


def user_type_value_share(sf_dir: str):
    """Ratio-to-report window (``value / SUM(value) OVER (PARTITION BY
    user)``): per (user, event_type), the type's share of the user's
    total event value.  Cents are summed exactly at the (user, type)
    grain; user totals RE-AGGREGATE that already-reduced output (sums
    of sums — no second pass over the input); the two grains meet in a
    shuffle join keyed the same way, and the share is one IEEE division
    of two exact integers — bitwise equal to the SQL window."""
    from ...stages.join import sorted_merge_join

    prepped = (rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "value"])
               .map_batches(lambda b: pa.table({
                   "user_id": b.column("user_id"),
                   "event_type": b.column("event_type"),
                   "type_cents": _cents(b.column("value"))}),
                   batch_format="pyarrow", zero_copy_batch=True))
    pairs = sorted_group_aggregate(prepped, ["user_id", "event_type"],
                                   [("type_cents", "sum")]).materialize()
    totals = sorted_group_aggregate(
        pairs.map_batches(lambda b: pa.table({
            "user_id": b.column("user_id"),
            "user_cents": b.column("type_cents")}),
            batch_format="pyarrow", zero_copy_batch=True),
        "user_id", [("user_cents", "sum")], precombine=False)
    joined = sorted_merge_join(pairs, totals, on="user_id")
    return joined.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"),
        "event_type": b.column("event_type"),
        "type_cents": b.column("type_cents"),
        "user_cents": b.column("user_cents"),
        "share": pc.divide(pc.cast(b.column("type_cents"), pa.float64()),
                           pc.cast(b.column("user_cents"), pa.float64()))}),
        batch_format="pyarrow", zero_copy_batch=True)


def user_rolling_value(sf_dir: str, k: int = 3):
    """Rolling-frame window (``stages/rolling.py:grouped_rolling``):
    SUM/COUNT/MIN/MAX/AVG over each event's 3 preceding events plus
    itself, per user ordered by (ts, event_id) — carry-bounded exchange
    (≤ k scalars per block), bitwise vs the SQL ROWS frame oracle."""
    from ...stages.rolling import grouped_rolling

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "event_id", "ts", "value"])
    cents = events.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"),
        "event_id": b.column("event_id"),
        "ts": b.column("ts"),
        "cents": _cents(b.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_rolling(cents, "user_id", ["ts", "event_id"], "cents", k)
    return out.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"),
        "event_id": b.column("event_id"),
        "roll_sum": b.column("roll_sum"),
        "roll_n": b.column("roll_n"),
        "roll_min": b.column("roll_min"),
        "roll_max": b.column("roll_max"),
        "roll_avg": b.column("roll_avg")}),
        batch_format="pyarrow", zero_copy_batch=True)


def user_first_last_event(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE over the full partition frame
    (``stages/scan.py:grouped_first_last``): every event row learns its
    user's first and last event type in (ts, event_id) order — two
    one-scalar-per-block carries, bitwise vs the SQL window oracle."""
    from ...stages.scan import grouped_first_last

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "event_id", "ts",
                                      "event_type"])
    out = grouped_first_last(events, "user_id", ["ts", "event_id"],
                             "event_type", first_name="first_type",
                             last_name="last_type")
    return out.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"),
        "event_id": b.column("event_id"),
        "first_type": b.column("first_type"),
        "last_type": b.column("last_type")}),
        batch_format="pyarrow", zero_copy_batch=True)


def user_latest_event(sf_dir: str):
    """arg-max per group (SQL ``max_by`` / ``arg_max`` with an explicit
    total order): each user's latest event row — the grouped_topk
    exchange at k=1 (edge shipment ≤ 1 row per block), bitwise vs a
    ROW_NUMBER()=1 oracle (ties broken by event_id, so deterministic
    where raw arg_max is not)."""
    from ...stages.topk import grouped_topk

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "event_id", "ts",
                                      "event_type"])
    # total order: (ts desc, event_id asc) — encode ts as int64 micros
    prep = events.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"),
        "event_id": b.column("event_id"),
        "ts_us": pc.cast(b.column("ts"), pa.int64()),
        "event_type": b.column("event_type")}),
        batch_format="pyarrow", zero_copy_batch=True)
    top = grouped_topk(prep, group="user_id", order_col="ts_us",
                       tiebreak="event_id", k=1)
    return top.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"),
        "last_event_id": b.column("event_id"),
        "last_ts_us": b.column("ts_us"),
        "last_type": b.column("event_type")}),
        batch_format="pyarrow", zero_copy_batch=True)


def user_trailing_value(sf_dir: str, hours: int = 1):
    """Time-based (RANGE) window frame: per event, the COUNT and SUM of
    the same user's event values over the trailing ``hours`` — SQL's
    ``RANGE BETWEEN INTERVAL h PRECEDING AND CURRENT ROW`` frame, which
    (unlike the ROWS frame in ``user_rolling_value``) includes every
    peer row at equal ``ts``.

    A RANGE frame IS a trailing-window interval self-join — one stream
    as lefts, the same stream as rights — so this composes the pinned
    ``windowed_count_join`` carry-in exchange (per-run searchsorted +
    prefix sums, O(1) carried rows per block) instead of new machinery."""
    from ...stages.asof import windowed_count_join

    def lefts(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "ev_us": pc.cast(b.column("ts"), pa.int64())})

    def rights(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "r_us": pc.cast(b.column("ts"), pa.int64()),
            "value_cents": _cents(b.column("value"))})

    left = (rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id"])
            .map_batches(lefts, batch_format="pyarrow", zero_copy_batch=True))
    right = (rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["ts", "user_id", "value"])
             .map_batches(rights, batch_format="pyarrow",
                          zero_copy_batch=True))
    window_us = hours * 3_600 * 1_000_000
    return windowed_count_join(left, right, key="user_id",
                               left_t="ev_us", right_t="r_us",
                               window=window_us,
                               count_name="n_trailing",
                               value_col="value_cents",
                               sum_name="trailing_cents")


def user_funnel_counts(sf_dir: str,
                       stages: tuple = ("view", "click", "purchase")):
    """Ordered-funnel analytics: how many users reached each stage,
    where stage k requires an event of type ``stages[k]`` STRICTLY
    after the user's earliest qualifying stage-(k−1) event.

    Shared-scan plan (r3 — was 3 reads + 3 join exchanges, the r2
    VERDICT stretch item): ONE read of the events stream filtered to
    the stage types, ONE sort on (user_id, ts) co-locates each user's
    typed events, and every complete run resolves its whole funnel
    locally with segmented numpy mins.  Boundary runs ship raw rows
    (bounded by one user's typed events per block edge — the standard
    sorted-run contract); interior blocks ship ≤K depth-count partial
    rows.  Output: one row per stage with its surviving-user count."""
    from ...stages._runs import edge_interior_exchange, edge_mask, nullsafe_sort

    n_stages = len(stages)
    stage_arr = pa.array(list(stages), type=pa.string())

    def prep(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b.column("event_type"), value_set=stage_arr)
        m = pc.fill_null(pc.is_valid(idx), False)
        t = b.filter(m)
        return pa.table({
            "user_id": t.column("user_id"),
            "k": pc.cast(pc.index_in(t.column("event_type"),
                                     value_set=stage_arr), pa.int8()),
            "t_us": pc.cast(t.column("ts"), pa.int64())})

    ev = (rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["user_id", "event_type", "ts"])
          .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))
    srt = nullsafe_sort(ev, ["user_id", "t_us"]).materialize()

    def _depth_counts(t: pa.Table) -> pa.Table:
        user = t.column("user_id").combine_chunks()
        k = t.column("k").to_numpy(zero_copy_only=False)
        ts = t.column("t_us").to_numpy(zero_copy_only=False)
        _, depth = _funnel_depths(user, k, ts, n_stages)
        counts = np.bincount(depth, minlength=n_stages + 1)
        # depth d means the user reached stages 1..d
        return pa.table({
            "stage_idx": pa.array(np.arange(1, n_stages + 1,
                                            dtype=np.int64)),
            "n_users": pa.array([int(counts[d:].sum())
                                 for d in range(1, n_stages + 1)],
                                type=pa.int64())})

    def edge_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.filter(edge_mask(batch.column("user_id")
                                      .combine_chunks()))

    def interior_fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"stage_idx": pa.array([], type=pa.int64()),
                          "n_users": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        m = edge_mask(batch.column("user_id").combine_chunks())
        interior = batch.filter(pc.invert(m))
        if interior.num_rows == 0:
            return empty
        return _depth_counts(interior)

    def merge(edge_tables) -> pa.Table:
        allt = pa.concat_tables(edge_tables)
        srt_edge = allt.sort_by([("user_id", "ascending"),
                                 ("t_us", "ascending")])
        return _depth_counts(srt_edge)

    partials = edge_interior_exchange(srt, edge_fn, interior_fn, merge)
    agg = sorted_group_aggregate(partials, ["stage_idx"],
                                 [("n_users", "sum")], precombine=False)

    labels = {i + 1: f"{i + 1}_{s}" for i, s in enumerate(stages)}

    def label(b: pa.Table) -> pa.Table:
        return pa.table({
            "stage": pa.array([labels[i] for i in
                               b.column("stage_idx").to_pylist()],
                              type=pa.string()),
            "n_users": b.column("n_users")})

    return agg.map_batches(label, batch_format="pyarrow",
                           zero_copy_batch=True)


def user_value_twap(sf_dir: str):
    """Time-weighted average value per user (the telemetry/finance TWAP
    shape): each event's value is weighted by how long it remained
    'current' (left-step interpolation to the next event), all in exact
    integers — cents × floor-millisecond gaps (ms, not µs, for int64
    headroom) — with ONE final mirrored float division.  Composition:
    the LEAD carry exchange produces gaps without any self-join; a
    second small aggregate adds per-user span/counts."""
    from ...stages.join import sorted_merge_join
    from ...stages.scan import grouped_lead

    base = (rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "ts", "value"])
            .map_batches(lambda b: pa.table({
                "user_id": b.column("user_id"),
                "event_id": b.column("event_id"),
                "ev_us": pc.cast(b.column("ts"), pa.int64()),
                "vc": _cents(b.column("value"))}),
                batch_format="pyarrow", zero_copy_batch=True))

    led = grouped_lead(base, key="user_id",
                       order_cols=["ev_us", "event_id"],
                       value_col="ev_us", out_name="next_us")

    def seg(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_valid(b.column("next_us")))
        gap_ms = pc.divide(pc.subtract(t.column("next_us"),
                                       t.column("ev_us")),
                           pa.scalar(1000, type=pa.int64()))
        return pa.table({
            "user_id": t.column("user_id"),
            "wsum": pc.multiply(t.column("vc"), gap_ms)})

    wsums = sorted_group_aggregate(
        led.map_batches(seg, batch_format="pyarrow", zero_copy_batch=True),
        "user_id", [("wsum", "sum")])
    stats = sorted_group_aggregate(
        base.map_batches(lambda b: pa.table({
            "user_id": b.column("user_id"),
            "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "mn_us": b.column("ev_us"), "mx_us": b.column("ev_us")}),
            batch_format="pyarrow", zero_copy_batch=True),
        "user_id", [("n_events", "sum"), ("mn_us", "min"),
                    ("mx_us", "max")])
    joined = sorted_merge_join(stats, wsums, on="user_id", how="left")

    def finish(b: pa.Table) -> pa.Table:
        span_ms = pc.divide(pc.subtract(b.column("mx_us"),
                                        b.column("mn_us")),
                            pa.scalar(1000, type=pa.int64()))
        wsum = pc.fill_null(b.column("wsum"),
                            pa.scalar(0, type=pa.int64()))
        twap = pc.if_else(
            pc.equal(span_ms, pa.scalar(0, type=pa.int64())),
            pa.scalar(None, type=pa.float64()),
            pc.divide(pc.cast(wsum, pa.float64()),
                      pc.cast(span_ms, pa.float64())))
        return pa.table({"user_id": b.column("user_id"),
                         "n_events": b.column("n_events"),
                         "span_ms": span_ms, "wsum": wsum,
                         "twap_cents": twap})

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def user_key_skew(sf_dir: str):
    """Key-skew diagnostic for shuffle planning: exact per-key counts of
    the events ``user_id`` reduce to one concentration row — row count,
    key count, the heaviest key's share, and the Herfindahl index
    HHI = Σ(cᵢ/N)², computed as one division of the exact integer
    Σcᵢ² by N² so the double is bit-reproducible.  This is the report
    that decides whether a key needs salting before a groupby."""
    counts = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(lambda b: pa.table({
            "user_id": b.column("user_id"),
            "cnt": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        "user_id", [("cnt", "sum")])

    def summar(b: pa.Table) -> pa.Table:
        c = b.column("cnt").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_keys": pa.array([len(c)], type=pa.int64()),
            "n_rows": pa.array([int(c.sum())], type=pa.int64()),
            "max_count": pa.array([int(c.max()) if len(c) else 0],
                                  type=pa.int64()),
            "sum_sq": pa.array([int((c * c).sum())], type=pa.int64())})

    parts = counts.map_batches(summar, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    n_keys = sum(r["n_keys"] for r in parts)
    n_rows = sum(r["n_rows"] for r in parts)
    max_count = max((r["max_count"] for r in parts), default=0)
    sum_sq = sum(r["sum_sq"] for r in parts)
    hhi = sum_sq / (n_rows * n_rows) if n_rows else 0.0
    top_share = max_count / n_rows if n_rows else 0.0
    return pa.table({
        "n_keys": pa.array([n_keys], type=pa.int64()),
        "n_rows": pa.array([n_rows], type=pa.int64()),
        "max_count": pa.array([max_count], type=pa.int64()),
        "sum_sq": pa.array([sum_sq], type=pa.int64()),
        "top_share": pa.array([top_share], type=pa.float64()),
        "hhi": pa.array([hhi], type=pa.float64())})


def user_weekly_streaks(sf_dir: str):
    """Gaps-and-islands: each user's total active weeks and LONGEST run
    of consecutive active weeks.  The classic SQL islands pattern
    (``week − ROW_NUMBER()`` grouping) becomes, distributed: distinct
    (user, week) rows → sort co-locates each user's weeks in order →
    complete runs resolve their streaks in-block, boundary runs ship
    raw rows (bounded by one user's week count) through the standard
    edge/interior exchange."""
    from ...stages._runs import edge_interior_exchange, edge_mask, run_starts

    def prep(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        day = pc.divide(us, pa.scalar(86_400_000_000, type=pa.int64()))
        week = pc.divide(pc.add(day, pa.scalar(3, type=pa.int64())),
                         pa.scalar(7, type=pa.int64()))
        return pa.table({"user_id": b.column("user_id"),
                         "week": pc.cast(week, pa.int64()),
                         "one": pa.array(np.ones(b.num_rows,
                                                 dtype=np.int64))})

    distinct = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "week"], [("one", "min")])
    srt = (distinct.map_batches(lambda b: b.select(["user_id", "week"]),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
           .sort(["user_id", "week"]))

    def _streaks(users, weeks) -> pa.Table:
        uid, nw, mx = [], [], []
        starts = run_starts(users)
        bounds = np.r_[starts, len(users)]
        w = weeks.to_numpy(zero_copy_only=False)
        u = users.to_numpy(zero_copy_only=False)
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            ws = w[lo:hi]                       # sorted distinct weeks
            breaks = np.flatnonzero(np.diff(ws) != 1)
            seg_bounds = np.r_[0, breaks + 1, len(ws)]
            uid.append(int(u[lo]))
            nw.append(int(len(ws)))
            mx.append(int(np.diff(seg_bounds).max()))
        return pa.table({"user_id": pa.array(uid, type=pa.int64()),
                         "n_weeks": pa.array(nw, type=pa.int64()),
                         "max_streak": pa.array(mx, type=pa.int64())})

    def edge_fn(batch: pa.Table) -> pa.Table:
        return batch.filter(edge_mask(batch.column("user_id")))

    def interior_fn(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.invert(edge_mask(batch.column("user_id"))))
        return _streaks(t.column("user_id"), t.column("week"))

    def merge_fn(edge_tables):
        t = pa.concat_tables(edge_tables)
        t = t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                                 ("week", "ascending")]))
        return _streaks(t.column("user_id"), t.column("week"))

    return edge_interior_exchange(srt, edge_fn, interior_fn, merge_fn)


def user_day_purchase_views(sf_dir: str):
    """Composite-key (user_id, epoch_day) fact×fact join — the r2
    VERDICT's #1 residual gap: ``sorted_merge_join(on=["k1","k2"])`` as
    a first-class API, no manual key packing.  Per user-day purchase
    metrics LEFT JOINed to same-day view counts; both sides are
    map-side-reduced aggregates of the events stream, so at scale this
    is a genuine large×large exchange on the key TUPLE.  Unmatched
    view counts are zero-filled (COALESCE in the oracle)."""
    from ...stages.join import sorted_merge_join

    day_us = pa.scalar(86_400_000_000, type=pa.int64())

    def prep(event_type: str, count_name: str, with_cents: bool):
        def fn(b: pa.Table) -> pa.Table:
            mask = pc.fill_null(pc.equal(b.column("event_type"),
                                         event_type), False)
            k = b.filter(mask)
            out = {
                "user_id": k.column("user_id"),
                "epoch_day": pc.cast(
                    pc.divide(pc.cast(k.column("ts"), pa.int64()), day_us),
                    pa.int64()),
                count_name: pa.array(np.ones(k.num_rows, dtype=np.int64)),
            }
            if with_cents:
                out["purchase_cents"] = _cents(k.column("value"))
            return pa.table(out)
        return fn

    p = (rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id", "event_type", "value"])
         .map_batches(prep("purchase", "n_purchases", True),
                      batch_format="pyarrow", zero_copy_batch=True))
    p_daily = sorted_group_aggregate(
        p, ["user_id", "epoch_day"],
        [("n_purchases", "sum"), ("purchase_cents", "sum")])

    v = (rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id", "event_type"])
         .map_batches(prep("view", "n_views", False),
                      batch_format="pyarrow", zero_copy_batch=True))
    v_daily = sorted_group_aggregate(v, ["user_id", "epoch_day"],
                                     [("n_views", "sum")])

    joined = sorted_merge_join(p_daily, v_daily,
                               on=["user_id", "epoch_day"], how="left")
    return joined.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"),
        "epoch_day": b.column("epoch_day"),
        "n_purchases": b.column("n_purchases"),
        "purchase_cents": b.column("purchase_cents"),
        "n_views": pc.fill_null(b.column("n_views"), 0)}),
        batch_format="pyarrow", zero_copy_batch=True)


def user_rolling_median(sf_dir: str, k: int = 5):
    """Rolling MEDIAN (order-statistic window,
    ``stages/rolling.py:grouped_rolling_quantile``): each event's
    discrete median over its 5 preceding events plus itself, per user
    ordered by (ts, event_id).  Exact int64 — quantile_disc picks an
    ELEMENT, never interpolates — so the window oracle matches bitwise;
    exchange ships ≤ k carry values per block."""
    from ...stages.rolling import grouped_rolling_quantile

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "event_id", "ts", "value"])
    cents = events.map_batches(lambda b: pa.table({
        "user_id": b.column("user_id"),
        "event_id": b.column("event_id"),
        "ts": b.column("ts"),
        "cents": _cents(b.column("value"))}),
        batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_rolling_quantile(cents, "user_id", ["ts", "event_id"],
                                   "cents", k, out_col="roll_med")
    return out.map_batches(lambda b: b.select(
        ["user_id", "event_id", "roll_med"]),
        batch_format="pyarrow", zero_copy_batch=True)


def idle_rich_customers(sf_dir: str, since: str = "1998-01-01"):
    """TPC-H Q22 shape — global scalar subquery + anti join: customers
    whose balance exceeds the average POSITIVE balance and who placed
    no order since ``since``, counted per nation.  The scalar is
    (sum_cents, n) over the reduced positive set — the comparison is
    the exact integer cross-multiplication ``cents·n > sum_cents`` (no
    division, nothing to round); the no-recent-orders test is the
    bloom-prefiltered anti semi-join against a date-pushed orders scan
    (the testdata has no order-less customers, so the recency window is
    what makes the anti join non-vacuous).
    """
    import ray as _ray

    from ...stages.semijoin import semi_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"]).materialize()

    def pos_partial(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("c_acctbal"))
        m = pc.greater(cents, pa.scalar(0, type=pa.int64()))
        kept = pc.filter(cents, m)
        return pa.table({
            "s": pa.array([pc.sum(kept).as_py() or 0], type=pa.int64()),
            "n": pa.array([len(kept)], type=pa.int64())})

    s = n = 0
    for t in _ray.get(cust.map_batches(pos_partial, batch_format="pyarrow",
                                       zero_copy_batch=True)
                      .to_arrow_refs()):
        for row in t.to_pylist():
            s += row["s"]
            n += row["n"]

    def rich(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("c_acctbal"))
        # cents > s/n  <=>  cents*n > s   (n > 0; exact int64)
        m = pc.greater(pc.multiply(cents, pa.scalar(n, type=pa.int64())),
                       pa.scalar(s, type=pa.int64()))
        kept = b.filter(m)
        return pa.table({"c_custkey": kept.column("c_custkey"),
                         "c_nationkey": kept.column("c_nationkey"),
                         "acctbal_cents": _cents(kept.column("c_acctbal"))})

    rich_ds = cust.map_batches(rich, batch_format="pyarrow",
                               zero_copy_batch=True)
    import pyarrow.dataset as pds

    ords = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"],
                           filter=pds.field("o_orderdate")
                           >= pd.Timestamp(since))
    # the filtered key column is tiny and semi_join consumes it twice
    # (bloom pass + exchange) — pin it so the pushed scan runs once
    ords = ords.map_batches(lambda b: pa.table({
        "c_custkey": b.column("o_custkey")}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    no_orders = semi_join(rich_ds, ords, on="c_custkey", anti=True,
                          bloom_bits=1 << 20)
    out = sorted_group_aggregate(
        no_orders.map_batches(lambda b: pa.table({
            "c_nationkey": b.column("c_nationkey"),
            "numcust": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "totacctbal_cents": b.column("acctbal_cents")}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["c_nationkey"], [("numcust", "sum"), ("totacctbal_cents", "sum")],
        precombine=True)
    return out


def user_active_spans(sf_dir: str, dur_s: int = 300):
    """Interval-union coverage (sweep line): each event opens a
    ``dur_s``-second activity interval; per user, the number of merged
    activity islands and the total UNION length in µs — the classic
    "how long was the user actually active" statistic, where naive
    SUM(duration) double-counts overlaps.

    Distribution: sort co-locates each user's interval starts; a block
    resolves its complete runs fully vectorized (fixed duration makes
    the running max-end equal the previous end, so island breaks are
    one ``s[1:] > s[:-1] + dur`` compare); boundary runs pre-merge to
    their ISLANDS before shipping — the shipment is union-output-sized
    (never raw event counts), and islands re-merge associatively on
    the driver."""
    from ...stages._runs import edge_interior_exchange, edge_mask, run_starts

    dur = int(dur_s) * 1_000_000

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "s": pc.cast(b.column("ts"), pa.int64())})

    srt = (rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"])
           .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
           .sort(["user_id", "s"]))

    def _island_rows(t: pa.Table) -> pa.Table:
        """(user_id, s0, e1) per merged island of the sorted rows."""
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "s0": pa.array([], type=pa.int64()),
                             "e1": pa.array([], type=pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        brk = np.r_[True, (u[1:] != u[:-1]) | (s[1:] > s[:-1] + dur)]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(s)] - 1
        return pa.table({"user_id": pa.array(u[starts], type=pa.int64()),
                         "s0": pa.array(s[starts], type=pa.int64()),
                         "e1": pa.array(s[ends] + dur, type=pa.int64())})

    def _stats(islands: pa.Table) -> pa.Table:
        if islands.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_islands": pa.array([], type=pa.int64()),
                             "active_us": pa.array([], type=pa.int64())})
        u = islands.column("user_id").to_numpy(zero_copy_only=False)
        s0 = islands.column("s0").to_numpy(zero_copy_only=False)
        e1 = islands.column("e1").to_numpy(zero_copy_only=False)
        starts = run_starts(islands.column("user_id"))
        bounds = np.r_[starts, len(u)]
        lens = e1 - s0
        cum = np.r_[0, np.cumsum(lens)]
        return pa.table({
            "user_id": pa.array(u[starts], type=pa.int64()),
            "n_islands": pa.array(np.diff(bounds), type=pa.int64()),
            "active_us": pa.array(cum[bounds[1:]] - cum[bounds[:-1]],
                                  type=pa.int64())})

    def edge_fn(batch: pa.Table) -> pa.Table:
        return _island_rows(batch.filter(edge_mask(batch.column("user_id"))))

    def interior_fn(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.invert(edge_mask(batch.column("user_id"))))
        return _stats(_island_rows(t))

    def merge_fn(edge_tables):
        t = pa.concat_tables(edge_tables)
        t = t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                                 ("s0", "ascending")]))
        # re-merge: islands from adjacent blocks may chain
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        s0 = t.column("s0").to_numpy(zero_copy_only=False)
        e1 = t.column("e1").to_numpy(zero_copy_only=False)
        uid, a, b = [], [], []
        cu = cs = ce = None
        for i in range(len(u)):
            if cu == u[i] and s0[i] <= ce:
                ce = max(ce, int(e1[i]))
                continue
            if cu is not None:
                uid.append(cu)
                a.append(cs)
                b.append(ce)
            cu, cs, ce = int(u[i]), int(s0[i]), int(e1[i])
        if cu is not None:
            uid.append(cu)
            a.append(cs)
            b.append(ce)
        return _stats(pa.table({"user_id": pa.array(uid, type=pa.int64()),
                                "s0": pa.array(a, type=pa.int64()),
                                "e1": pa.array(b, type=pa.int64())}))

    return edge_interior_exchange(srt, edge_fn, interior_fn, merge_fn)


def user_window_features(sf_dir: str):
    """Feature-store shape: per-user training features over MULTIPLE
    trailing windows in ONE scan — counts in the last 7/30 days,
    purchase money in the last 30 days, recency and tenure vs the
    corpus reference time T = max(ts).

    Every feature is a conditional integer partial (CASE-masked cents
    / counts, min/max epoch-µs), so one ``sorted_group_aggregate``
    with map-side precombine produces the whole row — the engine
    never rescans per window, which is the difference between 2
    passes and 6 at 100 TB."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value", "ts"])
    t_ref = ev.map_batches(lambda b: pa.table({
        "m": pa.array([pc.max(pc.cast(b.column("ts"), pa.int64())).as_py()
                       if b.num_rows else None], type=pa.int64())}),
        batch_format="pyarrow").max("m")
    day_us = 86_400_000_000
    lo7, lo30 = t_ref - 7 * day_us, t_ref - 30 * day_us

    def prep(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        is_p = np.asarray(
            pc.equal(b.column("event_type"),
                     pa.scalar("purchase")).to_numpy(
                zero_copy_only=False))
        w7 = (ts > lo7).astype(np.int64)
        w30 = (ts > lo30).astype(np.int64)
        return pa.table({
            "user_id": b.column("user_id"),
            "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "n_7d": pa.array(w7),
            "n_30d": pa.array(w30),
            "purchase_cents_30d": pa.array(cents * w30 * is_p),
            "last_us": pa.array(ts),
            "first_us": pa.array(ts)})

    agg = sorted_group_aggregate(
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        [("n_events", "sum"), ("n_7d", "sum"), ("n_30d", "sum"),
         ("purchase_cents_30d", "sum"), ("last_us", "max"),
         ("first_us", "min")], precombine=True)

    return agg.map_batches(lambda b, _t=t_ref: pa.table({
        "user_id": b.column("user_id"),
        "n_events": b.column("n_events"),
        "n_7d": b.column("n_7d"),
        "n_30d": b.column("n_30d"),
        "purchase_cents_30d": b.column("purchase_cents_30d"),
        "recency_us": pc.subtract_checked(
            pa.scalar(_t, type=pa.int64()), b.column("last_us")),
        "tenure_us": pc.subtract_checked(
            b.column("last_us"), b.column("first_us"))}),
        batch_format="pyarrow", zero_copy_batch=True)


def user_type_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity feature (bots peg near 0, organic users
    spread).  Exact-integer discipline end to end: the (user, type)
    count table quantizes each term to micro-nats ONCE (``floor(1e6·c·
    ln c + 0.5)`` — ``math.log`` on ints is bitwise-equal to DuckDB
    ``ln``, measured), so the per-user reduction is an int64 sum with
    no float-order sensitivity; the final ``entropy_unat = (floor(1e6·
    n·ln n + 0.5) − Σterms) // n`` is one integer expression.  Two
    mergeable aggregates, both map-side precombined."""
    import math

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    ut = sorted_group_aggregate(
        ev.map_batches(lambda b: pa.table({
            "user_id": b.column("user_id"),
            "event_type": b.column("event_type"),
            "c": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "event_type"], [("c", "sum")], precombine=True)

    def quantize(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False)
        term = np.array(
            [math.floor(1000000.0 * ci * math.log(ci) + 0.5)
             for ci in c.tolist()], dtype=np.int64)
        return pa.table({
            "user_id": b.column("user_id"),
            "n_events": b.column("c"),
            "n_types": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "term_unat": pa.array(term)})

    agg = sorted_group_aggregate(
        ut.map_batches(quantize, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"],
        [("n_events", "sum"), ("n_types", "sum"), ("term_unat", "sum")],
        precombine=True)

    def finalize(b: pa.Table) -> pa.Table:
        n = b.column("n_events").to_numpy(zero_copy_only=False)
        s = b.column("term_unat").to_numpy(zero_copy_only=False)
        ln_n = np.array(
            [math.floor(1000000.0 * ni * math.log(ni) + 0.5)
             for ni in n.tolist()], dtype=np.int64)
        return pa.table({
            "user_id": b.column("user_id"),
            "n_events": b.column("n_events"),
            "n_types": b.column("n_types"),
            "entropy_unat": pa.array((ln_n - s) // n, type=pa.int64())})

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def user_conversion_survival(sf_dir: str):
    """Kaplan–Meier INPUT table for view→purchase conversion: each
    user enters at their first 'view'; the event is their first
    'purchase' AT OR AFTER it; users who never convert are censored at
    the corpus horizon (max ts).  Output per whole day of follow-up:
    ``n_at_risk`` (users still under observation at day start),
    ``n_converted``, ``n_censored`` — the exact integer triple every
    survival estimator consumes (the KM product itself is the
    consumer's one float fold; emitting the triple keeps the artifact
    bitwise).

    Scale shape: one per-user MIN reduce for entry times, one sorted
    join to gate purchases by the user's own entry (never a broadcast
    — the user table is corpus-sized), one more MIN reduce, a LEFT
    join, and a day histogram; only the days-sized at-risk suffix
    scan runs on the driver."""
    from ...stages.join import sorted_merge_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    horizon = ev.map_batches(lambda b: pa.table({
        "m": pa.array([pc.max(pc.cast(b.column("ts"), pa.int64())).as_py()
                       if b.num_rows else None], type=pa.int64())}),
        batch_format="pyarrow").max("m")

    def views(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("event_type"), pa.scalar("view")))
        return pa.table({
            "user_id": t.column("user_id"),
            "first_view": pc.cast(t.column("ts"), pa.int64())})

    fv = sorted_group_aggregate(
        ev.map_batches(views, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"], [("first_view", "min")], precombine=True) \
        .materialize()

    def purchases(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("event_type"),
                              pa.scalar("purchase")))
        return pa.table({
            "user_id": t.column("user_id"),
            "p_ts": pc.cast(t.column("ts"), pa.int64())})

    cand = sorted_merge_join(
        ev.map_batches(purchases, batch_format="pyarrow",
                       zero_copy_batch=True), fv, on="user_id") \
        .map_batches(lambda b: b.filter(
            pc.greater_equal(b.column("p_ts"), b.column("first_view"))),
            batch_format="pyarrow")
    conv = sorted_group_aggregate(
        cand.map_batches(lambda b: pa.table({
            "user_id": b.column("user_id"),
            "conv_ts": b.column("p_ts")}), batch_format="pyarrow",
            zero_copy_batch=True),
        ["user_id"], [("conv_ts", "min")], precombine=True)

    day_us = 86_400_000_000
    followed = sorted_merge_join(fv, conv, on="user_id", how="left")

    def to_day(b: pa.Table, _h=horizon) -> pa.Table:
        t0 = b.column("first_view").to_numpy(zero_copy_only=False)
        ct = b.column("conv_ts").to_numpy(zero_copy_only=False)
        has = np.asarray(pc.is_valid(b.column("conv_ts")).to_numpy(
            zero_copy_only=False))
        end = np.where(has, np.nan_to_num(ct, nan=0).astype(np.int64),
                       np.int64(_h))
        return pa.table({
            "day": pa.array((end - t0) // day_us, type=pa.int64()),
            "n_converted": pa.array(has.astype(np.int64)),
            "n_censored": pa.array((~has).astype(np.int64))})

    hist = sorted_group_aggregate(
        followed.map_batches(to_day, batch_format="pyarrow"),
        ["day"], [("n_converted", "sum"), ("n_censored", "sum")],
        precombine=True).take_all()      # days-sized

    hist.sort(key=lambda r: r["day"])
    n_total = sum(r["n_converted"] + r["n_censored"] for r in hist)
    out_d, out_r, out_c, out_x = [], [], [], []
    done = 0
    for r in hist:
        out_d.append(int(r["day"]))
        out_r.append(n_total - done)
        out_c.append(int(r["n_converted"]))
        out_x.append(int(r["n_censored"]))
        done += int(r["n_converted"]) + int(r["n_censored"])
    return pa.table({
        "day": pa.array(out_d, type=pa.int64()),
        "n_at_risk": pa.array(out_r, type=pa.int64()),
        "n_converted": pa.array(out_c, type=pa.int64()),
        "n_censored": pa.array(out_x, type=pa.int64())})


def user_ctr_shrunk(sf_dir: str, kappa: int = 20):
    """Empirical-Bayes smoothed click-through rate per user — the
    additive shrinkage every ranking feature store applies so sparse
    users don't swing to 0/1: ``ctr_shrunk = (c_u + κ·m)/(v_u + κ)``
    with ``m`` the pooled corpus rate.  Counts are one mergeable
    aggregate; both ratios are float64 expressions of exact ints in
    the oracle's operand order."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        ty = b.column("event_type")
        return pa.table({
            "user_id": b.column("user_id"),
            "n_views": pc.cast(pc.equal(ty, pa.scalar("view")),
                               pa.int64()),
            "n_clicks": pc.cast(pc.equal(ty, pa.scalar("click")),
                                pa.int64())})

    users = sorted_group_aggregate(
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], [("n_views", "sum"), ("n_clicks", "sum")],
        precombine=True).materialize()
    tot = sorted_group_aggregate(
        users.map_batches(lambda b: pa.table({
            "g": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            "v": b.column("n_views"), "c": b.column("n_clicks")}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["g"], [("v", "sum"), ("c", "sum")]).take_all()[0]
    m = float(int(tot["c"])) / float(int(tot["v"]))

    def finalize(b: pa.Table, _m=m, _k=float(kappa)) -> pa.Table:
        v = b.column("n_views").to_numpy(zero_copy_only=False)
        c = b.column("n_clicks").to_numpy(zero_copy_only=False)
        raw = np.empty(len(v), dtype=np.float64)
        shr = np.empty(len(v), dtype=np.float64)
        for i in range(len(v)):
            raw[i] = (float(c[i]) / float(v[i])) if v[i] > 0 else 0.0
            shr[i] = (float(c[i]) + _k * _m) / (float(v[i]) + _k)
        return pa.table({
            "user_id": b.column("user_id"),
            "n_views": b.column("n_views"),
            "n_clicks": b.column("n_clicks"),
            "ctr_raw": pa.array(raw, type=pa.float64()),
            "ctr_shrunk": pa.array(shr, type=pa.float64())})

    return users.map_batches(finalize, batch_format="pyarrow",
                             zero_copy_batch=True)


def user_spend_gini(sf_dir: str):
    """Gini coefficient of per-user purchase spend — the inequality
    audit behind 'whales vs everyone' revenue questions:
    ``G = 2·Σᵢ i·xᵢ / (n·S) − (n+1)/n`` over users ranked by
    (spend, user_id).  Σ i·x is permutation-safe under ties (equal x),
    so the ranked weighted sum is ONE exact int64 partial off the
    global-rank exchange; the two final divisions are mirrored
    float64.  Output also carries the exact integer pieces so the
    audit is replayable."""
    from ...stages.scan import grouped_ranks

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        isp = pc.cast(pc.equal(b.column("event_type"),
                               pa.scalar("purchase")), pa.int64())
        return pa.table({
            "user_id": b.column("user_id"),
            "spend": pc.multiply(isp, _cents(b.column("value")))})

    users = sorted_group_aggregate(
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], [("spend", "sum")], precombine=True) \
        .map_batches(lambda b: b.append_column(
            "one", pa.array(np.zeros(b.num_rows, dtype=np.int64))),
        batch_format="pyarrow", zero_copy_batch=True)

    ranked = grouped_ranks(users, key="one",
                           order_cols=["spend", "user_id"])
    mom = sorted_group_aggregate(
        ranked.map_batches(lambda b: pa.table({
            "one": b.column("one"),
            "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "s": b.column("spend"),
            "iw": pc.multiply(b.column("row_number"),
                              b.column("spend"))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["one"], [("n", "sum"), ("s", "sum"), ("iw", "sum")]).take_all()[0]
    n, s, iw = int(mom["n"]), int(mom["s"]), int(mom["iw"])
    gini = (float(2 * iw) / float(n * s)
            - float(n + 1) / float(n)) if s > 0 else 0.0
    return pa.table({
        "n_users": pa.array([n], type=pa.int64()),
        "total_cents": pa.array([s], type=pa.int64()),
        "rank_weighted_cents": pa.array([iw], type=pa.int64()),
        "gini": pa.array([gini], type=pa.float64())})


def user_overlap_kmv(sf_dir: str, k: int = 256):
    """Audience-overlap estimation by KMV set sketches — the sketch
    answer to "how many purchasers also view?" when the exact
    intersection is too wide to shuffle.  Bottom-k hash sketches of
    the purchaser set A and viewer set B compose EXACTLY under union
    (bottom-k of A∪B = bottom-k of merged sketches), and the classic
    estimator stack follows: union from the k-th smallest hash
    (``(k−1)·2³²/h_k``), Jaccard from the fraction of the union
    sketch's members that lie in A∩B, intersection as their product.
    The same output row carries the exact |A|, |B|, |A∩B|, |A∪B| so
    the estimate is audited in place, and when |A∪B| < k the sketch
    IS the set (exact fallback, standard KMV small-set rule).

    Plan: one per-user flag aggregate (max of per-row indicators) →
    one exact-count reduce + one global bottom-k sort; only k sketch
    rows and a 4-int summary reach the driver.  Hash = first 8 md5
    hex chars of user_id (`functions/sampling.py` convention), so
    DuckDB replays the sketch bitwise."""
    from ...functions.sampling import _md5_bucket

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def flags(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        return pa.table({
            "user_id": b.column("user_id"),
            "ia": pc.cast(pc.equal(et, pa.scalar("purchase")), pa.int64()),
            "ib": pc.cast(pc.equal(et, pa.scalar("view")), pa.int64())})

    users = sorted_group_aggregate(
        ev.map_batches(flags, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"], [("ia", "max"), ("ib", "max")],
        precombine=True).map_batches(
        lambda b: b.filter(pc.greater(pc.add(b.column("ia"),
                                             b.column("ib")),
                                      pa.scalar(0, type=pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    tot = sorted_group_aggregate(
        users.map_batches(lambda b: pa.table({
            "one": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            "na": b.column("ia"), "nb": b.column("ib"),
            "ni": pc.multiply(b.column("ia"), b.column("ib")),
            "nu": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["one"], [("na", "sum"), ("nb", "sum"), ("ni", "sum"),
                  ("nu", "sum")]).take_all()[0]
    na, nb = int(tot["na"]), int(tot["nb"])
    ni, nu = int(tot["ni"]), int(tot["nu"])

    def add_hash(b: pa.Table) -> pa.Table:
        h = _md5_bucket(b.column("user_id").to_pylist(), 1 << 62)
        return pa.table({
            "user_id": b.column("user_id"),
            "hv": pa.array(h, type=pa.int64()),
            "both": pc.multiply(b.column("ia"), b.column("ib"))})

    sk = (users.map_batches(add_hash, batch_format="pyarrow",
                            zero_copy_batch=True)
          .sort(["hv", "user_id"]).limit(min(k, nu)).take_all())
    kth = int(sk[-1]["hv"]) if sk else 0
    in_both = sum(int(r["both"]) for r in sk)

    if nu < k:
        union_est = float(nu)
        jacc_est = float(ni) / float(nu) if nu else 0.0
    else:
        union_est = float(k - 1) * 4294967296.0 / float(kth)
        jacc_est = float(in_both) / float(k)
    inter_est = jacc_est * union_est
    return pa.table({
        "n_purchasers": pa.array([na], type=pa.int64()),
        "n_viewers": pa.array([nb], type=pa.int64()),
        "n_inter_exact": pa.array([ni], type=pa.int64()),
        "n_union_exact": pa.array([nu], type=pa.int64()),
        "kth_hash": pa.array([kth], type=pa.int64()),
        "sketch_in_both": pa.array([in_both], type=pa.int64()),
        "union_est": pa.array([union_est], type=pa.float64()),
        "jaccard_est": pa.array([jacc_est], type=pa.float64()),
        "inter_est": pa.array([inter_est], type=pa.float64())})


def user_shard_rendezvous(sf_dir: str, n_shards: int = 12):
    """Rendezvous (highest-random-weight) shard routing of the distinct
    user keyspace — the key→shard primitive a crawl store or feature
    service uses so that growing the fleet moves only ~1/(n+1) of the
    keys (HRW, Thaler & Ravishankar 1998; no ring maintenance).

    Each key routes to ``argmax_s rank(key, s)`` with rank = the repo's
    md5-15-hex int64 convention over ``"<key>|<shard>"``, ties to the
    larger shard id — a pure function of the data that DuckDB replays
    bitwise.  Plan: one combined aggregate reduces events to the
    distinct-user table (the only exchange), a map-only pass computes
    the ``n_shards`` ranks per key (O(keys·shards) md5s — HRW is for
    shard counts in the tens; hash-bucket layouts cover large bucket
    counts), and a shard-keyed aggregate emits one row per shard.  The
    minimal-movement law — growing to n+1 shards moves exactly the keys
    whose new argmax IS the new shard, every other key provably keeps
    its assignment (its old ranks are unchanged) — is pinned in
    tests/test_r3_s21_ops.py."""
    import hashlib

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    distinct = sorted_group_aggregate(
        ev.map_batches(lambda b: pa.table({
            "user_id": b.column("user_id"),
            "c": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], [("c", "sum")], precombine=True)

    def assign(b: pa.Table) -> pa.Table:
        users = b.column("user_id").to_pylist()
        if not users:
            return pa.table({
                "shard": pa.array([], type=pa.int64()),
                "n_users": pa.array([], type=pa.int64()),
                "min_user": pa.array([], type=pa.int64()),
                "max_user": pa.array([], type=pa.int64())})
        best = np.zeros(len(users), dtype=np.int64)
        best_rk = np.full(len(users), -1, dtype=np.int64)
        for s in range(n_shards):
            rk = np.fromiter(
                (int(hashlib.md5(f"{u}|{s}".encode()).hexdigest()[:15], 16)
                 for u in users), dtype=np.int64, count=len(users))
            take = rk >= best_rk          # ties → larger shard (s ascends)
            best[take] = s
            best_rk[take] = rk[take]
        uid = np.asarray(users, dtype=np.int64)
        return pa.table({
            "shard": pa.array(best, type=pa.int64()),
            "n_users": pa.array(np.ones(len(users), dtype=np.int64)),
            "min_user": pa.array(uid, type=pa.int64()),
            "max_user": pa.array(uid, type=pa.int64())})

    assigned = distinct.map_batches(assign, batch_format="pyarrow",
                                    zero_copy_batch=True)
    out = sorted_group_aggregate(
        assigned, ["shard"],
        [("n_users", "sum"), ("min_user", "min"), ("max_user", "max")])
    return out.sort("shard")


def user_value_locf(sf_dir: str):
    """Last-observation-carried-forward gap fill — the
    ``IGNORE NULLS`` window shape (``last_value(x IGNORE NULLS) OVER
    (PARTITION BY user ORDER BY ts ROWS UNBOUNDED PRECEDING)``): every
    event carries the user's most recent *purchase* value; rows before
    a user's first purchase stay null.  Output is the per-user audit
    (n_events, n_observed, n_filled, sum of filled cents).

    Scale plan: LOCF composes as a MONOID over ordered segments —
    a segment reduces to (rows, observed-rows, rows-before-first-
    observation, last observed value, filled-count/-sum ignoring
    carry), and ``L ⊕ R`` resolves R's prefix with L's last value —
    so after the (user, ts, event_id) sort each block emits one
    partial per boundary run, complete interior runs finalize
    in-block, and the driver folds only boundary partials in ts
    order (``user_sessions`` discipline: hot users ship O(blocks)
    partial rows, never raw rows)."""
    from ...stages._runs import edge_interior_exchange, edge_mask

    def prep(b: pa.Table) -> pa.Table:
        obs = pc.if_else(pc.equal(b.column("event_type"),
                                  pa.scalar("purchase")),
                         _cents(b.column("value")),
                         pa.nulls(b.num_rows, type=pa.int64()))
        return pa.table({"user_id": b.column("user_id"),
                         "ts_us": pc.cast(b.column("ts"), pa.int64()),
                         "event_id": b.column("event_id"),
                         "obs": obs})

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = (rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "event_id",
                                    "event_type", "value"])
           .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
           .repartition(n_part)
           .sort(["user_id", "ts_us", "event_id"])
           .materialize())

    _PARTIAL = ["user_id", "first_ts", "first_eid", "n", "n_obs", "pre",
                "has_obs", "last_v", "filled_in", "sum_in"]
    _OUT = ["user_id", "n_events", "n_observed", "n_filled", "sum_filled"]

    def _empty(cols) -> pa.Table:
        return pa.table({c: pa.array([], type=pa.int64()) for c in cols})

    def _partials(t: pa.Table) -> dict:
        """One LOCF partial per contiguous user run of ``t`` (vectorized
        per run; runs are already ts-ordered)."""
        from kgray.stages._runs import run_starts
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        obs = t.column("obs").to_numpy(zero_copy_only=False)  # float w/ nan
        valid = pc.is_valid(t.column("obs")).to_numpy(zero_copy_only=False)
        vals = np.where(valid, np.nan_to_num(obs), 0).astype(np.int64)
        starts = run_starts(t.column("user_id"))
        ends = np.append(starts[1:], t.num_rows)
        rows = {c: [] for c in _PARTIAL}
        for s, e in zip(starts, ends):
            m = valid[s:e]
            v = vals[s:e]
            n = e - s
            n_obs = int(m.sum())
            if n_obs:
                idx = np.where(m)[0]
                pre = int(idx[0])
                last_v = int(v[idx[-1]])
                # LOCF within the segment: index of latest obs ≤ i
                carry = np.maximum.accumulate(
                    np.where(m, np.arange(n), -1))
                fmask = carry >= 0
                filled_in = int(fmask.sum())
                sum_in = int(v[carry[fmask]].sum())
            else:
                pre, last_v, filled_in, sum_in = n, 0, 0, 0
            rows["user_id"].append(int(uid[s]))
            rows["first_ts"].append(int(ts[s]))
            rows["first_eid"].append(int(eid[s]))
            rows["n"].append(int(n))
            rows["n_obs"].append(n_obs)
            rows["pre"].append(pre)
            rows["has_obs"].append(1 if n_obs else 0)
            rows["last_v"].append(last_v)
            rows["filled_in"].append(filled_in)
            rows["sum_in"].append(sum_in)
        return rows

    def _finalize(rows: dict) -> pa.Table:
        return pa.table({
            "user_id": pa.array(rows["user_id"], type=pa.int64()),
            "n_events": pa.array(rows["n"], type=pa.int64()),
            "n_observed": pa.array(rows["n_obs"], type=pa.int64()),
            "n_filled": pa.array(rows["filled_in"], type=pa.int64()),
            "sum_filled": pa.array(rows["sum_in"], type=pa.int64())})

    def edge_partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(_PARTIAL)
        e = batch.filter(edge_mask(batch.column("user_id")))
        if e.num_rows == 0:
            return _empty(_PARTIAL)
        return pa.table({c: pa.array(v, type=pa.int64())
                         for c, v in _partials(e).items()})

    def interior(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(_OUT)
        i = batch.filter(pc.invert(edge_mask(batch.column("user_id"))))
        if i.num_rows == 0:
            return _empty(_OUT)
        return _finalize(_partials(i))

    def merge(edge_tables) -> pa.Table:
        t = pa.concat_tables(edge_tables)
        if t.num_rows == 0:
            return _empty(_OUT)
        df = t.to_pandas().sort_values(
            ["user_id", "first_ts", "first_eid"], kind="mergesort")
        out = {c: [] for c in
               ("user_id", "n", "n_obs", "pre", "has_obs", "last_v",
                "filled_in", "sum_in")}

        def flush(acc):
            for c in out:
                out[c].append(acc[c])

        acc = None
        for r in df.itertuples(index=False):
            if acc is None or r.user_id != acc["user_id"]:
                if acc is not None:
                    flush(acc)
                acc = {"user_id": r.user_id, "n": r.n, "n_obs": r.n_obs,
                       "pre": r.pre, "has_obs": r.has_obs,
                       "last_v": r.last_v, "filled_in": r.filled_in,
                       "sum_in": r.sum_in}
                continue
            # acc ⊕ r  (r's prefix resolves with acc's last value)
            if acc["has_obs"]:
                acc["filled_in"] += r.filled_in + r.pre
                acc["sum_in"] += r.sum_in + acc["last_v"] * r.pre
            else:
                acc["pre"] += r.pre
                acc["filled_in"] += r.filled_in
                acc["sum_in"] += r.sum_in
            acc["n"] += r.n
            acc["n_obs"] += r.n_obs
            if r.has_obs:
                acc["last_v"] = r.last_v
                acc["has_obs"] = 1
        flush(acc)
        return _finalize(
            {"user_id": out["user_id"], "n": out["n"],
             "n_obs": out["n_obs"], "filled_in": out["filled_in"],
             "sum_in": out["sum_in"]})

    res = edge_interior_exchange(srt, edge_partials, interior, merge)
    return res.sort("user_id")


def user_credit_balance(sf_dir: str):
    """Clamped running balance per user — prepaid-credit semantics:
    purchases top the account up by their cents, every other event
    costs a flat 500-cent fee, and the balance floors at 0 (the
    non-linear recurrence ``s_i = max(0, s_{i-1} + d_i)``).  Per user:
    event count, peak balance, final balance.

    The scan is non-associative per row but CLOSES into a two-
    parameter max-plus monoid — a delta segment acts on an incoming
    balance as ``f(s) = max(s + a, b)`` with ``(a, b) = (Σd, Σd −
    min prefix)``, and the running peak is the same form ``max(s + pa,
    pb)`` — so boundary runs ship FOUR scalars per (block, user), never
    rows (the `user_sessions` partial discipline; compositions fold in
    block order on the driver).  Interior runs resolve with the closed
    form ``s = P − min(0, cummin P)``, fully vectorized.  The SQL
    mirror is the same closed form as two stacked window functions."""
    from ...stages._runs import (edge_mask, edge_interior_exchange,
                                nullsafe_sort, run_starts)

    NEG = -(1 << 62)
    FEE = 500

    def deltas(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("value")).to_numpy(zero_copy_only=False)
        purch = pc.equal(b.column("event_type"),
                         pa.scalar("purchase")).to_numpy(
                             zero_copy_only=False)
        d = np.where(purch, cents, -FEE).astype(np.int64)
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(b.column("ts"), pa.int64()),
            "event_id": b.column("event_id"),
            "d": pa.array(d)})

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"]
    ).map_batches(deltas, batch_format="pyarrow", zero_copy_batch=True)

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = nullsafe_sort(ds.repartition(n_part),
                        ["user_id", "ts_us", "event_id"]).materialize()

    def _run_summaries(t: pa.Table, starts: np.ndarray):
        """(a, b, pa, pb, n) per run, fully vectorized: with per-run
        prefix sums ``rp``, a = last rp, b = last − min, pa = max rp,
        pb = max(rp − segmented-cummin rp).  The segmented cummin uses
        the per-segment offset trick (earlier segments shifted up by
        ≥BIG so a prefix min never crosses a run boundary), with an
        exact-loop fallback if the shift would overflow int64."""
        d = t.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        ends = np.append(starts[1:], t.num_rows)
        lens = ends - starts
        P = np.cumsum(d)
        off = np.repeat(np.concatenate(([0], P[ends[:-1] - 1])), lens)
        rp = P - off
        a = rp[ends - 1]
        b = a - np.minimum.reduceat(rp, starts)
        pa_ = np.maximum.reduceat(rp, starts)
        seg_id = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        big = int(np.abs(rp).max()) + 1
        if big * (len(starts) + 1) < (1 << 62):
            z = rp - seg_id * big
            segmin = np.minimum.accumulate(z) + seg_id * big
        else:                                   # pragma: no cover
            segmin = np.empty_like(rp)
            for s, e in zip(starts, ends):
                segmin[s:e] = np.minimum.accumulate(rp[s:e])
        pb = np.maximum.reduceat(rp - segmin, starts)
        return a, b, pa_, pb, lens.astype(np.int64)

    def edge_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "ts_us": pa.array([], type=pa.int64()),
            "event_id": pa.array([], type=pa.int64()),
            "a": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
            "pa": pa.array([], type=pa.int64()),
            "pb": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        edge = batch.filter(edge_mask(batch.column("user_id")))
        if edge.num_rows == 0:
            return empty
        starts = run_starts(edge.column("user_id"))
        a, b, pa_, pb, n = _run_summaries(edge, starts)
        take = pa.array(starts, type=pa.int64())
        return pa.table({
            "user_id": edge.column("user_id").take(take),
            "ts_us": edge.column("ts_us").take(take),
            "event_id": edge.column("event_id").take(take),
            "a": pa.array(a), "b": pa.array(b), "pa": pa.array(pa_),
            "pb": pa.array(pb), "n": pa.array(n)})

    out_schema = {
        "user_id": pa.int64(), "n_events": pa.int64(),
        "peak_balance": pa.int64(), "final_balance": pa.int64()}

    def interior(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({k: pa.array([], type=t)
                             for k, t in out_schema.items()})
        inner = batch.filter(pc.invert(edge_mask(batch.column("user_id"))))
        if inner.num_rows == 0:
            return pa.table({k: pa.array([], type=t)
                             for k, t in out_schema.items()})
        starts = run_starts(inner.column("user_id"))
        a, b, pa_, pb, n = _run_summaries(inner, starts)
        take = pa.array(starts, type=pa.int64())
        return pa.table({
            "user_id": inner.column("user_id").take(take),
            "n_events": pa.array(n),
            "peak_balance": pa.array(np.maximum(pa_, pb)),
            "final_balance": pa.array(np.maximum(a, b))})

    def merge(edge_tables) -> pa.Table:
        et = pa.concat_tables(edge_tables, promote_options="permissive")
        idx = pc.sort_indices(et, sort_keys=[("user_id", "ascending"),
                                             ("ts_us", "ascending"),
                                             ("event_id", "ascending")])
        et = et.take(idx)
        users, n_ev, peak, fin = [], [], [], []
        cur = None
        A = B = PA = PB = N = None
        for r in et.to_pylist():
            if r["user_id"] != cur:
                if cur is not None:
                    users.append(cur)
                    n_ev.append(N)
                    peak.append(max(PA, PB))
                    fin.append(max(A, B))
                cur = r["user_id"]
                A, B, PA, PB, N = 0, NEG, NEG, NEG, 0
            a2, b2, pa2, pb2 = r["a"], r["b"], r["pa"], r["pb"]
            PA, PB = max(PA, A + pa2), max(PB, B + pa2, pb2)
            A, B = A + a2, max(B + a2, b2)
            N += r["n"]
        if cur is not None:
            users.append(cur)
            n_ev.append(N)
            peak.append(max(PA, PB))
            fin.append(max(A, B))
        return pa.table({
            "user_id": pa.array(users, type=pa.int64()),
            "n_events": pa.array(n_ev, type=pa.int64()),
            "peak_balance": pa.array(peak, type=pa.int64()),
            "final_balance": pa.array(fin, type=pa.int64())})

    return edge_interior_exchange(srt, edge_partials, interior,
                                  merge).sort("user_id")


