"""Purchase attribution over view/purchase event sequences plus session summaries and retention.

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
    _ATTRIB_ITERS,
    _cents,
    _typed_users,
)
from .events_stats import event_type_transitions


def purchases_except_views_all(sf_dir: str):
    """Bag-semantics EXCEPT ALL: each user_id kept ``max(purchases −
    views, 0)`` times — the multiset difference of two event streams
    (``stages/setops.py`` with ``all_rows=True``; the exchange carries
    distinct rows + multiplicities, never the multiset)."""
    from ...stages.setops import set_op
    return set_op(_typed_users(sf_dir, "purchase"),
                  _typed_users(sf_dir, "view"), "except", all_rows=True)


def purchases_intersect_views_all(sf_dir: str):
    """Bag-semantics INTERSECT ALL: each user_id kept ``min(purchases,
    views)`` times."""
    from ...stages.setops import set_op
    return set_op(_typed_users(sf_dir, "purchase"),
                  _typed_users(sf_dir, "view"), "intersect", all_rows=True)


def weekly_retention(sf_dir: str):
    """Cohort-retention matrix: users grouped by the Monday-aligned
    epoch-week of their FIRST event; for each (cohort_week,
    weeks_since) the count of cohort users active that week.

    Two reduced aggregates — per-user first week, distinct
    (user, active week) — shuffle-joined on user_id, then one count
    aggregate.  Weeks are pure integer day arithmetic (day 0 = epoch
    Thursday, so Monday-start = ``day − ((day + 3) % 7)``), mirrored
    in the oracle rather than relying on engine date_trunc agreement."""
    from ...stages.join import sorted_merge_join

    def prep(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        day = pc.divide(us, pa.scalar(86_400_000_000, type=pa.int64()))
        dow = pc.subtract(day, pc.multiply(
            pc.divide(pc.add(day, pa.scalar(3, type=pa.int64())),
                      pa.scalar(7, type=pa.int64())),
            pa.scalar(7, type=pa.int64())))
        # week start day = day − ((day+3) mod 7); derive mod via the
        # floor-divide identity to keep every operand int64/exact
        week = pc.subtract(day, pc.add(dow, pa.scalar(3, type=pa.int64())))
        return pa.table({"user_id": b.column("user_id"),
                         "week": pc.cast(week, pa.int64())})

    weeks = (rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"])
             .map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True))
    cohort = sorted_group_aggregate(weeks, ["user_id"], [("week", "min")])
    cohort = cohort.map_batches(
        lambda b: b.rename_columns(["user_id", "cohort_week"]),
        batch_format="pyarrow", zero_copy_batch=True)
    active = sorted_group_aggregate(
        weeks.map_batches(lambda b: b.append_column(
            "one", pa.array(np.ones(b.num_rows, dtype=np.int64))),
            batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "week"], [("one", "min")])
    active = active.map_batches(lambda b: b.select(["user_id", "week"]),
                                batch_format="pyarrow", zero_copy_batch=True)
    joined = sorted_merge_join(active, cohort, on="user_id")

    def offs(b: pa.Table) -> pa.Table:
        d = pc.subtract(b.column("week"), b.column("cohort_week"))
        return pa.table({
            "cohort_week": b.column("cohort_week"),
            "weeks_since": pc.cast(pc.divide(
                d, pa.scalar(7, type=pa.int64())), pa.int64()),
            "n_users": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    return sorted_group_aggregate(
        joined.map_batches(offs, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["cohort_week", "weeks_since"], [("n_users", "sum")])


def purchase_view_attribution(sf_dir: str, window_min: int = 60):
    """Ad-attribution interval join: every purchase paired with the
    SAME user's view events in the trailing ``window_min`` minutes
    (inclusive both ends) — the stream-stream windowed join shape.
    Both sides are event-table-sized: neither broadcasts.  The scan is
    pushed (event_type filter + 4-column projection at the read);
    pairing runs through the sorted-run exchange of
    :func:`kgray.stages.intervaljoin.windowed_pair_join` (complete
    user runs pair in-block via two searchsorted + a vectorized
    position explode).  lag_us = purchase.ts - view.ts is exact int64
    microseconds, so the DuckDB BETWEEN-join oracle matches bitwise.
    """
    import pyarrow.dataset as pds

    from ...stages.intervaljoin import windowed_pair_join

    cols = ["event_id", "ts", "user_id"]
    purchases = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=cols,
        filter=pds.field("event_type") == "purchase")
    views = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=cols,
        filter=pds.field("event_type") == "view")
    pairs = windowed_pair_join(purchases, views, key="user_id", ts="ts",
                               id_col="event_id",
                               window=window_min * 60 * 1_000_000)
    return pairs.map_batches(lambda b: pa.table({
        "purchase_id": b.column("left_id"),
        "view_id": b.column("right_id"),
        "user_id": b.column("key"),
        "lag_us": b.column("lag")}),
        batch_format="pyarrow", zero_copy_batch=True)


def purchase_last_touch(sf_dir: str, window_min: int = 1440):
    """Last-touch attribution: for every purchase, the single most
    recent same-user view inside the trailing window — the canonical
    composition of the stream-stream interval join with the per-group
    top-1 exchange (pairs are window-bounded; the top-1 reduces them
    before anything else moves).  Ties at equal lag break to the
    lowest view_id, mirrored in the oracle's ROW_NUMBER ordering.
    """
    from ...stages.topk import grouped_topk

    pairs = purchase_view_attribution(sf_dir, window_min=window_min)
    top = grouped_topk(pairs, group="purchase_id", order_col="lag_us",
                       tiebreak="view_id", k=1, descending=False)
    return top.map_batches(lambda b: b.select(
        ["purchase_id", "view_id", "user_id", "lag_us"]),
        batch_format="pyarrow", zero_copy_batch=True)


def purchase_value_by_engagement(sf_dir: str, hot_threshold: int = 10):
    """Purchase revenue bucketed by the buyer's view-engagement tier —
    a fact×aggregate join routed through ``skew_split_join``
    (`stages/skewjoin.py`): users with ≥ ``hot_threshold`` purchases
    take the broadcast fan-out path (their rows never enter the
    shuffle), the long tail takes the sorted-merge exchange.  The two
    plans are value-identical, so the threshold is purely a
    skew-mitigation knob (at sf0.001 nobody is hot → pure shuffle; at
    sf0.01+ most buyers are hot → mostly broadcast)."""
    from ...stages.skewjoin import skew_split_join

    def prep_purchases(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("event_type"),
                              pa.scalar("purchase")))
        return pa.table({"user_id": t.column("user_id"),
                         "cents": _cents(t.column("value"))})

    def prep_views(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("event_type"), pa.scalar("view")))
        return pa.table({"user_id": t.column("user_id"),
                         "n_views": pa.array(
                             np.ones(t.num_rows, dtype=np.int64))})

    scan = lambda cols: rd.read_parquet(  # noqa: E731
        f"{sf_dir}/events.parquet", columns=cols)
    purchases = scan(["user_id", "event_type", "value"]).map_batches(
        prep_purchases, batch_format="pyarrow", zero_copy_batch=True)
    views = sorted_group_aggregate(
        scan(["user_id", "event_type"]).map_batches(
            prep_views, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], [("n_views", "sum")])

    joined = skew_split_join(purchases, views, on="user_id",
                             hot_threshold=hot_threshold)

    def tiered(b: pa.Table) -> pa.Table:
        return pa.table({
            "tier": pc.divide(b.column("n_views"), pa.scalar(10)),
            "purchase_cents": b.column("cents"),
            "n_purchases": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    agg = sorted_group_aggregate(
        joined.map_batches(tiered, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["tier"], [("purchase_cents", "sum"), ("n_purchases", "sum")])
    return agg.sort("tier")


def session_top_paths(sf_dir: str, gap_us: int = 1_800_000_000,
                      k_top: int = 20, path_len: int = 3):
    """Top session paths — the Sankey/flow table: sessions cut at the
    30-min gap, each session keyed by the '>'-joined sequence of its
    first ``path_len`` event types, counted corpus-wide, top-k by
    (count desc, path).  The per-user ordered pass runs in-block on
    complete user runs; boundary runs ship rows through the standard
    edge/interior exchange (a user's events are session-bounded in
    practice; a pathological hot user ships whole, documented)."""
    from ...stages._runs import edge_interior_exchange, edge_mask

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(b.column("ts"), pa.int64()),
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type")})

    import ray
    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = (rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "event_id",
                                    "event_type"])
           .map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True)
           .repartition(n_part)
           .sort(["user_id", "ts_us", "event_id"])
           .materialize())

    def paths_of(t: pa.Table) -> pa.Table:
        """(path, n) partial over already user-ts-ordered rows."""
        from collections import Counter
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "n_sessions": pa.array([], type=pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ty = t.column("event_type").to_pylist()
        c = Counter()
        cur_u, cur_path, last_ts = None, None, None
        for i in range(len(u)):
            new_user = u[i] != cur_u
            new_sess = new_user or ts[i] - last_ts > gap_us
            if new_sess:
                if cur_path is not None:
                    c[">".join(cur_path)] += 1
                cur_path = [ty[i]]
            elif len(cur_path) < path_len:
                cur_path.append(ty[i])
            cur_u, last_ts = u[i], ts[i]
        if cur_path is not None:
            c[">".join(cur_path)] += 1
        return pa.table({
            "path": pa.array(list(c.keys()), type=pa.string()),
            "n_sessions": pa.array(list(c.values()), type=pa.int64())})

    def edge_fn(batch: pa.Table) -> pa.Table:
        return batch.filter(edge_mask(batch.column("user_id")))

    def interior_fn(batch: pa.Table) -> pa.Table:
        return paths_of(batch.filter(
            pc.invert(edge_mask(batch.column("user_id")))))

    def merge_fn(edge_tables) -> pa.Table:
        rows = pa.concat_tables([t for t in edge_tables if t.num_rows])
        if rows.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "n_sessions": pa.array([], type=pa.int64())})
        rows = rows.take(pc.sort_indices(
            rows, sort_keys=[("user_id", "ascending"),
                             ("ts_us", "ascending"),
                             ("event_id", "ascending")]))
        return paths_of(rows)

    parts = edge_interior_exchange(srt, edge_fn, interior_fn, merge_fn)
    counts = sorted_group_aggregate(parts, ["path"],
                                    [("n_sessions", "sum")])
    return counts.sort(["n_sessions", "path"],
                       descending=[True, False]).limit(k_top)


def purchase_position_attribution(sf_dir: str, window_min: int = 60):
    """Position-based (U-shaped 40/20/40) ad attribution in exact
    integer micro-credits: for each purchase, the trailing-window view
    set splits 400 000 µcredits to the FIRST view, 400 000 to the
    LAST, and the middle 200 000 evenly by integer division with the
    REMAINDER going to the earliest middle view (the deterministic
    rule the oracle mirrors); 1 view takes all 1 000 000, 2 views take
    500 000 each.  Credits then aggregate per view-user.  Pairing is
    the same windowed interval join as last-touch attribution."""
    import pyarrow.dataset as pds

    from ...stages.intervaljoin import windowed_pair_join
    from ...stages.topk import grouped_topk

    cols = ["event_id", "ts", "user_id"]
    purchases = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=cols,
        filter=pds.field("event_type") == "purchase")
    views = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=cols,
        filter=pds.field("event_type") == "view")
    pairs = windowed_pair_join(purchases, views, key="user_id", ts="ts",
                               id_col="event_id",
                               window=window_min * 60 * 1_000_000) \
        .materialize()

    # per purchase: order views by (lag desc = earliest first? lag =
    # purchase.ts - view.ts, so the FIRST (earliest) view has the
    # LARGEST lag; tie-break on view id ascending
    from ...stages.scan import grouped_ranks

    ranked = grouped_ranks(
        pairs.map_batches(lambda b: pa.table({
            "purchase_id": b.column("left_id"),
            "view_id": b.column("right_id"),
            "user_id": b.column("key"),
            "neg_lag": pc.multiply(b.column("lag"),
                                   pa.scalar(-1, type=pa.int64()))}),
            batch_format="pyarrow", zero_copy_batch=True),
        key="purchase_id", order_cols=["neg_lag", "view_id"])

    # rank column: 1-based position, earliest view = 1; group sizes
    sizes = sorted_group_aggregate(
        pairs.map_batches(lambda b: pa.table({
            "purchase_id": b.column("left_id"),
            "n_views": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["purchase_id"], [("n_views", "sum")])

    from ...stages.join import sorted_merge_join
    withn = sorted_merge_join(ranked, sizes, on="purchase_id")

    def credit(b: pa.Table) -> pa.Table:
        r = b.column("row_number").to_numpy(zero_copy_only=False)
        n = b.column("n_views").to_numpy(zero_copy_only=False)
        cr = np.zeros(len(r), dtype=np.int64)
        one = n == 1
        cr[one] = 1_000_000
        two = (n == 2)
        cr[two] = 500_000
        many = n >= 3
        first = many & (r == 1)
        last = many & (r == n)
        mid = many & ~first & ~last
        cr[first] = 400_000
        cr[last] = 400_000
        mshare = np.where(n >= 3, 200_000 // np.maximum(n - 2, 1), 0)
        rem = np.where(n >= 3, 200_000 - mshare * np.maximum(n - 2, 1), 0)
        cr[mid] = mshare[mid]
        cr[mid & (r == 2)] += rem[mid & (r == 2)]
        return pa.table({
            "user_id": b.column("user_id"),
            "view_id": b.column("view_id"),
            "ucredits": pa.array(cr)})

    return sorted_group_aggregate(
        withn.map_batches(credit, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["user_id"], [("ucredits", "sum")], precombine=True)


def session_bounce_rates(sf_dir: str, gap_us: int = 1_800_000_000):
    """Bounce analysis per session ENTRY type: a bounce is a
    single-event session; rate = bounces/sessions as the one mirrored
    float division.  Same in-block/boundary sessionization pass as
    :func:`session_top_paths`, reduced to (entry_type, len==1)
    partials."""
    from ...stages._runs import edge_interior_exchange, edge_mask

    import ray
    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = (rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "event_id",
                                    "event_type"])
           .map_batches(lambda b: pa.table({
               "user_id": b.column("user_id"),
               "ts_us": pc.cast(b.column("ts"), pa.int64()),
               "event_id": b.column("event_id"),
               "event_type": b.column("event_type")}),
               batch_format="pyarrow", zero_copy_batch=True)
           .repartition(n_part)
           .sort(["user_id", "ts_us", "event_id"])
           .materialize())

    def stats_of(t: pa.Table) -> pa.Table:
        from collections import Counter
        if t.num_rows == 0:
            return pa.table({
                "entry_type": pa.array([], type=pa.string()),
                "n_sessions": pa.array([], type=pa.int64()),
                "n_bounces": pa.array([], type=pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        ty = t.column("event_type").to_pylist()
        ns, nb = Counter(), Counter()
        entry, size, cur_u, last = None, 0, None, None
        for i in range(len(u)):
            if u[i] != cur_u or ts[i] - last > gap_us:
                if entry is not None:
                    ns[entry] += 1
                    if size == 1:
                        nb[entry] += 1
                entry, size = ty[i], 1
            else:
                size += 1
            cur_u, last = u[i], ts[i]
        if entry is not None:
            ns[entry] += 1
            if size == 1:
                nb[entry] += 1
        keys = sorted(ns)
        return pa.table({
            "entry_type": pa.array(keys, type=pa.string()),
            "n_sessions": pa.array([ns[k] for k in keys],
                                   type=pa.int64()),
            "n_bounces": pa.array([nb.get(k, 0) for k in keys],
                                  type=pa.int64())})

    def edge_fn(batch: pa.Table) -> pa.Table:
        return batch.filter(edge_mask(batch.column("user_id")))

    def interior_fn(batch: pa.Table) -> pa.Table:
        return stats_of(batch.filter(
            pc.invert(edge_mask(batch.column("user_id")))))

    def merge_fn(edge_tables) -> pa.Table:
        rows = pa.concat_tables([t for t in edge_tables if t.num_rows])
        if rows.num_rows == 0:
            return None
        rows = rows.take(pc.sort_indices(
            rows, sort_keys=[("user_id", "ascending"),
                             ("ts_us", "ascending"),
                             ("event_id", "ascending")]))
        return stats_of(rows)

    parts = edge_interior_exchange(srt, edge_fn, interior_fn, merge_fn)
    agg = sorted_group_aggregate(parts, ["entry_type"],
                                 [("n_sessions", "sum"),
                                  ("n_bounces", "sum")])
    return agg.map_batches(lambda b: b.append_column(
        "bounce_rate", pc.divide(pc.cast(b.column("n_bounces"),
                                         pa.float64()),
                                 pc.cast(b.column("n_sessions"),
                                         pa.float64()))),
        batch_format="pyarrow", zero_copy_batch=True)


def sessions_peak_concurrency(sf_dir: str, gap_us: int = 1_800_000_000):
    """Peak concurrent sessions — the capacity-planning sweep: sessions
    become (+1 at start, −1 at end) deltas; the peak is the max of the
    running sum over (ts, starts-before-ends at ties), and ``at_us`` is
    the EARLIEST instant achieving it.  Session extraction shares the
    sessionization pass; the sweep is one global nullsafe sort + the
    running-sum carry exchange; the argmax is a top-1."""
    from ...stages._runs import edge_interior_exchange, edge_mask
    from ...stages.scan import grouped_running_sum
    from ...stages.topk import grouped_topk

    import ray
    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    srt = (rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts", "event_id"])
           .map_batches(lambda b: pa.table({
               "user_id": b.column("user_id"),
               "ts_us": pc.cast(b.column("ts"), pa.int64()),
               "event_id": b.column("event_id")}),
               batch_format="pyarrow", zero_copy_batch=True)
           .repartition(n_part)
           .sort(["user_id", "ts_us", "event_id"])
           .materialize())

    def intervals_of(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"start_us": pa.array([], type=pa.int64()),
                             "end_us": pa.array([], type=pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        starts, ends = [], []
        cur_u, s0, last = None, None, None
        for i in range(len(u)):
            if u[i] != cur_u or ts[i] - last > gap_us:
                if s0 is not None:
                    starts.append(s0)
                    ends.append(last)
                s0 = ts[i]
            cur_u, last = u[i], ts[i]
        if s0 is not None:
            starts.append(s0)
            ends.append(last)
        return pa.table({
            "start_us": pa.array(starts, type=pa.int64()),
            "end_us": pa.array(ends, type=pa.int64())})

    def edge_fn(batch: pa.Table) -> pa.Table:
        return batch.filter(edge_mask(batch.column("user_id")))

    def interior_fn(batch: pa.Table) -> pa.Table:
        return intervals_of(batch.filter(
            pc.invert(edge_mask(batch.column("user_id")))))

    def merge_fn(edge_tables) -> pa.Table:
        rows = pa.concat_tables([t for t in edge_tables if t.num_rows])
        if rows.num_rows == 0:
            return None
        rows = rows.take(pc.sort_indices(
            rows, sort_keys=[("user_id", "ascending"),
                             ("ts_us", "ascending"),
                             ("event_id", "ascending")]))
        return intervals_of(rows)

    ivals = edge_interior_exchange(srt, edge_fn, interior_fn, merge_fn)

    sweep = ivals.map_batches(lambda b: pa.table({
        "one": pa.array(np.zeros(2 * b.num_rows, dtype=np.int64)),
        "ts_us": pa.chunked_array([
            b.column("start_us").combine_chunks(),
            b.column("end_us").combine_chunks()]),
        # starts sort BEFORE ends at equal ts: order = 0 for +1, 1 for -1
        "kind": pa.array(np.r_[np.zeros(b.num_rows, dtype=np.int64),
                               np.ones(b.num_rows, dtype=np.int64)]),
        "delta": pa.array(np.r_[np.ones(b.num_rows, dtype=np.int64),
                                -np.ones(b.num_rows, dtype=np.int64)])}),
        batch_format="pyarrow", zero_copy_batch=True)

    cum = grouped_running_sum(sweep, "one", ["ts_us", "kind"], "delta",
                              out_name="active")
    top = grouped_topk(
        cum.map_batches(lambda b: pa.table({
            "one": b.column("one"),
            "neg_active": pc.multiply(b.column("active"),
                                      pa.scalar(-1, type=pa.int64())),
            "ts_us": b.column("ts_us")}),
            batch_format="pyarrow", zero_copy_batch=True),
        group="one", order_col="neg_active", tiebreak="ts_us", k=1,
        descending=False)
    return top.map_batches(lambda b: pa.table({
        "peak_sessions": pc.multiply(b.column("neg_active"),
                                     pa.scalar(-1, type=pa.int64())),
        "at_us": b.column("ts_us")}),
        batch_format="pyarrow", zero_copy_batch=True)


def purchase_markov_attribution(sf_dir: str):
    """Markov removal-effect attribution (the data-driven alternative
    to position rules, cf. `purchase_position_attribution`): model each
    user's event stream as a first-order chain where 'purchase' absorbs
    (outgoing transitions from purchase are ignored) and stream ends
    leak to a terminal END state; a channel's credit is how much
    conversion mass vanishes when the channel is REMOVED (flows into it
    drop).  ``removal_effect_micro = 1e6·(conv_full − conv_removed) //
    conv_full``, with conversion mass from ``_ATTRIB_ITERS`` exact
    integer-floor matvec rounds at UNIT=10¹² (the `events_markov_
    stationary` fixed-point discipline — both engines run the SAME
    floored iteration, so the gate is bitwise regardless of
    convergence).

    Scale plan: transition/start/end counts come from the LAG and
    first/last carry exchanges (input-sized, no self-join); the chain
    itself is types²-sized, so the removal loop is driver-side by
    design."""
    from ...stages.scan import grouped_first_last

    trans = {(r["from_type"], r["to_type"]): int(r["n"])
             for r in event_type_transitions(sf_dir).take_all()
             if r["from_type"] != "purchase"}

    base = (rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "ts",
                                     "event_type"])
            .map_batches(lambda b: pa.table({
                "user_id": b.column("user_id"),
                "event_id": b.column("event_id"),
                "ev_us": pc.cast(b.column("ts"), pa.int64()),
                "event_type": b.column("event_type")}),
                batch_format="pyarrow", zero_copy_batch=True))
    fl = grouped_first_last(base, key="user_id",
                            order_cols=["ev_us", "event_id"],
                            value_col="event_type",
                            first_name="first_type",
                            last_name="last_type")
    per_user = sorted_group_aggregate(
        fl.map_batches(lambda b: pa.table({
            "user_id": b.column("user_id"),
            "first_type": b.column("first_type"),
            "last_type": b.column("last_type")}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], [("first_type", "min"), ("last_type", "min")],
        precombine=True).take_all()

    starts, ends = {}, {}
    for r in per_user:
        starts[r["first_type"]] = starts.get(r["first_type"], 0) + 1
        if r["last_type"] != "purchase":
            ends[r["last_type"]] = ends.get(r["last_type"], 0) + 1

    # full transition table incl. END leaks + the purchase self-loop
    # (the retention row that lets one generic matvec express
    # absorption — mirrored verbatim in the SQL oracle)
    tbl = dict(trans)
    for ft, n in ends.items():
        tbl[(ft, "__END__")] = tbl.get((ft, "__END__"), 0) + n
    tbl[("purchase", "purchase")] = 1
    rowsum = {}
    for (f, _t), n in tbl.items():
        rowsum[f] = rowsum.get(f, 0) + n
    # transitions quantized to probability micro-units ONCE, so every
    # per-step product mass·p_fp stays ≤ 10¹²·10⁶ < 2⁶³ regardless of
    # corpus size (raw mass·count would overflow the SQL mirror's
    # BIGINT at ~10⁷-count transitions)
    p_fp = {ft: 10**6 * n // rowsum[ft[0]] for ft, n in tbl.items()}

    total_starts = sum(starts.values())
    channels = sorted(
        r["event_type"]
        for r in sorted_group_aggregate(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type"]).map_batches(
                lambda b: pa.table({
                    "event_type": b.column("event_type"),
                    "c": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
                batch_format="pyarrow", zero_copy_batch=True),
            ["event_type"], [("c", "sum")]).take_all()
        if r["event_type"] != "purchase")

    def converge(removed: str) -> int:
        mass = {s: (10**6 * n // total_starts) * 10**6
                for s, n in starts.items() if s != removed}
        for _ in range(_ATTRIB_ITERS):
            nxt = {}
            for (f, t), p in p_fp.items():
                if f == removed or t == removed or t == "__END__":
                    continue
                m = mass.get(f, 0)
                if m:
                    nxt[t] = nxt.get(t, 0) + m * p // 10**6
            mass = nxt
        return mass.get("purchase", 0)

    full = converge("__none__")
    out_ch, out_rm = [], []
    for c in channels:
        out_ch.append(c)
        out_rm.append(converge(c))
    return pa.table({
        "channel": pa.array(out_ch, type=pa.string()),
        "conv_full_fp": pa.array([full] * len(out_ch), type=pa.int64()),
        "conv_removed_fp": pa.array(out_rm, type=pa.int64()),
        "removal_effect_micro": pa.array(
            [0 if full == 0 else 10**6 * (full - r) // full
             for r in out_rm], type=pa.int64())})


