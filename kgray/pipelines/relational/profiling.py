"""Dataset profiling and alternate-source readers: key inference, FD/quality audits, format twins (csv/orc/xml/hive/sqlite/logs).

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
    _FK_CANDIDATES,
    _canonical_url,
    _cents,
)


def type_user_counts(sf_dir: str):
    """Distributed COUNT(DISTINCT): users per event type via two-level
    aggregation — distinct (type, user) pairs first (map-side combined),
    then a count per type.  The shuffle carries distinct pairs, never
    raw events; no driver-side set."""
    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch.column("event_type"),
                      "user_id": batch.column("user_id")})
        g = t.group_by(["event_type", "user_id"], use_threads=False) \
             .aggregate([])
        return g.append_column(
            "n_users", pa.array(np.ones(g.num_rows, dtype=np.int64)))

    pairs = (rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "user_id"])
             .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))
    distinct = sorted_group_aggregate(pairs, ["event_type", "user_id"],
                                      [("n_users", "min")])
    # one row per distinct pair → count per type
    return sorted_group_aggregate(distinct.drop_columns(["user_id"]),
                                  "event_type", [("n_users", "sum")])


def type_value_mode(sf_dir: str):
    """Per-group MODE with a deterministic tie rule (most frequent
    cents value per event type; ties -> smallest value).  Pure
    composition: one distributed count aggregate at (type, value)
    grain, then the grouped_topk exchange at k=1 over the REDUCED
    output (count desc, value asc) — the input is touched once."""
    from ...stages.topk import grouped_topk

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "value"])
    cents = events.map_batches(lambda b: pa.table({
        "event_type": b.column("event_type"),
        "cents": _cents(b.column("value")),
        "n": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)
    counts = sorted_group_aggregate(cents, ["event_type", "cents"],
                                    [("n", "sum")])
    top = grouped_topk(counts, group="event_type", order_col="n",
                       tiebreak="cents", k=1)
    return top.map_batches(lambda b: pa.table({
        "event_type": b.column("event_type"),
        "mode_cents": b.column("cents"),
        "mode_n": b.column("n")}),
        batch_format="pyarrow", zero_copy_batch=True)


def bucketed_order_revenue(sf_dir: str, n_buckets: int = 32):
    """``order_priority_revenue``'s shuffle-free twin on a co-bucketed
    layout (see ``stages/bucketed.py``): lineitem and orders are each
    written ONCE as ``bucket=<orderkey % B>/`` parquet, then every
    bucket pair joins locally inside one task — zero exchange at query
    time.  Co-location also makes ``COUNT(DISTINCT orderkey)`` exact as
    a plain SUM of per-bucket local distinct counts (a key lives in
    exactly one bucket), so the output adds an ``n_orders`` column the
    shuffle plan would need a second exchange for.

    The layout is cached per sf_dir under /tmp — the 100-TB reading is
    that the bucketed write is amortized across every orderkey join in
    the workload, which is exactly why warehouses bucket fact tables."""
    import hashlib as _hl
    import os as _os

    from ...stages.bucketed import bucketed_join, write_bucketed

    tag = _hl.md5(f"{_os.path.realpath(sf_dir)}|{n_buckets}|v1"
                  .encode()).hexdigest()[:16]
    root = f"/tmp/kgray_buckets/{tag}"
    _os.makedirs(root, exist_ok=True)

    def prep_li(b: pa.Table) -> pa.Table:
        revenue = pc.multiply(b.column("l_extendedprice"),
                              pc.subtract(pa.scalar(1.0),
                                          b.column("l_discount")))
        return pa.table({"orderkey": b.column("l_orderkey"),
                         "revenue_cents": _cents(revenue)})

    li_dir = _os.path.join(root, "lineitem")
    if not _os.path.isdir(li_dir):
        li = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_extendedprice",
                                       "l_discount"])
              .map_batches(prep_li, batch_format="pyarrow",
                           zero_copy_batch=True))
        write_bucketed(li, "orderkey", li_dir, n_buckets)

    ord_dir = _os.path.join(root, "orders")
    if not _os.path.isdir(ord_dir):
        orders = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                                  columns=["o_orderkey", "o_orderpriority"])
                  .map_batches(lambda b: pa.table({
                      "orderkey": b.column("o_orderkey"),
                      "o_orderpriority": b.column("o_orderpriority")}),
                      batch_format="pyarrow", zero_copy_batch=True))
        write_bucketed(orders, "orderkey", ord_dir, n_buckets)

    def per_bucket(j: pa.Table) -> pa.Table:
        g = j.group_by("o_orderpriority").aggregate(
            [("revenue_cents", "sum"), ("revenue_cents", "count"),
             ("orderkey", "count_distinct")])
        return pa.table({
            "o_orderpriority": g.column("o_orderpriority"),
            "revenue_cents": pc.cast(g.column("revenue_cents_sum"),
                                     pa.int64()),
            "n_items": pc.cast(g.column("revenue_cents_count"), pa.int64()),
            "n_orders": pc.cast(g.column("orderkey_count_distinct"),
                                pa.int64())})

    partials = bucketed_join(li_dir, ord_dir, on="orderkey",
                             n_buckets=n_buckets, per_bucket=per_bucket)
    return sorted_group_aggregate(partials, "o_orderpriority",
                                  [("revenue_cents", "sum"),
                                   ("n_items", "sum"), ("n_orders", "sum")],
                                  precombine=False)


def csv_event_stats(sf_dir: str):
    """Per-event-type totals computed over the CSV twin of the events
    table (``sources/csvsrc.py``) — same SQL oracle as over the
    parquet view, so the driver's value hash proves CSV source parity
    end-to-end (sharded read → typed parse → cents kernel →
    distributed aggregate)."""
    from ...sources.csvsrc import events_to_csv, read_events_csv

    ds = read_events_csv(events_to_csv(sf_dir))

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b.column("event_type"),
            "value_cents": _cents(b.column("value")),
            "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    return sorted_group_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "event_type", [("value_cents", "sum"), ("n_events", "sum")],
        precombine=True)


def logline_stats(sf_dir: str):
    """Raw-log ingest: unstructured text lines (``sources/textlog.py``,
    a deterministic twin of the events table) streamed with
    ``read_text``, parsed by one vectorized RE2 kernel, then the usual
    exact-cents aggregate per event type.  Oracled by the same SQL over
    the parquet view — proving read_text → regex-parse source parity."""
    from ...sources.textlog import events_to_log, read_events_log

    ds = read_events_log(events_to_log(sf_dir))

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b.column("event_type"),
            "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "value_cents": _cents(b.column("value")),
            "max_user": b.column("user_id")})

    return sorted_group_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "event_type",
        [("n_events", "sum"), ("value_cents", "sum"), ("max_user", "max")])


def evolved_event_stats(sf_dir: str):
    """Per-type totals over the schema-EVOLVED events directory
    (``sources/evolve.py``: epoch 0 lacks the ``props`` column, epoch 1
    has it): the evolution-tolerant reader conforms both epochs to the
    union schema (missing → typed nulls), and ``n_props`` counts
    non-null props — nulls appearing exactly where the old schema had
    no column.  The oracle reproduces the epoch rule over the original
    parquet view (``event_id % 3``), so the driver's value hash proves
    the union-by-name semantics end-to-end."""
    from ...sources.evolve import events_to_evolved, read_events_evolved

    ds = read_events_evolved(events_to_evolved(sf_dir),
                             columns=["event_type", "value", "props"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b.column("event_type"),
            "value_cents": _cents(b.column("value")),
            "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "n_props": pc.cast(pc.invert(pc.is_null(b.column("props"))),
                               pa.int64())})

    return sorted_group_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "event_type", [("value_cents", "sum"), ("n_events", "sum"),
                       ("n_props", "sum")])


def sqlite_event_stats(sf_dir: str):
    """Per-event-type totals computed over the SQLite twin of the
    events table (``sources/sqlitesrc.py``) — same SQL oracle as over
    the parquet view, so the driver's value hash proves SQLite source
    parity end-to-end (per-shard-file read tasks → typed decode →
    cents kernel → distributed aggregate)."""
    from ...sources.sqlitesrc import events_to_sqlite, read_events_sqlite

    ds = read_events_sqlite(events_to_sqlite(sf_dir))

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b.column("event_type"),
            "value_cents": _cents(b.column("value")),
            "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    return sorted_group_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "event_type", [("value_cents", "sum"), ("n_events", "sum")],
        precombine=True)


def orc_order_stats(sf_dir: str):
    """Per-priority order totals computed over the ORC twin of the
    orders table (``sources/orcsrc.py`` — the Hive/Spark lakehouse
    interchange format, 8th ingest format) — same SQL oracle as over
    the parquet view, so the driver's value hash proves ORC source
    parity end-to-end (per-shard-file decode tasks with projection
    pushed into the stripe read → cents kernel → distributed
    aggregate)."""
    from ...sources.orcsrc import orders_to_orc, read_orders_orc

    ds = read_orders_orc(orders_to_orc(sf_dir),
                         columns=["o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "price_cents": _cents(b.column("o_totalprice")),
            "n_orders": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    return sorted_group_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "o_orderpriority", [("price_cents", "sum"), ("n_orders", "sum")],
        precombine=True)


def hive_event_stats(sf_dir: str, event_type: str = "purchase"):
    """Per-user totals for ONE event type over the hive-partitioned
    twin of the events table (``sources/hivesrc.py``) — the partition
    predicate is satisfied by DIRECTORY pruning (files of the other
    four event types are never listed or opened; asserted by the
    layout test).  Same SQL oracle as a WHERE filter over the flat
    parquet view, so the driver's value hash proves the pruned hive
    read is value-identical to the full-scan plan."""
    from ...sources.hivesrc import events_to_hive, read_events_hive

    ds = read_events_hive(events_to_hive(sf_dir), values=[event_type],
                          columns=["user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "value_cents": _cents(b.column("value")),
            "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    return sorted_group_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "user_id", [("value_cents", "sum"), ("n_events", "sum")],
        precombine=True)


def xml_event_stats(sf_dir: str):
    """Per-type value totals over the XML twin of the events table —
    the 8th ingest format (``sources/xmlsrc.py``; stdlib
    ``xml.etree``, one decode task per shard file).  Same stats shape
    as the CSV/SQLite/ORC twins, so the SAME SQL over the parquet view
    oracles the whole source path (parity via the driver's value
    hash)."""
    from ...sources.xmlsrc import events_to_xml, read_events_xml

    xml_dir = events_to_xml(sf_dir)
    ev = read_events_xml(xml_dir)

    def prep(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b.column("event_type"),
            "value_cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64)),
            "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    return sorted_group_aggregate(
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"], [("value_cents", "sum"), ("n_events", "sum")],
        precombine=True)


def token_trending(sf_dir: str, k_top: int = 25):
    """Trending-terms detection between two corpus windows (md5-split
    halves standing in for time windows): per token, counts in window
    A and B and the smoothed ratio ``(cB+1)/(cA+1)``, top-k by (ratio
    desc, token).  The count exchange is ONE aggregate over
    (window, token) partials; the ratio is float(int)/float(int) —
    the `copurchase_pmi` ADVICE discipline — so ranking is bitwise."""
    from ...functions.sampling import _md5_bucket

    def prep(b: pa.Table) -> pa.Table:
        out_t, out_a, out_b = [], [], []
        for did, txt in zip(b.column("doc_id").to_pylist(),
                            b.column("text").to_pylist()):
            w = int(_md5_bucket([did], 2)[0])
            for tok in txt.split():
                out_t.append(tok)
                out_a.append(1 - w)
                out_b.append(w)
        return pa.table({
            "token": pa.array(out_t, type=pa.string()),
            "c_a": pa.array(out_a, type=pa.int64()),
            "c_b": pa.array(out_b, type=pa.int64())})

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    counts = sorted_group_aggregate(
        docs.map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["token"], [("c_a", "sum"), ("c_b", "sum")], precombine=True)

    def score(b: pa.Table) -> pa.Table:
        ca = b.column("c_a").to_pylist()
        cb = b.column("c_b").to_pylist()
        r = [float(y + 1) / float(x + 1) for x, y in zip(ca, cb)]
        return b.append_column("trend_ratio",
                               pa.array(r, type=pa.float64()))

    return (counts.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)
            .sort(["trend_ratio", "token"], descending=[True, False])
            .limit(k_top))


def doc_novelty_scores(sf_dir: str, k: int = 3):
    """Per-document n-gram novelty — the diversity signal a curation
    pipeline uses to prefer fresh content over boilerplate: a doc's
    novelty is the fraction of its DISTINCT k-shingles whose earliest
    corpus occurrence (min doc_id) is the doc itself.  One posting
    exchange (distinct (gram, doc)), one min-aggregate for first
    occurrence, one join back, one per-doc reduce — first-occurrence
    attribution is exactly the C4-style dedup-lines plan pointed at
    shingles."""
    from ...stages.join import sorted_merge_join

    def postings(b: pa.Table) -> pa.Table:
        ids, gr = [], []
        for did, t in zip(b.column("doc_id").to_pylist(),
                          b.column("text").to_pylist()):
            toks = t.split()
            for i in range(len(toks) - k + 1):
                ids.append(did)
                gr.append(" ".join(toks[i:i + k]))
        tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                        "gram": pa.array(gr, type=pa.string())})
        # distinct within the batch; global distinct via the aggregate
        return tbl.group_by(["doc_id", "gram"]).aggregate([])

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    post = sorted_group_aggregate(
        docs.map_batches(postings, batch_format="pyarrow",
                         zero_copy_batch=True).map_batches(
            lambda b: b.append_column(
                "one", pa.array(np.ones(b.num_rows, dtype=np.int64))),
            batch_format="pyarrow"),
        ["gram", "doc_id"], [("one", "min")]).drop_columns(["one"]) \
        .materialize()

    first = sorted_group_aggregate(
        post.map_batches(lambda b: pa.table({
            "gram": b.column("gram"), "first_doc": b.column("doc_id")}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["gram"], [("first_doc", "min")])

    joined = sorted_merge_join(post, first, on="gram")
    return sorted_group_aggregate(
        joined.map_batches(lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "n_grams": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "n_novel": pc.cast(pc.equal(b.column("doc_id"),
                                        b.column("first_doc")),
                               pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["doc_id"], [("n_grams", "sum"), ("n_novel", "sum")],
        precombine=True)


def vocab_growth_curve(sf_dir: str):
    """Heaps'-law vocabulary growth: distinct tokens seen after the
    first k docs, at ten doc-id decile checkpoints — how a curation
    team decides whether a corpus is still adding novelty or just
    repeating itself.  Scale shape: checkpoint values are exact doc-id
    deciles (quantile machinery); per-doc token counts and per-token
    first occurrences (min doc_id — the dedup-lines plan) each bucket
    to their first checkpoint DISTRIBUTED; only the ten-row prefix
    fold runs on the driver."""
    from ...stages.quantile import grouped_quantiles

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    stats = docs.map_batches(lambda b: pa.table({
        "g": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
        "doc_id": b.column("doc_id"),
        "n_tokens": pa.array(
            [len(t.split()) for t in b.column("text").to_pylist()],
            type=pa.int64())}), batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    qs = [i / 10 for i in range(1, 11)]
    qrow = grouped_quantiles(stats, group="g", value_col="doc_id",
                             qs=qs,
                             out_names=[f"c{i}" for i in range(1, 11)]) \
        .take_all()[0]
    cuts = sorted({int(qrow[f"c{i}"]) for i in range(1, 11)})
    cut_arr = np.array(cuts, dtype=np.int64)
    c_ref = ray.put(cut_arr)

    def bucket(col):
        def fn(b: pa.Table) -> pa.Table:
            cu = ray.get(c_ref)
            v = b.column(col).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(cu, v, side="left")
            t = pa.table({"ckpt": pa.array(cu[idx], type=pa.int64())})
            for name in b.schema.names:
                if name not in ("g", col):
                    t = t.append_column(name, b.column(name))
            return t.append_column(
                "n", pa.array(np.ones(b.num_rows, dtype=np.int64)))
        return fn

    doc_agg = sorted_group_aggregate(
        stats.map_batches(bucket("doc_id"), batch_format="pyarrow",
                          zero_copy_batch=True),
        ["ckpt"], [("n", "sum"), ("n_tokens", "sum")],
        precombine=True).take_all()

    def postings(b: pa.Table) -> pa.Table:
        ids, toks = [], []
        for did, t in zip(b.column("doc_id").to_pylist(),
                          b.column("text").to_pylist()):
            for tok in set(t.split()):
                ids.append(did)
                toks.append(tok)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "token": pa.array(toks, type=pa.string())})

    first = sorted_group_aggregate(
        docs.map_batches(postings, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["token"], [("doc_id", "min")], precombine=True)
    voc_agg = sorted_group_aggregate(
        first.map_batches(bucket("doc_id"), batch_format="pyarrow",
                          zero_copy_batch=True)
        .map_batches(lambda b: b.select(["ckpt", "n"]),
                     batch_format="pyarrow"),
        ["ckpt"], [("n", "sum")]).take_all()

    nd = {int(r["ckpt"]): (int(r["n"]), int(r["n_tokens"]))
          for r in doc_agg}
    nv = {int(r["ckpt"]): int(r["n"]) for r in voc_agg}
    out_c, out_d, out_t, out_v = [], [], [], []
    cd = ct = cv = 0
    for cut in cuts:
        d, t = nd.get(cut, (0, 0))
        cd += d
        ct += t
        cv += nv.get(cut, 0)
        out_c.append(cut)
        out_d.append(cd)
        out_t.append(ct)
        out_v.append(cv)
    return pa.table({
        "checkpoint_doc": pa.array(out_c, type=pa.int64()),
        "n_docs": pa.array(out_d, type=pa.int64()),
        "cum_tokens": pa.array(out_t, type=pa.int64()),
        "distinct_tokens": pa.array(out_v, type=pa.int64())})


def join_key_inference(sf_dir: str):
    """Join-key (foreign-key) discovery — the data-profiling pass a
    catalog runs before suggesting joins: for each candidate directed
    column pair, the distinct counts of both sides, the intersection
    size, and the inclusion coefficient in integer ppm
    (``1e6·|child∩parent| // |child|``; 1e6 ⇒ the child's value set is
    fully contained, i.e. a plausible FK).  Candidates mix true FKs
    with a reverse pair and a noise pair.

    Plan: ONE tagged exchange — every side's per-block distinct values
    union into (pair_id, val, s1, s2) presence rows, a single
    (pair_id, val) max-aggregate resolves presence, and the pair-level
    counts are a second (tiny) aggregate.  No per-pair joins, no
    driver-side value sets; driver assembly touches only the 6-row
    result."""
    # ONE scan per table (not per pair-side): each block emits the
    # per-block distinct values for EVERY (pair, side) its table feeds
    # — 5 reads instead of 12, and the union stays narrow (a 12-way
    # union of per-file fragment reads measured 12 s of pure task
    # overhead for 163k rows at sf0.01)
    by_table = {}
    for pid, (ct, cc, pt, pc_) in enumerate(_FK_CANDIDATES):
        by_table.setdefault(ct, []).append((pid, cc, 1))
        by_table.setdefault(pt, []).append((pid, pc_, 0))

    sides = None
    for table, specs in sorted(by_table.items()):
        cols = sorted({c for _, c, _s in specs})

        def block(b: pa.Table, _specs=tuple(specs)) -> pa.Table:
            parts = []
            for pid, col, s1 in _specs:
                v = pc.unique(pc.cast(b.column(col), pa.int64()))
                v = v.drop_null()
                n = len(v)
                parts.append(pa.table({
                    "pair_id": pa.array(np.full(n, pid, dtype=np.int64)),
                    "val": v,
                    "s1": pa.array(np.full(n, s1, dtype=np.int64)),
                    "s2": pa.array(np.full(n, 1 - s1,
                                           dtype=np.int64))}))
            return pa.concat_tables(parts)

        part = rd.read_parquet(f"{sf_dir}/{table}.parquet",
                               columns=cols).map_batches(
            block, batch_format="pyarrow", zero_copy_batch=True)
        sides = part if sides is None else sides.union(part)

    # the 12-way union inherits every read's block count — bound the
    # exchange width before sorting (NOTES fact #2) or the aggregate
    # pays per-partition fixed costs twelve times over
    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    presence = sorted_group_aggregate(
        sides.repartition(n_part),
        ["pair_id", "val"], [("s1", "max"), ("s2", "max")],
        precombine=True)

    def pair_partial(b: pa.Table) -> pa.Table:
        s1 = b.column("s1").to_numpy()
        s2 = b.column("s2").to_numpy()
        return pa.table({
            "pair_id": b.column("pair_id"),
            "n_child": pa.array(s1, type=pa.int64()),
            "n_parent": pa.array(s2, type=pa.int64()),
            "n_contained": pa.array(s1 * s2, type=pa.int64())})

    counts = sorted_group_aggregate(
        presence.map_batches(pair_partial, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["pair_id"],
        [("n_child", "sum"), ("n_parent", "sum"), ("n_contained", "sum")],
        precombine=True).sort("pair_id")

    t = pa.concat_tables([x for x in ray.get(counts.to_arrow_refs())
                          if x.num_rows])
    t = t.sort_by("pair_id")
    pid = t.column("pair_id").to_pylist()
    nch = t.column("n_child").to_pylist()
    ncon = t.column("n_contained").to_pylist()
    return pa.table({
        "pair_id": pa.array(pid, type=pa.int64()),
        "child_table": pa.array([_FK_CANDIDATES[i][0] for i in pid]),
        "child_col": pa.array([_FK_CANDIDATES[i][1] for i in pid]),
        "parent_table": pa.array([_FK_CANDIDATES[i][2] for i in pid]),
        "parent_col": pa.array([_FK_CANDIDATES[i][3] for i in pid]),
        "n_child_distinct": t.column("n_child"),
        "n_parent_distinct": t.column("n_parent"),
        "n_contained": t.column("n_contained"),
        "containment_ppm": pa.array(
            [1_000_000 * c // n if n else 0
             for c, n in zip(ncon, nch)], type=pa.int64())})


def url_canonical_dedup(sf_dir: str):
    """Canonical-URL deduplication — the crawl-frontier normalizer:
    scheme/host case, default ports, trailing slashes, fragments and
    utm_* tracking params all alias the same resource; grouping on the
    canonical form collapses them.  The synthetic URL set is derived
    from order keys (clean URL per key; md5 bucket < 200 keys also
    emit an uppercase-host:443 twin and a utm+fragment twin, so ~20%
    of canonical groups have 3 variants) — the injection discipline of
    `pii_scrub`/`fk_orphan_audit`, giving a full operand-mirrored SQL
    oracle.

    Plan: variant synthesis and normalization are stateless per-batch
    maps (URL string surgery is per-row by nature, like hashing); the
    dedup itself is one groupby on the canonical key."""
    from ...functions.sampling import _md5_bucket

    def variants(b: pa.Table) -> pa.Table:
        keys = b.column("o_orderkey").to_pylist()
        h = _md5_bucket(keys, 1000)
        urls = []
        for k, hb in zip(keys, h):
            urls.append(f"https://shop.example.com/item/{k}")
            if hb < 200:
                # both collapse into the clean group (3 variants)
                urls.append(
                    f"HTTPS://SHOP.Example.COM:443/item/{k}/")
                urls.append(f"https://shop.example.com/item/{k}"
                            f"?utm_source=feed&utm_id=9#sec")
            if hb < 100:
                # a param-order pair: both canonicalize to ?a=1&b=2
                # (their own group of 2 — the sort is load-bearing)
                urls.append(f"https://shop.example.com/item/{k}?b=2&a=1")
                urls.append(
                    f"https://shop.example.com/item/{k}?a=1&b=2#x")
        return pa.table({"url": pa.array(urls, type=pa.string())})

    def canon(b: pa.Table) -> pa.Table:
        us = b.column("url").to_pylist()
        return pa.table({
            "canonical_url": pa.array([_canonical_url(u) for u in us],
                                      type=pa.string()),
            "n_variants": pa.array(np.ones(len(us), dtype=np.int64)),
            "first_url": b.column("url")})

    ds = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey"])
          .map_batches(variants, batch_format="pyarrow",
                       zero_copy_batch=True)
          .map_batches(canon, batch_format="pyarrow",
                       zero_copy_batch=True))
    return sorted_group_aggregate(
        ds, ["canonical_url"],
        [("n_variants", "sum"), ("first_url", "min")],
        precombine=True).sort("canonical_url")


