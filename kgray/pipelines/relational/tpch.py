"""Classic decision-support joins over customer/supplier/nation/region (TPC-H Q-shapes) and priority/status pivots.

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
    _copurchase_pair_counts,
    _orders_by_cust_date,
    _unpack_pair,
)


def top_customers(sf_dir: str, k: int = 10):
    """Vectorized broadcast join orders→customer
    (``stages/broadcast.py``: one searchsorted per batch, no per-row
    Python) + groupby + deterministic top-k."""
    from ...stages.broadcast import broadcast_join

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch.column("o_custkey"),
            "total_cents": _cents(batch.column("o_totalprice")),
            "n_orders": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })

    prepped = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])
               .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))
    joined = broadcast_join(prepped, cust, on="c_custkey")
    agg = sorted_group_aggregate(joined, ["c_custkey", "c_name"],
                                 [("total_cents", "sum"), ("n_orders", "sum")])
    return agg.sort(["total_cents", "c_custkey"], descending=[True, False]).limit(k)


def supplier_nation_counts(sf_dir: str):
    """Two-hop broadcast join supplier→nation→region: the two dimension
    tables are pre-joined once on the driver (both tiny), then one
    vectorized broadcast_join enriches the streaming supplier scan."""
    from ...stages.broadcast import broadcast_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    dim = (nation.join(region, keys="n_regionkey", right_keys="r_regionkey")
           .select(["n_nationkey", "n_name", "r_name"])
           .rename_columns(["s_nationkey", "n_name", "r_name"]))

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "s_nationkey": batch.column("s_nationkey"),
            "acctbal_cents": _cents(batch.column("s_acctbal")),
            "n_suppliers": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })

    prepped = (rd.read_parquet(f"{sf_dir}/supplier.parquet",
                               columns=["s_nationkey", "s_acctbal"])
               .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))
    joined = broadcast_join(prepped, dim, on="s_nationkey")
    return sorted_group_aggregate(
        joined.drop_columns(["s_nationkey"]), ["n_name", "r_name"],
        [("n_suppliers", "sum"), ("acctbal_cents", "sum")])


def distinct_segments(sf_dir: str):
    """Distinct market segments (set op) as a one-column table."""
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(vals, type=pa.string())})


def priority_top_orders(sf_dir: str, k: int = 3):
    """Per-group top-k (the ROW_NUMBER window pattern): the k highest-
    value orders per order priority, rank included — ``stages/topk.py``.
    Money in integer cents; ties broken by orderkey ascending, so the
    ranking is total and matches the SQL oracle bit-for-bit."""
    from ...stages.topk import grouped_topk

    prepped = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_orderpriority",
                                        "o_totalprice"])
               .map_batches(lambda b: pa.table({
                   "o_orderpriority": b.column("o_orderpriority"),
                   "o_orderkey": b.column("o_orderkey"),
                   "total_cents": _cents(b.column("o_totalprice"))}),
                   batch_format="pyarrow", zero_copy_batch=True))
    return grouped_topk(prepped, group="o_orderpriority",
                        order_col="total_cents", tiebreak="o_orderkey",
                        k=k, descending=True)


def customers_no_urgent_orders(sf_dir: str):
    """Distributed anti-join (SQL NOT EXISTS) via ``stages/semijoin.py``:
    customers with no '1-URGENT' order — large×large shape, right side
    shuffled as distinct keys only."""
    from ...stages.semijoin import semi_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_mktsegment"])
    urgent = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderpriority"])
              .map_batches(lambda b: pa.table({
                  "c_custkey": b.filter(
                      pc.equal(b.column("o_orderpriority"),
                               pa.scalar("1-URGENT"))).column("o_custkey")}),
                  batch_format="pyarrow", zero_copy_batch=True))
    return semi_join(cust, urgent, on="c_custkey", anti=True)


def priority_status_pivot(sf_dir: str):
    """Distributed PIVOT: per order priority, order counts and total
    value (cents) per order status — ``stages/pivot.py`` (one-hot
    conditional aggregation, map-side combined)."""
    from ...stages.pivot import pivot_aggregate

    prepped = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderpriority", "o_orderstatus",
                                        "o_totalprice"])
               .map_batches(lambda b: pa.table({
                   "o_orderpriority": b.column("o_orderpriority"),
                   "o_orderstatus": b.column("o_orderstatus"),
                   "total_cents": _cents(b.column("o_totalprice"))}),
                   batch_format="pyarrow", zero_copy_batch=True))
    return pivot_aggregate(prepped, group="o_orderpriority",
                           pivot_col="o_orderstatus",
                           categories=["F", "O", "P"],
                           value_col="total_cents")


def customer_order_ranks(sf_dir: str):
    """RANK / DENSE_RANK per customer over order dates
    (``stages/scan.py:grouped_ranks``).  Dates tie (day granularity),
    so ROW_NUMBER is order-dependent and intentionally NOT part of the
    result — rank/dense_rank are well-defined under ties."""
    from ...stages.scan import grouped_ranks

    ranked = grouped_ranks(_orders_by_cust_date(sf_dir),
                           key="o_custkey", order_cols=["date_us"])
    return ranked.map_batches(lambda b: pa.table({
        "o_custkey": b.column("o_custkey"),
        "o_orderkey": b.column("o_orderkey"),
        "date_rank": b.column("rank"),
        "date_dense_rank": b.column("dense_rank")}),
        batch_format="pyarrow", zero_copy_batch=True)


def customer_order_seq(sf_dir: str):
    """ROW_NUMBER per customer over the total order
    (o_orderdate, o_orderkey) — deterministic because the order is
    total (unique tiebreak), matching the SQL window exactly."""
    from ...stages.scan import grouped_ranks

    ranked = grouped_ranks(_orders_by_cust_date(sf_dir),
                           key="o_custkey",
                           order_cols=["date_us", "o_orderkey"])
    return ranked.map_batches(lambda b: pa.table({
        "o_custkey": b.column("o_custkey"),
        "o_orderkey": b.column("o_orderkey"),
        "seq": b.column("row_number")}),
        batch_format="pyarrow", zero_copy_batch=True)


def customer_order_quartiles(sf_dir: str):
    """NTILE(4) / PERCENT_RANK / CUME_DIST per customer over the total
    order (o_orderdate, o_orderkey) — ``stages/scan.py:
    grouped_ntile_stats`` (ranks exchange + size/peer aggregates +
    merge join; float columns are single IEEE divisions, bitwise vs
    the SQL window functions)."""
    from ...stages.scan import grouped_ntile_stats

    stats = grouped_ntile_stats(_orders_by_cust_date(sf_dir),
                                key="o_custkey",
                                order_cols=["date_us", "o_orderkey"],
                                n_tiles=4)
    return stats.map_batches(lambda b: b.select(
        ["o_custkey", "o_orderkey", "ntile", "percent_rank", "cume_dist"]),
        batch_format="pyarrow")


def priority_status_unpivot(sf_dir: str):
    """Wide → long UNPIVOT (``stages/pivot.py:unpivot``) over the
    distributed PIVOT's output: one (priority, status-column, cents)
    row per populated cell — pivot and unpivot compose losslessly."""
    from ...stages.pivot import unpivot

    wide = priority_status_pivot(sf_dir)
    long = unpivot(wide, id_cols=["o_orderpriority"],
                   value_cols=["sum_F", "sum_O", "sum_P"],
                   var_name="status_col", value_name="total_cents")
    return long


def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          year: int = 1996):
    """TPC-H Q5-shaped multiway join: revenue per nation from lineitems
    whose customer AND supplier sit in the same nation of ``region``,
    for orders placed in ``year``.

    Plan (mirrors how the join sides scale): the two fact×fact hops —
    orders⋈customer on custkey and lineitem⋈orders on orderkey — run as
    shuffle ``sorted_merge_join``s; the supplier→nation map and the
    nation/region dimensions broadcast (``ray.put`` once, searchsorted
    per batch).  Region filtering happens on the dimension side BEFORE
    the shuffles, so non-region customers never enter the exchange.
    Revenue is exact integer cents; the oracle mirrors the expression."""
    from ...stages.broadcast import broadcast_join
    from ...stages.join import sorted_merge_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    dim = nation.join(reg, keys="n_regionkey", right_keys="r_regionkey")
    dim = dim.filter(pc.equal(dim.column("r_name"), pa.scalar(region)))
    keep_nat = set(dim.column("n_nationkey").to_pylist())
    nat_name = dim.select(["n_nationkey", "n_name"])

    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")

    def prep_orders(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), pa.scalar(lo)),
                    pc.less(b.column("o_orderdate"), pa.scalar(hi)))
        t = b.filter(pc.fill_null(m, False))
        return pa.table({"l_orderkey": t.column("o_orderkey"),
                         "c_custkey": t.column("o_custkey")})

    def prep_cust(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("c_nationkey"),
                     value_set=pa.array(sorted(keep_nat), type=pa.int32()))
        t = b.filter(pc.fill_null(m, False))
        return pa.table({"c_custkey": t.column("c_custkey"),
                         "c_nat": t.column("c_nationkey")})

    orders = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey",
                                       "o_orderdate"])
              .map_batches(prep_orders, batch_format="pyarrow",
                           zero_copy_batch=True))
    cust = (rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"])
            .map_batches(prep_cust, batch_format="pyarrow",
                         zero_copy_batch=True))
    ord_nat = sorted_merge_join(orders, cust, on="c_custkey")

    def prep_line(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_suppkey": b.column("l_suppkey"),
            "rev_cents": pc.cast(pc.floor(pc.add(
                pc.multiply(rev, pa.scalar(100.0)), pa.scalar(0.5))),
                pa.int64())})

    line = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey",
                                     "l_extendedprice", "l_discount"])
            .map_batches(prep_line, batch_format="pyarrow",
                         zero_copy_batch=True))
    joined = sorted_merge_join(line, ord_nat.drop_columns(["c_custkey"]),
                               on="l_orderkey")

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp = supp.rename_columns(["l_suppkey", "s_nat"])
    enriched = broadcast_join(joined, supp, on="l_suppkey")

    def local_only(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(b.column("c_nat"), b.column("s_nat")),
                    pc.is_in(b.column("s_nat"),
                             value_set=pa.array(sorted(keep_nat),
                                                type=pa.int32())))
        t = b.filter(pc.fill_null(m, False))
        return pa.table({"n_nationkey": t.column("s_nat"),
                         "revenue_cents": t.column("rev_cents")})

    local = enriched.map_batches(local_only, batch_format="pyarrow",
                                 zero_copy_batch=True)
    agg = sorted_group_aggregate(local, ["n_nationkey"],
                                 [("revenue_cents", "sum")])
    named = broadcast_join(agg, nat_name, on="n_nationkey")
    return (named.select_columns(["n_name", "revenue_cents"])
            .sort(["revenue_cents", "n_name"], descending=[True, False]))


def revenue_forecast(sf_dir: str):
    """TPC-H Q6-flavored predicate-pushdown demo: the ship-date range
    is pushed into the parquet scan itself (``read_parquet(filter=...)``
    — row groups outside the range never leave storage), the residual
    discount/quantity predicates run vectorized per batch, and only a
    one-row partial sum per block reaches the driver."""
    import pyarrow.dataset as pds

    lo = pd.Timestamp("1997-01-01")
    hi = pd.Timestamp("1998-01-01")
    scan = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity"],
        filter=((pds.field("l_shipdate") >= lo)
                & (pds.field("l_shipdate") < hi)))

    def partial(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.greater_equal(b.column("l_discount"), pa.scalar(0.05)),
                    pc.less_equal(b.column("l_discount"), pa.scalar(0.07))),
            pc.less(b.column("l_quantity"), pa.scalar(24.0)))
        f = b.filter(pc.fill_null(mask, False))
        rev = _cents(pc.multiply(f.column("l_extendedprice"),
                                 f.column("l_discount")))
        s = pc.sum(rev).as_py() or 0
        return pa.table({"revenue_cents": pa.array([s], type=pa.int64()),
                         "n_items": pa.array([f.num_rows], type=pa.int64())})

    parts = scan.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    return pa.table({
        "revenue_cents": pa.array(
            [sum(r["revenue_cents"] for r in parts)], type=pa.int64()),
        "n_items": pa.array(
            [sum(r["n_items"] for r in parts)], type=pa.int64())})


def promo_revenue_share(sf_dir: str):
    """TPC-H Q14-flavored: one month of lineitem (ship-date range pushed
    into the scan) broadcast-joined to the part dimension; promo and
    total revenue accumulate as exact integer cents, and the percentage
    is one float expression over the two exact sums — mirrored
    operand-for-operand in the oracle."""
    import pyarrow.dataset as pds

    from ...stages.broadcast import broadcast_join

    lo = pd.Timestamp("1997-09-01")
    hi = pd.Timestamp("1997-10-01")
    part_dim = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_type"])
    scan = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=((pds.field("l_shipdate") >= lo)
                & (pds.field("l_shipdate") < hi)))

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        return pa.table({"p_partkey": b.column("l_partkey"),
                         "rev_cents": _cents(rev)})

    joined = broadcast_join(
        scan.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        part_dim, on="p_partkey")

    def partial(b: pa.Table) -> pa.Table:
        rev = b.column("rev_cents")
        promo = pc.if_else(pc.equal(b.column("p_type"), pa.scalar("PROMO")),
                           rev, pa.scalar(0, type=pa.int64()))
        return pa.table({
            "promo_cents": pa.array([pc.sum(promo).as_py() or 0],
                                    type=pa.int64()),
            "total_cents": pa.array([pc.sum(rev).as_py() or 0],
                                    type=pa.int64())})

    parts = joined.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    promo_cents = sum(r["promo_cents"] for r in parts)
    total_cents = sum(r["total_cents"] for r in parts)
    share = promo_cents * 100.0 / total_cents if total_cents else 0.0
    return pa.table({
        "promo_cents": pa.array([promo_cents], type=pa.int64()),
        "total_cents": pa.array([total_cents], type=pa.int64()),
        "promo_share": pa.array([share], type=pa.float64())})


def customer_rfm_segments(sf_dir: str):
    """RFM (recency / frequency / monetary) customer segmentation — the
    canonical marketing-analytics derivation.  One distributed
    aggregate reduces orders to a per-customer metric table; exact
    quartile thresholds (``quantile_disc`` over the REDUCED table) come
    back as six integers; scores are pure comparisons
    ``1 + (v > q1) + (v > q2) + (v > q3)`` mirrored in SQL, so the
    whole segmentation is bitwise-reproducible."""
    from ...stages.quantile import grouped_quantiles

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b.column("o_custkey"),
            "r_us": pc.cast(b.column("o_orderdate"), pa.int64()),
            "f": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "m_cents": _cents(b.column("o_totalprice"))})

    metrics = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "c_custkey", [("r_us", "max"), ("f", "sum"), ("m_cents", "sum")])
    metrics = metrics.materialize()       # consumed 4× (3 quantiles + scan)

    qs = {}
    for col in ("r_us", "f", "m_cents"):
        t = (grouped_quantiles(
            metrics.map_batches(lambda b, col=col: pa.table({
                "g": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "v": b.column(col)}),
                batch_format="pyarrow", zero_copy_batch=True),
            group="g", value_col="v", qs=[0.25, 0.5, 0.75],
            out_names=["q1", "q2", "q3"]).to_pandas())
        qs[col] = (int(t.q1[0]), int(t.q2[0]), int(t.q3[0]))

    def score(b: pa.Table) -> pa.Table:
        def s(col):
            v = b.column(col).to_numpy(zero_copy_only=False)
            q1, q2, q3 = qs[col]
            return (1 + (v > q1).astype(np.int64) + (v > q2) + (v > q3))
        r, f, m = s("r_us"), s("f"), s("m_cents")
        seg = np.char.add(np.char.add(r.astype("U1"), f.astype("U1")),
                          m.astype("U1"))
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "r_us": b.column("r_us"), "f": b.column("f"),
            "m_cents": b.column("m_cents"),
            "r_score": pa.array(r), "f_score": pa.array(f),
            "m_score": pa.array(m),
            "segment": pa.array(seg.tolist(), type=pa.string())})

    return metrics.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)


def shipping_priority_topk(sf_dir: str, segment: str = "BUILDING",
                           cutoff: str = "1997-06-15", k: int = 10):
    """TPC-H Q3-shaped: the ``k`` highest-revenue not-yet-shipped orders
    of one market segment (orders placed before ``cutoff`` with
    lineitems shipping after it).

    Plan: the segment filter runs on the customer side BEFORE the
    custkey exchange (only segment customers enter the shuffle), the
    date filters run inside both fact scans; two sorted-merge joins
    (orders⋈customer, lineitem⋈orders) then a groupby-sum to one row
    per order.  The final LIMIT uses ``global_topk`` — each block ships
    only its local top-k, so no full sort of the aggregate happens
    anywhere (the scale shape for k ≪ orders)."""
    from ...stages.join import sorted_merge_join
    from ...stages.topk import global_topk

    cut = pd.Timestamp(cutoff)

    def prep_cust(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("c_mktsegment"), pa.scalar(segment))
        t = b.filter(pc.fill_null(m, False))
        return pa.table({"o_custkey": t.column("c_custkey")})

    cust = (rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_mktsegment"])
            .map_batches(prep_cust, batch_format="pyarrow",
                         zero_copy_batch=True))

    def prep_orders(b: pa.Table) -> pa.Table:
        m = pc.less(b.column("o_orderdate"), pa.scalar(cut))
        t = b.filter(pc.fill_null(m, False))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_custkey": t.column("o_custkey"),
                         "o_orderdate": t.column("o_orderdate")})

    orders = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey",
                                       "o_orderdate"])
              .map_batches(prep_orders, batch_format="pyarrow",
                           zero_copy_batch=True))
    seg_orders = sorted_merge_join(orders, cust, on="o_custkey")

    def prep_line(b: pa.Table) -> pa.Table:
        m = pc.greater(b.column("l_shipdate"), pa.scalar(cut))
        t = b.filter(pc.fill_null(m, False))
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "revenue_cents": _cents(rev)})

    line = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate",
                                     "l_extendedprice", "l_discount"])
            .map_batches(prep_line, batch_format="pyarrow",
                         zero_copy_batch=True))
    joined = sorted_merge_join(
        line, seg_orders.drop_columns(["o_custkey"]), on="o_orderkey")
    per_order = sorted_group_aggregate(
        joined, ["o_orderkey", "o_orderdate"], [("revenue_cents", "sum")])
    return global_topk(per_order, [("revenue_cents", "descending"),
                                   ("o_orderdate", "ascending"),
                                   ("o_orderkey", "ascending")], k)


def returned_item_revenue(sf_dir: str, start: str = "1997-01-01",
                          k: int = 20):
    """TPC-H Q10-shaped: the ``k`` customers with the highest revenue
    from RETURNED lineitems of orders placed in one quarter, with their
    nation attached.

    Plan: both fact scans filter before any exchange (return flag on
    lineitem, the quarter on orders); lineitem⋈orders and agg⋈customer
    run as sorted-merge joins; the 25-row nation dimension broadcasts;
    the final LIMIT is a ``global_topk`` (no full sort).  Revenue is
    exact integer cents; ``c_acctbal`` passes through untouched from
    parquet on both engines, so the float column is bitwise-safe."""
    from ...stages.broadcast import broadcast_join
    from ...stages.join import sorted_merge_join
    from ...stages.topk import global_topk

    lo = pd.Timestamp(start)
    hi = lo + pd.DateOffset(months=3)

    def prep_orders(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), pa.scalar(lo)),
                    pc.less(b.column("o_orderdate"), pa.scalar(hi)))
        t = b.filter(pc.fill_null(m, False))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "c_custkey": t.column("o_custkey")})

    orders = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey",
                                       "o_orderdate"])
              .map_batches(prep_orders, batch_format="pyarrow",
                           zero_copy_batch=True))

    def prep_line(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("l_returnflag"), pa.scalar("R"))
        t = b.filter(pc.fill_null(m, False))
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "revenue_cents": _cents(rev)})

    line = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_returnflag",
                                     "l_extendedprice", "l_discount"])
            .map_batches(prep_line, batch_format="pyarrow",
                         zero_copy_batch=True))
    joined = sorted_merge_join(line, orders, on="o_orderkey")
    per_cust = sorted_group_aggregate(
        joined.drop_columns(["o_orderkey"]), ["c_custkey"],
        [("revenue_cents", "sum")])

    cust = (rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_name", "c_acctbal",
                                     "c_nationkey"]))
    named = sorted_merge_join(per_cust, cust, on="c_custkey")
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nat = nat.rename_columns(["c_nationkey", "n_name"])
    out = broadcast_join(named, nat, on="c_nationkey")
    top = global_topk(out, [("revenue_cents", "descending"),
                            ("c_custkey", "ascending")], k)
    return top.select(["c_custkey", "c_name", "c_acctbal", "n_name",
                       "revenue_cents"])


def brand_supplier_counts(sf_dir: str, max_size: int = 15):
    """TPC-H Q16-shaped: per (brand, type, size) of the qualifying part
    catalogue, how many DISTINCT suppliers have actually shipped the
    part — excluding 'complaint' suppliers (negative account balance,
    the testdata stand-in for Q16's comment-pattern filter).

    Plan: lineitem reduces to distinct (partkey, suppkey) pairs FIRST
    (the only fact-sized exchange); the excluded-supplier set is tiny
    (balance < 0) and broadcasts as an Arrow is_in mask; part attributes
    join in with a second sorted-merge join (part is a dimension but
    scales with the catalogue — no broadcast assumption); the distinct
    supplier count is a second groupby over pair-distinct rows, so
    COUNT(DISTINCT) stays additive."""
    from ...stages.join import sorted_merge_join

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_acctbal"])
    bad = supp.filter(pc.less(supp.column("s_acctbal"), pa.scalar(0.0)))
    bad_keys = pa.array(sorted(bad.column("s_suppkey").to_pylist()),
                        type=pa.int64())

    def prep_pairs(b: pa.Table) -> pa.Table:
        m = pc.invert(pc.is_in(b.column("l_suppkey"), value_set=bad_keys))
        t = b.filter(pc.fill_null(m, False))
        return pa.table({"p_partkey": t.column("l_partkey"),
                         "s_suppkey": t.column("l_suppkey"),
                         "one": pa.array(np.ones(t.num_rows,
                                                 dtype=np.int64))})

    pairs = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=["l_partkey", "l_suppkey"])
             .map_batches(prep_pairs, batch_format="pyarrow",
                          zero_copy_batch=True))
    distinct_pairs = sorted_group_aggregate(
        pairs, ["p_partkey", "s_suppkey"], [("one", "min")])

    def prep_part(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.less_equal(b.column("p_size"),
                                  pa.scalar(max_size, type=pa.int32())),
                    pc.invert(pc.equal(b.column("p_type"),
                                       pa.scalar("STANDARD"))))
        t = b.filter(pc.fill_null(m, False))
        return t.select(["p_partkey", "p_brand", "p_type", "p_size"])

    part = (rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_brand", "p_type",
                                     "p_size"])
            .map_batches(prep_part, batch_format="pyarrow",
                         zero_copy_batch=True))
    attributed = sorted_merge_join(distinct_pairs, part, on="p_partkey")
    # (brand,type,size,suppkey) may repeat across partkeys — distinct again,
    # then the count per (brand,type,size) is a plain additive sum
    dedup2 = sorted_group_aggregate(
        attributed.drop_columns(["p_partkey"]),
        ["p_brand", "p_type", "p_size", "s_suppkey"], [("one", "min")])
    return sorted_group_aggregate(
        dedup2.drop_columns(["s_suppkey"]).map_batches(
            lambda b: b.set_column(b.schema.get_field_index("one"),
                                   "supplier_cnt", b.column("one")),
            batch_format="pyarrow", zero_copy_batch=True),
        ["p_brand", "p_type", "p_size"], [("supplier_cnt", "sum")])


def disjunctive_part_revenue(sf_dir: str):
    """TPC-H Q19-shaped: revenue from lineitems matching an OR of three
    (brand, size-cap, quantity-range) clauses — the disjunctive-
    predicate join.  The part side prunes to the three brands BEFORE
    broadcast (a constant-factor slice of the catalogue: small by
    construction), the clause masks evaluate vectorized per batch, and
    the global sum accumulates as per-block integer partials (one
    result row — no exchange at all)."""
    from ...stages.broadcast import broadcast_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    keep = part.filter(pc.is_in(part.column("p_brand"),
                                value_set=pa.array(["Brand#11", "Brand#12",
                                                    "Brand#13"])))
    keep = keep.rename_columns(["l_partkey", "p_brand", "p_size"])

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice", "l_discount"])
    enriched = broadcast_join(line, keep, on="l_partkey")

    def clause(b, brand, size_cap, q_lo, q_hi):
        return pc.and_(pc.and_(
            pc.equal(b.column("p_brand"), pa.scalar(brand)),
            pc.less_equal(b.column("p_size"),
                          pa.scalar(size_cap, type=pa.int32()))),
            pc.and_(pc.greater_equal(b.column("l_quantity"),
                                     pa.scalar(float(q_lo))),
                    pc.less_equal(b.column("l_quantity"),
                                  pa.scalar(float(q_hi)))))

    def partial(b: pa.Table) -> pa.Table:
        m = pc.or_(pc.or_(clause(b, "Brand#11", 5, 1, 11),
                          clause(b, "Brand#12", 10, 10, 20)),
                   clause(b, "Brand#13", 15, 20, 30))
        t = b.filter(pc.fill_null(m, False))
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        s = pc.sum(_cents(rev)).as_py() or 0
        return pa.table({"revenue_cents": pa.array([s], type=pa.int64()),
                         "n_items": pa.array([t.num_rows], type=pa.int64())})

    parts = enriched.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True).take_all()
    return pa.table({
        "revenue_cents": pa.array(
            [sum(r["revenue_cents"] for r in parts)], type=pa.int64()),
        "n_items": pa.array(
            [sum(r["n_items"] for r in parts)], type=pa.int64())})


def top_revenue_suppliers(sf_dir: str, lo: str = "1996-01-01",
                          hi: str = "1996-04-01"):
    """TPC-H Q15 shape — maximum over an aggregate: per-supplier
    revenue in a 3-month window, keep the supplier(s) hitting the
    global MAX.  The revenue aggregate reduces lineitem to one row per
    supplier; the MAX is a driver scalar over that reduced table (never
    the raw stream); the winner set joins the supplier dim broadcast.
    Exact integer cents end-to-end, so ties (if any) and the max are
    exact — no epsilon comparisons.
    """
    import pyarrow.dataset as pds

    from ...stages.broadcast import broadcast_join

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        return pa.table({"l_suppkey": b.column("l_suppkey"),
                         "revenue_cents": _cents(rev)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=((pds.field("l_shipdate") >= pd.Timestamp(lo))
                & (pds.field("l_shipdate") < pd.Timestamp(hi))))
    per_supp = sorted_group_aggregate(
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["l_suppkey"], [("revenue_cents", "sum")],
        precombine=True).materialize()
    best = max(t["revenue_cents"].to_pylist()[0]
               for t in ray.get(per_supp.map_batches(
                   lambda b: pa.table({"revenue_cents": pa.array(
                       [pc.max(b.column("revenue_cents")).as_py()
                        if b.num_rows else None], type=pa.int64())}),
                   batch_format="pyarrow").to_arrow_refs())
               if t.num_rows and t["revenue_cents"][0].as_py() is not None)
    winners = per_supp.filter(expr=f"revenue_cents == {best}") \
        .map_batches(lambda b: pa.table({
            "s_suppkey": b.column("l_suppkey"),
            "total_revenue_cents": b.column("revenue_cents")}),
            batch_format="pyarrow", zero_copy_batch=True)
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    out = broadcast_join(winners, supp, on="s_suppkey")
    return out.map_batches(lambda b: b.select(
        ["s_suppkey", "s_name", "total_revenue_cents"]),
        batch_format="pyarrow", zero_copy_batch=True)


def nation_pair_volume(sf_dir: str, nation_a: str = "NATION_3",
                       nation_b: str = "NATION_8"):
    """TPC-H Q7-shaped bilateral trade volume: revenue per
    (supp_nation, cust_nation, ship year) for lineitems shipped
    1995-1996 where the supplier sits in one of the two nations and the
    customer in the other.

    Plan: both nation filters are applied on the *dimension* side
    before any exchange (suppliers via broadcast map, customers via a
    pre-filtered shuffle side), so out-of-pair rows never enter the
    two fact joins (lineitem⋈orders and orders⋈customer, both shuffle
    ``sorted_merge_join``).  Nation names attach to the aggregated
    (≤ 2 pairs × years) result on the driver."""
    from ...stages.broadcast import broadcast_join
    from ...stages.join import sorted_merge_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nation.column("n_nationkey").to_pylist(),
                       nation.column("n_name").to_pylist()))
    keys = {k for k, v in name_of.items() if v in (nation_a, nation_b)}
    keyset = pa.array(sorted(keys), type=pa.int32())

    def prep_cust(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("c_nationkey"), value_set=keyset)
        t = b.filter(pc.fill_null(m, False))
        return pa.table({"o_custkey": t.column("c_custkey"),
                         "cust_nat": t.column("c_nationkey")})

    cust = (rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"])
            .map_batches(prep_cust, batch_format="pyarrow",
                         zero_copy_batch=True))
    orders = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey"])
              .map_batches(lambda b: pa.table(
                  {"l_orderkey": b.column("o_orderkey"),
                   "o_custkey": b.column("o_custkey")}),
                  batch_format="pyarrow", zero_copy_batch=True))
    ord_nat = sorted_merge_join(orders, cust, on="o_custkey")

    lo = pd.Timestamp("1995-01-01")
    hi = pd.Timestamp("1997-01-01")

    def prep_line(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)),
                    pc.less(b.column("l_shipdate"), pa.scalar(hi)))
        t = b.filter(pc.fill_null(m, False))
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_suppkey": t.column("l_suppkey"),
            "l_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
            "cents": _cents(rev)})

    line = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey",
                                     "l_shipdate", "l_extendedprice",
                                     "l_discount"])
            .map_batches(prep_line, batch_format="pyarrow",
                         zero_copy_batch=True))
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp = supp.filter(pc.is_in(supp.column("s_nationkey"),
                                value_set=keyset))
    supp = supp.rename_columns(["l_suppkey", "supp_nat"])
    line = broadcast_join(line, supp, on="l_suppkey")

    both = sorted_merge_join(line.drop_columns(["l_suppkey"]), ord_nat,
                             on="l_orderkey")

    def cross_only(b: pa.Table) -> pa.Table:
        m = pc.not_equal(pc.cast(b.column("supp_nat"), pa.int32()),
                         b.column("cust_nat"))
        t = b.filter(pc.fill_null(m, False))
        return pa.table({"supp_nat": pc.cast(t.column("supp_nat"),
                                             pa.int32()),
                         "cust_nat": t.column("cust_nat"),
                         "l_year": t.column("l_year"),
                         "cents": t.column("cents")})

    pairs = both.map_batches(cross_only, batch_format="pyarrow",
                             zero_copy_batch=True)
    agg = sorted_group_aggregate(pairs, ["supp_nat", "cust_nat", "l_year"],
                                 [("cents", "sum")])
    out = agg.take_all()  # ≤ 2 pairs × years — result-sized
    tbl = pa.table({
        "supp_nation": pa.array([name_of[r["supp_nat"]] for r in out]),
        "cust_nation": pa.array([name_of[r["cust_nat"]] for r in out]),
        "l_year": pa.array([r["l_year"] for r in out], type=pa.int64()),
        "revenue_cents": pa.array([r["cents"] for r in out],
                                  type=pa.int64())})
    return tbl.sort_by([("supp_nation", "ascending"),
                        ("cust_nation", "ascending"),
                        ("l_year", "ascending")])


def market_share(sf_dir: str, nation: str = "NATION_8",
                 region: str = "ASIA", ptype: str = "MEDIUM"):
    """TPC-H Q8-shaped market share: within ``region``'s market for
    parts of type ``ptype`` (orders 1995-1996), the revenue share
    supplied by ``nation``, per order year.

    Numerator and denominator are exact int64 cents aggregated
    distributively; the share is ONE double division per year
    (CAST(BIGINT AS DOUBLE)/CAST(BIGINT AS DOUBLE) mirrored in the
    oracle), so the floats match bitwise."""
    from ...stages.broadcast import broadcast_join
    from ...stages.join import sorted_merge_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    dim = nat.join(reg, keys="n_regionkey", right_keys="r_regionkey")
    region_keys = pa.array(sorted(
        dim.filter(pc.equal(dim.column("r_name"), pa.scalar(region)))
        .column("n_nationkey").to_pylist()), type=pa.int32())
    target_key = nat.filter(pc.equal(nat.column("n_name"),
                                     pa.scalar(nation)))\
        .column("n_nationkey").to_pylist()[0]

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pkeys = pa.array(sorted(
        part.filter(pc.equal(part.column("p_type"), pa.scalar(ptype)))
        .column("p_partkey").to_pylist()), type=pa.int64())

    def prep_cust(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("c_nationkey"), value_set=region_keys)
        t = b.filter(pc.fill_null(m, False))
        return pa.table({"o_custkey": t.column("c_custkey")})

    lo = pd.Timestamp("1995-01-01")
    hi = pd.Timestamp("1997-01-01")

    def prep_orders(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), pa.scalar(lo)),
                    pc.less(b.column("o_orderdate"), pa.scalar(hi)))
        t = b.filter(pc.fill_null(m, False))
        return pa.table({
            "l_orderkey": t.column("o_orderkey"),
            "o_custkey": t.column("o_custkey"),
            "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64())})

    cust = (rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"])
            .map_batches(prep_cust, batch_format="pyarrow",
                         zero_copy_batch=True))
    orders = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey",
                                       "o_orderdate"])
              .map_batches(prep_orders, batch_format="pyarrow",
                           zero_copy_batch=True))
    ord_reg = sorted_merge_join(orders, cust, on="o_custkey")

    def prep_line(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("l_partkey"), value_set=pkeys)
        t = b.filter(pc.fill_null(m, False))
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "l_suppkey": t.column("l_suppkey"),
                         "cents": _cents(rev)})

    line = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey",
                                     "l_suppkey", "l_extendedprice",
                                     "l_discount"])
            .map_batches(prep_line, batch_format="pyarrow",
                         zero_copy_batch=True))
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp = supp.rename_columns(["l_suppkey", "s_nat"])
    line = broadcast_join(line, supp, on="l_suppkey")

    both = sorted_merge_join(
        line.drop_columns(["l_suppkey"]),
        ord_reg.drop_columns(["o_custkey"]), on="l_orderkey")

    def tag(b: pa.Table) -> pa.Table:
        is_t = pc.cast(pc.equal(pc.cast(b.column("s_nat"), pa.int32()),
                                pa.scalar(target_key, type=pa.int32())),
                       pa.int64())
        return pa.table({
            "o_year": b.column("o_year"),
            "nation_cents": pc.multiply(b.column("cents"), is_t),
            "total_cents": b.column("cents")})

    tagged = both.map_batches(tag, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = sorted_group_aggregate(tagged, ["o_year"],
                                 [("nation_cents", "sum"),
                                  ("total_cents", "sum")])

    def share(b: pa.Table) -> pa.Table:
        num = pc.cast(b.column("nation_cents"), pa.float64())
        den = pc.cast(b.column("total_cents"), pa.float64())
        return pa.table({"o_year": b.column("o_year"),
                         "nation_cents": b.column("nation_cents"),
                         "total_cents": b.column("total_cents"),
                         "mkt_share": pc.divide(num, den)})

    return (agg.map_batches(share, batch_format="pyarrow",
                            zero_copy_batch=True)
            .sort("o_year"))


def customer_order_dist(sf_dir: str):
    """TPC-H Q13-shaped distribution: for every customer, the number of
    their non-URGENT orders (0 for customers with none — the LEFT join
    is the point of the query), then the histogram (c_count, custdist).

    Plan: orders pre-aggregate to (custkey, count) — the exchange
    carries one row per customer with orders, never raw orders — then a
    LEFT shuffle ``sorted_merge_join`` from customers fills the zero
    bucket, and a second small aggregate builds the histogram."""
    from ...stages.join import sorted_merge_join

    def prep_orders(b: pa.Table) -> pa.Table:
        m = pc.not_equal(b.column("o_orderpriority"), pa.scalar("1-URGENT"))
        t = b.filter(pc.fill_null(m, False))
        return pa.table({"c_custkey": t.column("o_custkey"),
                         "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    counts = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderpriority"])
        .map_batches(prep_orders, batch_format="pyarrow",
                     zero_copy_batch=True),
        ["c_custkey"], [("n", "sum")])

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    left = sorted_merge_join(cust, counts, on="c_custkey", how="left")

    def zero_fill(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_count": pc.fill_null(pc.cast(b.column("n"), pa.int64()), 0),
            "one": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    hist = sorted_group_aggregate(
        left.map_batches(zero_fill, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["c_count"], [("one", "sum")])

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"c_count": b.column("c_count"),
                         "custdist": b.column("one")})

    return (hist.map_batches(rename, batch_format="pyarrow",
                             zero_copy_batch=True)
            .sort(["custdist", "c_count"], descending=[True, True]))


def small_qty_part_revenue(sf_dir: str):
    """TPC-H Q17-shaped small-quantity analysis, generalized to every
    brand: revenue from lineitems whose quantity is below 20% of their
    part's average quantity, aggregated per brand.

    The threshold predicate is exact integer arithmetic — quantities
    are integral, so ``qty < 0.2 * avg(qty)``  ⇔  ``5·qty·n < Σqty``
    (both sides int64; the oracle uses the same integer form, making
    the comparison bitwise-portable instead of trusting float
    division).  Plan: per-part (Σqty, n) pre-aggregate, shuffle join
    back onto lineitem on partkey, brand from a broadcast dim."""
    from ...stages.broadcast import broadcast_join
    from ...stages.join import sorted_merge_join

    def prep_line(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": b.column("l_partkey"),
            "qty": pc.cast(b.column("l_quantity"), pa.int64()),
            "price_cents": _cents(b.column("l_extendedprice")),
            "n": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    scan = lambda: (  # noqa: E731
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_quantity",
                                 "l_extendedprice"])
        .map_batches(prep_line, batch_format="pyarrow",
                     zero_copy_batch=True))

    thresholds = sorted_group_aggregate(scan(), ["l_partkey"],
                                        [("qty", "sum"), ("n", "sum")])

    def rename_thr(b: pa.Table) -> pa.Table:
        return pa.table({"l_partkey": b.column("l_partkey"),
                         "sum_qty": b.column("qty"),
                         "n_line": b.column("n")})

    thr = thresholds.map_batches(rename_thr, batch_format="pyarrow",
                                 zero_copy_batch=True)
    joined = sorted_merge_join(scan(), thr, on="l_partkey")

    def small_only(b: pa.Table) -> pa.Table:
        lhs = pc.multiply(pc.multiply(b.column("qty"), pa.scalar(5)),
                          b.column("n_line"))
        t = b.filter(pc.less(lhs, b.column("sum_qty")))
        return pa.table({"l_partkey": t.column("l_partkey"),
                         "price_cents": t.column("price_cents"),
                         "n": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    small = joined.map_batches(small_only, batch_format="pyarrow",
                               zero_copy_batch=True)
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    part = part.rename_columns(["l_partkey", "p_brand"])
    branded = broadcast_join(small, part, on="l_partkey")
    agg = sorted_group_aggregate(branded.drop_columns(["l_partkey"]),
                                 ["p_brand"],
                                 [("price_cents", "sum"), ("n", "sum")])

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"p_brand": b.column("p_brand"),
                         "small_revenue_cents": b.column("price_cents"),
                         "n_small": b.column("n")})

    return (agg.map_batches(rename, batch_format="pyarrow",
                            zero_copy_batch=True)
            .sort("p_brand"))


def priority_counts_ivm(sf_dir: str):
    """Incremental view maintenance WITH RETRACTIONS: a per-priority
    (count, revenue) materialized view maintained under a changelog of
    updates and deletes via SIGNED deltas — each changed order emits a
    retraction of its old contribution (−1, −cents) and, for updates,
    an insertion of the new one — and the view refresh is ONE small
    aggregate merge of base partials ∪ delta partials (never a
    rescan).  The insert-only law is ``events_hourly_incremental``;
    this is the general Z-set form (deletes make counts go DOWN).

    The changelog rule mirrors :func:`orders_cdc_latest` (md5 buckets:
    <100 delete, 100-299 reprioritize to 1-URGENT at price+10).  The
    driver's oracle computes the FULL RECOMPUTE over the post-change
    state — so the value-hash gate enforces the maintenance law
    itself, bitwise."""
    from ...functions.sampling import _md5_bucket

    def base_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "n_orders": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "total_cents": _cents(b.column("o_totalprice"))})

    def delta_rows(b: pa.Table) -> pa.Table:
        h = _md5_bucket(b.column("o_orderkey").to_pylist(), 1000)
        t = b.filter(pa.array(h < 300))
        hh = h[h < 300]
        # retraction of every changed row's old contribution
        retract = pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "n_orders": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
            "total_cents": pc.negate_checked(
                _cents(t.column("o_totalprice")))})
        # re-insertion for updates only (hb in [100, 300))
        upd = t.filter(pa.array(hh >= 100))
        insert = pa.table({
            "o_orderpriority": pa.array(["1-URGENT"] * upd.num_rows,
                                        type=pa.string()),
            "n_orders": pa.array(np.ones(upd.num_rows, dtype=np.int64)),
            "total_cents": _cents(pc.add(upd.column("o_totalprice"),
                                         pa.scalar(10.0)))})
        return pa.concat_tables([retract, insert])

    scan = lambda: rd.read_parquet(  # noqa: E731
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    signed = (scan().map_batches(base_rows, batch_format="pyarrow",
                                 zero_copy_batch=True)
              .union(scan().map_batches(delta_rows, batch_format="pyarrow",
                                        zero_copy_batch=True)))
    view = sorted_group_aggregate(signed, ["o_orderpriority"],
                                  [("n_orders", "sum"),
                                   ("total_cents", "sum")])
    # groups retracted to zero leave the view (Z-set support rule)
    return (view.filter(expr="n_orders > 0")
            .sort("o_orderpriority"))


def nation_year_profit(sf_dir: str, pattern: str = "gear"):
    """TPC-H Q9-shaped: revenue by supplier nation and order year for
    lineitems of parts whose name contains ``pattern`` (the testdata
    stand-in for Q9's profit expression — no partsupp/supplycost table
    exists, so profit reduces to discounted revenue).

    Plan: the part filter runs driver-side over the catalogue's two
    needed columns and ships as a broadcast ``is_in`` mask — lineitems
    of non-matching parts never enter any exchange; lineitem⋈orders
    (the only fact×fact hop) is a shuffle sorted-merge join; the
    supplier→nation map and nation names broadcast.  Revenue is exact
    integer cents; year extraction is mirrored by the oracle's
    EXTRACT."""
    from ...stages.broadcast import broadcast_join
    from ...stages.join import sorted_merge_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    keep = part.filter(pc.match_substring(part.column("p_name"), pattern))
    keep_keys = pa.array(sorted(keep.column("p_partkey").to_pylist()),
                         type=pa.int64())

    def prep_line(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("l_partkey"), value_set=keep_keys)
        t = b.filter(pc.fill_null(m, False))
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "l_suppkey": t.column("l_suppkey"),
                         "profit_cents": _cents(rev)})

    line = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey", "l_suppkey",
                                     "l_extendedprice", "l_discount"])
            .map_batches(prep_line, batch_format="pyarrow",
                         zero_copy_batch=True))

    def prep_orders(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "o_year": pc.cast(pc.year(b.column("o_orderdate")),
                                           pa.int64())})

    orders = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderdate"])
              .map_batches(prep_orders, batch_format="pyarrow",
                           zero_copy_batch=True))
    joined = sorted_merge_join(line, orders, on="o_orderkey")

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    sn = supp.join(nat, keys="s_nationkey", right_keys="n_nationkey")
    sn = sn.select(["s_suppkey", "n_name"]).rename_columns(
        ["l_suppkey", "n_name"])
    named = broadcast_join(joined.drop_columns(["o_orderkey"]), sn,
                           on="l_suppkey")
    return sorted_group_aggregate(
        named.drop_columns(["l_suppkey"]), ["n_name", "o_year"],
        [("profit_cents", "sum")])


def top_part_supplier(sf_dir: str, part_type: str = "SMALL"):
    """TPC-H Q2-shaped groupwise-argmin: for every part of
    ``part_type``, the single supplier with the highest shipped revenue
    for that part (ties broken by the lower suppkey), with part and
    supplier names attached.

    Plan: the (partkey, suppkey) revenue totals are the only fact-sized
    exchange (map-side precombine shrinks it); the per-part winner is a
    ``grouped_topk`` k=1 on the REDUCED totals table — never a
    self-join back against lineitem (the classic Q2 correlated-subquery
    trap); part/supplier attributes broadcast."""
    from ...stages.broadcast import broadcast_join
    from ...stages.topk import grouped_topk

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name", "p_type"])
    keep = part.filter(pc.equal(part.column("p_type"), pa.scalar(part_type)))
    keep_keys = pa.array(sorted(keep.column("p_partkey").to_pylist()),
                         type=pa.int64())

    def prep(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("l_partkey"), value_set=keep_keys)
        t = b.filter(pc.fill_null(m, False))
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"p_partkey": t.column("l_partkey"),
                         "s_suppkey": t.column("l_suppkey"),
                         "total_cents": _cents(rev)})

    totals = sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_suppkey",
                                 "l_extendedprice", "l_discount"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["p_partkey", "s_suppkey"], [("total_cents", "sum")])
    winners = grouped_topk(totals, "p_partkey", "total_cents",
                           "s_suppkey", k=1).drop_columns(["rank"])

    named = broadcast_join(winners,
                           keep.select(["p_partkey", "p_name"]),
                           on="p_partkey")
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    return broadcast_join(named, supp, on="s_suppkey").select_columns(
        ["p_partkey", "p_name", "s_suppkey", "s_name", "total_cents"])


def shipmode_priority_counts(sf_dir: str, year: str = "1998"):
    """TPC-H Q12-shaped CASE-split join: per lineitem return flag (the
    ship-mode axis of this schema), how many lineitems shipped in one
    year belong to critical-priority orders (``1-URGENT``/``2-HIGH``)
    vs everything else.

    Plan: the year predicate is pushed into the lineitem scan (row
    groups outside never leave storage); orders project to two columns
    and the priority CASE collapses to an int64 0/1 BEFORE the join, so
    the exchange carries one byte-per-row of payload instead of the
    priority string; the join is sorted-merge on ``o_orderkey``; the
    final 3-row aggregate is map-side combined.  Completes the 22/22
    TPC-H decision-support shape sweep."""
    import pyarrow.dataset as pds

    from ...stages.join import sorted_merge_join

    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{int(year) + 1}-01-01")
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag"],
        filter=((pds.field("l_shipdate") >= lo)
                & (pds.field("l_shipdate") < hi)))
    line = line.map_batches(
        lambda b: pa.table({"o_orderkey": b.column("l_orderkey"),
                            "l_returnflag": b.column("l_returnflag")}),
        batch_format="pyarrow", zero_copy_batch=True)

    def order_prio(b: pa.Table) -> pa.Table:
        hi_m = pc.is_in(b.column("o_orderpriority"),
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "is_high": pc.cast(hi_m, pa.int64())})

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"]).map_batches(
            order_prio, batch_format="pyarrow", zero_copy_batch=True)
    joined = sorted_merge_join(line, orders, on="o_orderkey")

    def split(b: pa.Table) -> pa.Table:
        high = b.column("is_high")
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "high_line_count": high,
            "low_line_count": pc.subtract(pa.scalar(1, pa.int64()), high)})

    counted = joined.map_batches(split, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return sorted_group_aggregate(
        counted, ["l_returnflag"],
        [("high_line_count", "sum"), ("low_line_count", "sum")],
        precombine=True)


def customer_part_recs(sf_dir: str, k: int = 3, min_count: int = 2):
    """Item-item collaborative filtering — the co-occurrence
    recommender: a customer's candidate parts score by the SUM of
    co-purchase pair counts against parts they already bought; owned
    parts are anti-joined out; top-k per customer by (score desc,
    partkey).  Exchanges: orders⋈lineitem for ownership, ownership ⋈
    the (shared) pair-count table both directions, one composite
    aggregate, one anti semi-join, one grouped top-k — every step a
    reduced or semi-joined stream, no user×item matrix ever
    materializes."""
    from ...stages.join import sorted_merge_join
    from ...stages.semijoin import semi_join
    from ...stages.topk import grouped_topk

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"]) \
        .map_batches(lambda b: pa.table({
            "l_orderkey": b.column("o_orderkey"),
            "custkey": b.column("o_custkey")}),
            batch_format="pyarrow", zero_copy_batch=True)
    owned = sorted_group_aggregate(
        sorted_merge_join(
            li.map_batches(lambda b: b.select(
                ["l_orderkey", "l_partkey"]), batch_format="pyarrow"),
            orders, on="l_orderkey").map_batches(
            lambda b: pa.table({
                "custkey": b.column("custkey"),
                "part": b.column("l_partkey"),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["custkey", "part"], [("one", "min")]) \
        .drop_columns(["one"]).materialize()

    pairs = _copurchase_pair_counts(sf_dir) \
        .map_batches(_unpack_pair, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .filter(expr=f"n_copurchase >= {int(min_count)}")
    sym = pairs.map_batches(lambda b: pa.table({
        "part": pa.chunked_array([
            b.column("part_a").combine_chunks(),
            b.column("part_b").combine_chunks()]),
        "cand": pa.chunked_array([
            b.column("part_b").combine_chunks(),
            b.column("part_a").combine_chunks()]),
        "w": pa.chunked_array([
            b.column("n_copurchase").combine_chunks(),
            b.column("n_copurchase").combine_chunks()])}),
        batch_format="pyarrow", zero_copy_batch=True)

    scored = sorted_group_aggregate(
        sorted_merge_join(owned, sym, on="part").map_batches(
            lambda b: pa.table({
                "custkey": b.column("custkey"),
                "cand": b.column("cand"),
                "score": b.column("w")}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["custkey", "cand"], [("score", "sum")],
        precombine=True)

    # drop candidates the customer already owns: anti semi-join on the
    # packed (custkey, cand) key vs the packed owned key
    def pack(col_a, col_b):
        return (col_a.to_numpy(zero_copy_only=False) << 32) \
            | col_b.to_numpy(zero_copy_only=False)

    cand_keyed = scored.map_batches(lambda b: b.append_column(
        "ck", pa.array(pack(b.column("custkey"), b.column("cand")),
                       type=pa.int64())), batch_format="pyarrow",
        zero_copy_batch=True)
    owned_keyed = owned.map_batches(lambda b: pa.table({
        "ck": pa.array(pack(b.column("custkey"), b.column("part")),
                       type=pa.int64())}), batch_format="pyarrow",
        zero_copy_batch=True)
    fresh = semi_join(cand_keyed, owned_keyed, on="ck", anti=True) \
        .map_batches(lambda b: b.select(["custkey", "cand", "score"]),
                     batch_format="pyarrow")

    return grouped_topk(fresh, group="custkey", order_col="score",
                        tiebreak="cand", k=k, descending=True) \
        .map_batches(lambda b: pa.table({
            "custkey": b.column("custkey"),
            "rec_part": b.column("cand"),
            "score": b.column("score"),
            "rank": b.column("rank")}),
            batch_format="pyarrow", zero_copy_batch=True)


def region_revenue_rollup(sf_dir: str):
    """Hierarchical dimension rollup: order revenue through the
    customer→nation→region snowflake, ``GROUP BY ROLLUP(region,
    nation)`` — subtotals per nation, per region, and the grand total
    in one result (``rollup_aggregate``: only the finest level sees
    the fact stream; coarser levels re-aggregate reduced output).
    Dimensions broadcast (region/nation are KB-scale; customer joins
    sorted)."""
    from ...stages.join import sorted_merge_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    r_of = dict(zip(region.column("r_regionkey").to_pylist(),
                    region.column("r_name").to_pylist()))
    n_map = {k: (n, r_of[r]) for k, n, r in zip(
        nation.column("n_nationkey").to_pylist(),
        nation.column("n_name").to_pylist(),
        nation.column("n_regionkey").to_pylist())}
    n_ref = ray.put(n_map)

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    def dims(b: pa.Table) -> pa.Table:
        nm = ray.get(n_ref)
        nk = b.column("c_nationkey").to_pylist()
        return pa.table({
            "o_custkey": b.column("c_custkey"),
            "nation": pa.array([nm[k][0] for k in nk], type=pa.string()),
            "region": pa.array([nm[k][1] for k in nk], type=pa.string())})

    cdim = cust.map_batches(dims, batch_format="pyarrow",
                            zero_copy_batch=True)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"]) \
        .map_batches(lambda b: pa.table({
            "o_custkey": b.column("o_custkey"),
            "cents": _cents(b.column("o_totalprice"))}),
            batch_format="pyarrow", zero_copy_batch=True)

    joined = sorted_merge_join(orders, cdim, on="o_custkey")
    from ...stages.aggregate import rollup_aggregate
    return rollup_aggregate(
        joined.map_batches(lambda b: pa.table({
            "region": b.column("region"), "nation": b.column("nation"),
            "n_orders": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "revenue_cents": b.column("cents")}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["region", "nation"],
        [("n_orders", "sum"), ("revenue_cents", "sum")])


def top_supplier_revenue(sf_dir: str, start: str = "1996-01-01"):
    """TPC-H Q15-shaped: the supplier(s) achieving the MAXIMUM quarterly
    revenue — the argmax-with-ties relational shape (Q15's revenue view
    + its correlated MAX subquery).  The ship-date quarter is pushed
    into the parquet scan; per-supplier revenue reduces to a
    supplier-sized table in exact integer cents; the global max is a
    one-row aggregate broadcast back as a plain Python scalar; and only
    the winner rows (almost always one) join the supplier dimension via
    the broadcast path.  No full sort anywhere."""
    import pyarrow.dataset as pds

    from ...stages.join import auto_join

    lo = pd.Timestamp(start)
    hi = lo + pd.DateOffset(months=3)
    scan = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=((pds.field("l_shipdate") >= lo)
                & (pds.field("l_shipdate") < hi)))

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      b.column("l_discount")))
        return pa.table({
            "s_suppkey": b.column("l_suppkey"),
            "total_revenue_cents": pc.cast(pc.floor(pc.add(
                pc.multiply(rev, pa.scalar(100.0)), pa.scalar(0.5))),
                pa.int64())})

    rev = sorted_group_aggregate(
        scan.map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["s_suppkey"], [("total_revenue_cents", "sum")],
        precombine=True).materialize()
    mx = int(rev.max("total_revenue_cents"))
    winners = rev.filter(expr=f"total_revenue_cents == {mx}")
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_name"])
    return auto_join(winners, supp, on="s_suppkey").sort("s_suppkey") \
        .map_batches(lambda b: b.select(
            ["s_suppkey", "s_name", "total_revenue_cents"]),
        batch_format="pyarrow")


def customer_scd2_orders(sf_dir: str):
    """SCD Type-2 temporal dimension join — the lakehouse "dimension
    history" pattern: a deterministic mktsegment version log is derived
    from customers (md5 bucket < 300 migrate to 'MIGRATED' on
    1995-07-01; bucket < 100 further churn to 'CHURNED' on 1996-07-01),
    and every order joins the segment VERSION valid at its order date
    (as-of backward on (custkey, date) — validity intervals partition
    time, so SCD2 range-join ≡ as-of join, reusing the carry-in
    exchange of `stages/asof.py`).  Output: orders and exact revenue
    cents per segment-at-order-time."""
    from ...functions.sampling import _md5_bucket
    from ...stages.asof import asof_join

    V0_US = 631152000000000          # 1990-01-01 in epoch µs
    V1_US = 804556800000000          # 1995-07-01
    V2_US = 836179200000000          # 1996-07-01

    def versions(b: pa.Table) -> pa.Table:
        keys = b.column("c_custkey").to_pylist()
        h = _md5_bucket(keys, 1000)
        segs = b.column("c_mktsegment").to_pylist()
        ck, vt, sg = [], [], []
        for k, hb, s in zip(keys, h, segs):
            ck.append(k)
            vt.append(V0_US)
            sg.append(s)
            if hb < 300:
                ck.append(k)
                vt.append(V1_US)
                sg.append("MIGRATED")
            if hb < 100:
                ck.append(k)
                vt.append(V2_US)
                sg.append("CHURNED")
        return pa.table({
            "ckey": pa.array(ck, type=pa.int64()),
            "vts": pa.array(vt, type=pa.int64()),
            "segment": pa.array(sg, type=pa.string())})

    dim = rd.read_parquet(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_mktsegment"]
                          ).map_batches(versions, batch_format="pyarrow",
                                        zero_copy_batch=True)

    def fact(b: pa.Table) -> pa.Table:
        return pa.table({
            "ckey": pc.cast(b.column("o_custkey"), pa.int64()),
            "ots": pc.cast(b.column("o_orderdate"), pa.int64()),
            "cents": _cents(b.column("o_totalprice"))})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"]
                             ).map_batches(fact, batch_format="pyarrow",
                                           zero_copy_batch=True)

    joined = asof_join(orders, dim, key="ckey", left_t="ots",
                       right_t="vts")

    def ones(b: pa.Table) -> pa.Table:
        return pa.table({
            "segment": b.column("segment"),
            "n_orders": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "revenue_cents": b.column("cents")})

    return sorted_group_aggregate(
        joined.map_batches(ones, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["segment"], [("n_orders", "sum"), ("revenue_cents", "sum")],
        precombine=True).sort("segment")


def customer_segment_migration(sf_dir: str):
    """Segment migration matrix for the SCD2 dimension
    (`customer_scd2_orders`'s version log viewed start-to-end): how
    many customers moved from each original mktsegment to each final
    state (md5 bucket < 100 → CHURNED, < 300 → MIGRATED, else
    unchanged) — the cohort-flow readout a CRM diff produces.  One
    vectorized scan + a matrix-sized aggregate."""
    from ...functions.sampling import _md5_bucket

    def cells(b: pa.Table) -> pa.Table:
        keys = b.column("c_custkey").to_pylist()
        h = _md5_bucket(keys, 1000)
        orig = b.column("c_mktsegment").to_pylist()
        final = [("CHURNED" if hb < 100 else
                  "MIGRATED" if hb < 300 else s)
                 for hb, s in zip(h, orig)]
        return pa.table({
            "from_segment": pa.array(orig, type=pa.string()),
            "to_segment": pa.array(final, type=pa.string()),
            "n_customers": pa.array(np.ones(len(keys), dtype=np.int64))})

    return sorted_group_aggregate(
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"]
                        ).map_batches(cells, batch_format="pyarrow",
                                      zero_copy_batch=True),
        ["from_segment", "to_segment"], [("n_customers", "sum")],
        precombine=True).sort(["from_segment", "to_segment"])


def supplier_late_wilson(sf_dir: str, late_days: int = 75,
                         z: float = 1.96):
    """Supplier SLA scoring with uncertainty — the Wilson UPPER bound
    of each supplier's late-shipment rate (ship > order date +
    ``late_days``), the conservative score a procurement dashboard
    ranks by so small-sample suppliers aren't over-trusted (the
    `events_ctr_wilson` discipline, upper tail; sqrt is correctly-
    rounded IEEE so the mirror is bitwise).  One fact×fact sorted
    join + a supplier-sized aggregate."""
    from ...stages.join import sorted_merge_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_shipdate"]).map_batches(
        lambda b: pa.table({
            "okey": pc.cast(b.column("l_orderkey"), pa.int64()),
            "l_suppkey": pc.cast(b.column("l_suppkey"), pa.int64()),
            "ship_us": pc.cast(b.column("l_shipdate"), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"]
                             ).map_batches(
        lambda b: pa.table({
            "okey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "odate_us": pc.cast(b.column("o_orderdate"), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    j = sorted_merge_join(li, orders, on="okey")
    cutoff = late_days * 86_400_000_000

    def late_rows(b: pa.Table) -> pa.Table:
        gap = pc.subtract(b.column("ship_us"), b.column("odate_us"))
        late = pc.cast(pc.greater(gap, pa.scalar(cutoff)), pa.int64())
        return pa.table({
            "l_suppkey": b.column("l_suppkey"),
            "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "k": late})

    agg = sorted_group_aggregate(
        j.map_batches(late_rows, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["l_suppkey"], [("n", "sum"), ("k", "sum")],
        precombine=True).sort("l_suppkey")

    def wilson(b: pa.Table) -> pa.Table:
        import math
        n = b.column("n").to_pylist()
        k = b.column("k").to_pylist()
        rate, hi = [], []
        for ni, ki in zip(n, k):
            p = ki / ni
            denom = 1.0 + z * z / ni
            center = p + z * z / (2.0 * ni)
            rad = z * math.sqrt(p * (1.0 - p) / ni
                                + z * z / (4.0 * ni * ni))
            rate.append(p)
            hi.append((center + rad) / denom)
        return pa.table({
            "l_suppkey": b.column("l_suppkey"),
            "n": b.column("n"), "k": b.column("k"),
            "late_rate": pa.array(rate, type=pa.float64()),
            "wilson_hi": pa.array(hi, type=pa.float64())})

    return agg.map_batches(wilson, batch_format="pyarrow",
                           zero_copy_batch=True)


