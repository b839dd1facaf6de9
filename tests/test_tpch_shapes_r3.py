"""Round-3 resumed session: the remaining feasible TPC-H shapes
(Q7 nation-pair volume, Q8 market share, Q13 order-count distribution,
Q17 small-quantity revenue) — DuckDB parity at sf0.001 plus the
shape-specific invariants (Q13's LEFT-join zero bucket, Q8's exact
num/den decomposition, Q17's integer threshold equivalence)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _to_pandas(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def _parity(ray_fn, con, name):
    import __ray_entry__ as entrymod

    got = _norm(_to_pandas(ray_fn(SF)))
    exp = _norm(con.sql(entrymod.oracle_sql()[name]).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                  check_exact=True)
    return got


def test_nation_pair_volume_parity(ray_session, con):
    from kgray.pipelines.relational import nation_pair_volume

    got = _parity(nation_pair_volume, con, "nation_pair_volume")
    # only the two cross pairs may appear, never a same-nation pair
    assert (got["supp_nation"] != got["cust_nation"]).all()


def test_market_share_parity(ray_session, con):
    from kgray.pipelines.relational import market_share

    got = _parity(market_share, con, "market_share")
    assert (got["nation_cents"] <= got["total_cents"]).all()
    # the share is exactly the one double division of the int columns
    assert (got["mkt_share"] ==
            got["nation_cents"].astype(float)
            / got["total_cents"].astype(float)).all()


def test_customer_order_dist_parity(ray_session, con):
    from kgray.pipelines.relational import customer_order_dist

    got = _parity(customer_order_dist, con, "customer_order_dist")
    # LEFT-join semantics: total customers across buckets == |customer|
    n_cust = con.sql("SELECT COUNT(*) FROM customer").fetchone()[0]
    assert got["custdist"].sum() == n_cust
    # the zero bucket exists iff some customer has no non-URGENT order
    n_with = con.sql("""
        SELECT COUNT(DISTINCT o_custkey) FROM orders
        WHERE o_orderpriority <> '1-URGENT'
          AND o_custkey IN (SELECT c_custkey FROM customer)
    """).fetchone()[0]
    zero_rows = got.loc[got["c_count"] == 0, "custdist"]
    assert (zero_rows.iloc[0] if len(zero_rows) else 0) == n_cust - n_with


def test_small_qty_part_revenue_parity(ray_session, con):
    from kgray.pipelines.relational import small_qty_part_revenue

    got = _parity(small_qty_part_revenue, con, "small_qty_part_revenue")
    # integer predicate 5*qty*n < sum_qty is exactly qty < 0.2*avg for
    # integral quantities: cross-check the row count against the float
    # form (safe here because no qty*5*n ever ties a non-integral bound)
    n_float = con.sql("""
        WITH t AS (
            SELECT l_partkey, AVG(l_quantity) AS a
            FROM lineitem GROUP BY l_partkey
        )
        SELECT COUNT(*) FROM lineitem l JOIN t USING (l_partkey)
        WHERE l.l_quantity < 0.2 * t.a
    """).fetchone()[0]
    assert got["n_small"].sum() == n_float


def test_waiting_suppliers_parity(ray_session, con):
    """Q21 shape (adapted late predicate): DuckDB parity plus the
    only-late-supplier law — every credited order has >1 supplier and
    exactly one late one, so numwait can never exceed the supplier's
    finished-order participation count."""
    from kgray.pipelines.relational import waiting_suppliers

    got = _parity(waiting_suppliers, con, "waiting_suppliers")
    assert (got["numwait"] >= 1).all()
    part = con.sql("""
        SELECT l_suppkey, COUNT(DISTINCT l_orderkey) AS n
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F' GROUP BY l_suppkey
    """).df().set_index("l_suppkey")["n"]
    assert all(int(w) <= int(part.get(int(s), 0))
               for s, w in zip(got["s_suppkey"], got["numwait"]))


def test_lineitem_scd2_pit_parity(ray_session, con):
    """PIT join parity plus the temporal laws: v_asof=0 facts always
    match the base version; v_asof=1 facts on deleted keys (hb<100)
    vanish; no fact matches more than one dimension interval."""
    from kgray.pipelines.relational import lineitem_scd2_pit

    got = _parity(lineitem_scd2_pit, con, "lineitem_scd2_pit")
    li = con.sql("SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln "
                 "FROM lineitem").df()
    v0 = (li["ln"] % 2 == 0).sum()
    assert (got["v_asof"] == 0).sum() == v0          # base always matches
    deleted = con.sql("""
        SELECT o_orderkey FROM (
          SELECT o_orderkey, CAST(('0x' || substr(md5(CAST(o_orderkey AS
                 VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS hb FROM orders)
        WHERE hb < 100
    """).df()["o_orderkey"]
    hit = got[(got["v_asof"] == 1)
              & got["o_orderkey"].isin(set(deleted))]
    assert len(hit) == 0                             # deletes close the key
    # each surviving v1 fact matches exactly ONE interval: total output
    # = v0 facts + v1 facts minus v1 facts on deleted keys ((l_orderkey,
    # l_linenumber) is NOT unique in this synthetic lineitem — match
    # counts follow fact multiplicity, so count rows, not distinct keys)
    v1 = li[li["ln"] % 2 == 1]
    v1_deleted = v1["l_orderkey"].isin(set(deleted)).sum()
    assert len(got) == v0 + len(v1) - v1_deleted


def test_orders_snapshot_diff_parity(ray_session, con):
    """Diff parity plus the rule-derived composition: removed = hb<100
    keys, added = hb>=900 clones, changed = 100<=hb<300 repriced keys —
    and no key classified twice."""
    from kgray.pipelines.relational import orders_snapshot_diff

    got = _parity(orders_snapshot_diff, con, "orders_snapshot_diff")
    hb = con.sql("""
        SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
               AS BIGINT) % 1000 AS hb FROM orders""").df()["hb"]
    counts = got["change_type"].value_counts()
    assert counts.get("removed", 0) == (hb < 100).sum()
    assert counts.get("added", 0) == (hb >= 900).sum()
    assert counts.get("changed", 0) == ((hb >= 100) & (hb < 300)).sum()
    assert not got.duplicated(["key"]).any()


def test_nation_year_profit_parity(ray_session, con):
    """Q9 shape at sf0.001 — every (nation, year) cell bitwise, plus
    the grouping is genuinely two-dimensional (multiple years per
    nation)."""
    from kgray.pipelines.relational import nation_year_profit

    _parity(lambda sf: nation_year_profit(sf), con, "nation_year_profit")
    got = _to_pandas(nation_year_profit(SF))
    assert got.groupby("n_name")["o_year"].nunique().max() > 1


def test_top_part_supplier_parity(ray_session, con):
    """Q2 groupwise-argmax shape: one winner per qualifying part, max
    total with the lower-suppkey tiebreak."""
    from kgray.pipelines.relational import top_part_supplier

    _parity(lambda sf: top_part_supplier(sf), con, "top_part_supplier")
    got = _to_pandas(top_part_supplier(SF))
    assert got.p_partkey.is_unique and len(got) > 0


def test_order_value_percent_rank_parity(ray_session, con):
    """PERCENT_RANK/CUME_DIST parity incl. the n=1 group and tied
    values (peers must share both statistics)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgray.pipelines.relational import order_value_percent_rank

    _parity(lambda sf: order_value_percent_rank(sf), con,
            "order_value_percent_rank")

    # synthetic: a singleton group and a fully-tied group
    tmp = "/tmp/kgray_pctrank_edge"
    import os
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "o_orderpriority": pa.array(["solo", "tied", "tied", "tied", "mix"]),
        "o_totalprice": pa.array([9.0, 5.0, 5.0, 5.0, 1.0]),
    }), f"{tmp}/orders.parquet")
    got = _to_pandas(order_value_percent_rank(tmp)) \
        .sort_values("o_orderkey", ignore_index=True)
    assert got.loc[0, "pct_rank"] == 0.0 and got.loc[0, "cume_dist"] == 1.0
    assert (got.loc[1:3, "pct_rank"] == 0.0).all()
    assert (got.loc[1:3, "cume_dist"] == 1.0).all()


def test_shipmode_priority_counts_parity(ray_session, con):
    """Q12 shape: sf0.001 parity at a NON-default year (the gate pins
    the default), plus the CASE-split invariant high+low == join size."""
    from kgray.pipelines.relational import shipmode_priority_counts

    got = _norm(_to_pandas(shipmode_priority_counts(SF, year="1997")))
    exp = _norm(con.sql("""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag""").df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                  check_exact=True)
    n_join = con.sql("""
        SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'""").fetchone()[0]
    assert int((got["high_line_count"] + got["low_line_count"]).sum()) \
        == n_join


def test_part_clustering_coefficient_invariants(ray_session):
    """cc ∈ [0, 1]; Σ per-node triangle counts = 3 × enumerated
    triangles; degree-1 nodes score exactly 0."""
    from kgray.pipelines.relational import (copurchase_triangles,
                                            part_clustering_coefficient)

    got = _to_pandas(part_clustering_coefficient(SF))
    n_tris = _to_pandas(copurchase_triangles(SF)).shape[0]
    assert got["n_tri"].sum() == 3 * n_tris
    assert ((got["clustering"] >= 0) & (got["clustering"] <= 1)).all()
    assert (got.loc[got["degree"] == 1, "clustering"] == 0).all()
    assert (got["degree"] >= 1).all()


def test_triple_itemsets_apriori_lossless(ray_session, con):
    """A-priori pruning is lossless under set semantics: the two-pass
    pruned plan equals the unpruned three-way DISTINCT self-join at
    support 2, and every reported triple's three sub-pairs meet the
    same support (downward closure, verified on the output)."""
    from kgray.pipelines.relational import copurchase_triple_itemsets

    got = _norm(_to_pandas(copurchase_triple_itemsets(SF, min_support=2)))
    exp = _norm(con.sql("""
        WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                    FROM lineitem)
        SELECT a.p AS part_a, b.p AS part_b, c.p AS part_c,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
             JOIN op c ON b.o = c.o AND b.p < c.p
        GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2""").df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                  check_exact=True)
    pair_support = {(a, b): n for a, b, n in con.sql("""
        WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                    FROM lineitem)
        SELECT a.p, b.p, COUNT(*) FROM op a
        JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2""").fetchall()}
    for r in got.itertuples():
        for pr in [(r.part_a, r.part_b), (r.part_a, r.part_c),
                   (r.part_b, r.part_c)]:
            assert pair_support[pr] >= 2


def test_negative_samples_exclusion_and_bounds(ray_session, con):
    """No sampled negative is a positive pair, no self-pairs, at most
    k = 5 per anchor, attempts strictly within 1..16 — and every anchor
    with ≥ 5 surviving candidates gets exactly 5."""
    from kgray.pipelines.relational import part_negative_samples

    got = _to_pandas(part_negative_samples(SF))
    pos = {(min(a, b), max(a, b)) for a, b in con.sql("""
        SELECT l1.l_partkey, l2.l_partkey
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l1.l_partkey < l2.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2""").fetchall()}
    assert len(got) > 0
    for r in got.itertuples():
        assert r.anchor != r.neg_part
        assert (min(r.anchor, r.neg_part),
                max(r.anchor, r.neg_part)) not in pos
        assert 1 <= r.attempt <= 16
    counts = got.groupby("anchor").size()
    assert (counts <= 5).all() and (counts == 5).mean() > 0.9


def test_join_profile_predicts_actual_join_size(ray_session, con):
    """The profile's total equals the ACTUAL join cardinality — the
    estimator is exact, not an estimate."""
    from kgray.pipelines.relational import events_orders_join_profile

    got = _to_pandas(events_orders_join_profile(SF))
    actual = con.sql("""
        SELECT COUNT(*) FROM events JOIN orders
        ON user_id = o_custkey""").fetchone()[0]
    assert (got["total_join_rows"] == actual).all()
    assert (got["join_rows"] == got["n_events"] * got["n_orders"]).all()
