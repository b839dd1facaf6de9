"""Session-6 operators: triangle enumeration on the co-purchase graph,
predicate-pushdown scan aggregate (Q6), promo revenue share (Q14),
large-orders HAVING join (Q18), and vectorized JSON-field extraction —
each pinned against DuckDB on planted synthetic data (not the shared
testdata, so edge cases are controlled: isolated edges, degenerate
cliques, empty filter windows, missing JSON keys)."""

import duckdb
import numpy as np
import pytest
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def _write(dirpath, name, df):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{dirpath}/{name}.parquet")


# ------------------------------------------------------------- triangles
def test_copurchase_triangles_matches_duckdb(ray_session, tmp_path):
    # planted graph: orders that induce a 4-clique (via repeated
    # co-purchase), a path (no triangle), and an isolated edge
    rng = np.random.default_rng(11)
    rows = []
    oid = 0
    for _ in range(3):            # 4-clique on parts 1..4, support 3 ≥ 2
        oid += 1
        rows += [(oid, p) for p in (1, 2, 3, 4)]
    for _ in range(2):            # path 10-11-12 (no closing edge)
        oid += 1
        rows += [(oid, 10), (oid, 11)]
        oid += 1
        rows += [(oid, 11), (oid, 12)]
    for _ in range(2):            # isolated edge 20-21
        oid += 1
        rows += [(oid, 20), (oid, 21)]
    for _ in range(40):           # random noise orders (support mostly 1)
        oid += 1
        parts = rng.choice(np.arange(30, 60), size=3, replace=False)
        rows += [(oid, int(p)) for p in parts]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]
                      ).astype(np.int64)
    _write(tmp_path, "lineitem", li)

    from kgray.pipelines.relational import copurchase_triangles
    got = (copurchase_triangles(str(tmp_path), min_count=2)
           .to_pandas().sort_values(["part_a", "part_b", "part_c"],
                                    ignore_index=True))

    con = duckdb.connect()
    con.register("lineitem", li)
    exp = con.sql("""
        WITH e AS (
            SELECT l1.l_partkey a, l2.l_partkey b
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        )
        SELECT e1.a part_a, e1.b part_b, e2.b part_c
        FROM e e1 JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
        ORDER BY 1, 2, 3
    """).df()
    # the 4-clique contributes C(4,3)=4 triangles; nothing else closes
    assert len(got) == 4
    pd.testing.assert_frame_equal(got, exp.astype(np.int64))


# ------------------------------------------------- Q6 / Q14 / Q18 family
def _tpch_tables(tmp_path, n_orders=400, seed=3):
    rng = np.random.default_rng(seed)
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_orders, dtype=np.int64),
        "o_custkey": rng.integers(0, 50, n_orders).astype(np.int64),
        "o_orderdate": pd.to_datetime("1996-06-01")
        + pd.to_timedelta(rng.integers(0, 900, n_orders), unit="D"),
        "o_totalprice": np.round(rng.uniform(10, 5e4, n_orders), 2),
    })
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    n_li = n_orders * 4
    li = pd.DataFrame({
        "l_orderkey": rng.integers(0, n_orders, n_li).astype(np.int64),
        "l_partkey": rng.integers(0, 80, n_li).astype(np.int64),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(100, 9e4, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_shipdate": (pd.to_datetime("1996-06-01")
                       + pd.to_timedelta(rng.integers(0, 900, n_li),
                                         unit="D")),
    })
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")
    part = pd.DataFrame({
        "p_partkey": np.arange(80, dtype=np.int64),
        "p_type": [["PROMO", "STANDARD", "ECONOMY"][i % 3]
                   for i in range(80)],
    })
    cust = pd.DataFrame({
        "c_custkey": np.arange(50, dtype=np.int64),
        "c_name": [f"Customer#{i:06d}" for i in range(50)],
    })
    for name, df in (("orders", orders), ("lineitem", li),
                     ("part", part), ("customer", cust)):
        _write(tmp_path, name, df)
    con = duckdb.connect()
    for name, df in (("orders", orders), ("lineitem", li),
                     ("part", part), ("customer", cust)):
        con.register(name, df)
    return con


def test_revenue_forecast_matches_duckdb(ray_session, tmp_path):
    con = _tpch_tables(tmp_path)
    from kgray.pipelines.relational import revenue_forecast
    got = revenue_forecast(str(tmp_path)).to_pandas()
    exp = con.sql("""
        SELECT CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice * l_discount
                   * 100.0 + 0.5) AS BIGINT)), 0) AS BIGINT) revenue_cents,
               COUNT(*) n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24.0
    """).df()
    assert got["n_items"][0] > 0            # non-vacuous
    assert got["revenue_cents"][0] == exp["revenue_cents"][0]
    assert got["n_items"][0] == exp["n_items"][0]


def test_promo_revenue_share_matches_duckdb(ray_session, tmp_path):
    con = _tpch_tables(tmp_path)
    from kgray.pipelines.relational import promo_revenue_share
    got = promo_revenue_share(str(tmp_path)).to_pandas()
    exp = con.sql("""
        WITH j AS (SELECT CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                        * 100.0 + 0.5) AS BIGINT) rc, p_type
                   FROM lineitem JOIN part ON l_partkey = p_partkey
                   WHERE l_shipdate >= TIMESTAMP '1997-09-01'
                     AND l_shipdate < TIMESTAMP '1997-10-01')
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rc ELSE 0 END)
                    AS BIGINT) promo_cents,
               CAST(SUM(rc) AS BIGINT) total_cents,
               CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rc ELSE 0 END)
                    AS BIGINT) * 100.0 / CAST(SUM(rc) AS BIGINT) promo_share
        FROM j
    """).df()
    assert got["total_cents"][0] > 0
    assert got["promo_cents"][0] == exp["promo_cents"][0]
    assert got["total_cents"][0] == exp["total_cents"][0]
    assert got["promo_share"][0] == exp["promo_share"][0]   # bitwise


def test_large_orders_matches_duckdb(ray_session, tmp_path):
    con = _tpch_tables(tmp_path)
    from kgray.pipelines.relational import large_orders
    got = (large_orders(str(tmp_path), min_qty=120).to_pandas()
           .sort_values("orderkey", ignore_index=True))
    exp = con.sql("""
        WITH big AS (SELECT l_orderkey,
                            CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT))
                                 AS BIGINT) sum_qty
                     FROM lineitem GROUP BY 1 HAVING sum_qty > 120)
        SELECT o.o_orderkey orderkey, big.sum_qty, o.o_custkey c_custkey,
               o.o_orderdate,
               CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                   total_cents,
               c.c_name
        FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY orderkey
    """).df()
    assert len(got) == len(exp) and len(got) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)])


# --------------------------------------------------- JSON-field extraction
def test_event_props_stats_matches_duckdb(ray_session, tmp_path):
    rng = np.random.default_rng(9)
    n = 3000
    ks = rng.integers(-50, 500, n)
    types = rng.choice(["view", "click", "purchase"], n)
    props = [f'{{"k": {k}}}' if i % 17 else '{"other": 1}'
             for i, k in enumerate(ks)]          # some rows lack the key
    ev = pd.DataFrame({"event_type": types, "props": props})
    _write(tmp_path, "events", ev)

    from kgray.pipelines.relational import event_props_stats
    got = (event_props_stats(str(tmp_path)).to_pandas()
           .sort_values("event_type", ignore_index=True))
    con = duckdb.connect()
    con.register("events", ev)
    exp = con.sql("""
        SELECT event_type, COUNT(*) n_events,
               CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) sum_k,
               MIN(CAST(props->>'$.k' AS BIGINT)) min_k,
               MAX(CAST(props->>'$.k' AS BIGINT)) max_k
        FROM events WHERE props->>'$.k' IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """).df()
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


# ----------------------------------------------- correlated subquery
def test_orders_above_cust_avg_matches_duckdb(ray_session, tmp_path):
    con = _tpch_tables(tmp_path)
    from kgray.pipelines.relational import orders_above_cust_avg
    got = (orders_above_cust_avg(str(tmp_path)).to_pandas()
           .sort_values("o_orderkey", ignore_index=True))
    exp = con.sql("""
        WITH a AS (SELECT o_custkey,
                          CAST(SUM(CAST(FLOOR(o_totalprice*100.0+0.5)
                               AS BIGINT)) AS BIGINT) sum_cents,
                          COUNT(*) n_orders
                   FROM orders GROUP BY 1)
        SELECT o.o_orderkey, o.o_custkey,
               CAST(FLOOR(o.o_totalprice*100.0+0.5) AS BIGINT) total_cents
        FROM orders o JOIN a USING (o_custkey)
        WHERE CAST(FLOOR(o.o_totalprice*100.0+0.5) AS BIGINT) * a.n_orders
              > a.sum_cents
        ORDER BY o_orderkey
    """).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


# ------------------------------------------------- FK integrity audit
def test_fk_orphan_audit_counts_planted_orphans(ray_session, tmp_path):
    rng = np.random.default_rng(21)
    n = 4000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["view", "click"], n),
        "user_id": rng.integers(0, 40, n).astype(np.int64)})
    cust = pd.DataFrame({"c_custkey": np.arange(40, dtype=np.int64)})
    _write(tmp_path, "events", ev)
    _write(tmp_path, "customer", cust)

    from kgray.pipelines.relational import fk_orphan_audit
    got = (fk_orphan_audit(str(tmp_path)).to_pandas()
           .sort_values("event_type", ignore_index=True))
    con = duckdb.connect()
    con.register("events", ev)
    con.register("customer", cust)
    exp = con.sql("""
        WITH ev AS (SELECT event_type,
                      CASE WHEN CAST(('0x' || substr(md5(CAST(event_id
                           AS VARCHAR)),1,8)) AS BIGINT) % 1000 < 100
                           THEN user_id + 1000000 ELSE user_id END user_id
                    FROM events)
        SELECT ev.event_type, COUNT(*) n_events,
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) n_orphans
        FROM ev LEFT JOIN customer c ON ev.user_id = c.c_custkey
        GROUP BY 1 ORDER BY 1
    """).df()
    assert got["n_orphans"].sum() > 0          # injection really planted
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


# -------------------------------------------- substring-dedup masking
def test_dedup_substring_mask_planted(ray_session, tmp_path):
    # doc 0/1 share a 5-token phrase (coverage 5 tokens each);
    # doc 2 repeats a gram internally but shares nothing (df=1 -> 0);
    # doc 3 too short for any gram; doc 4 whitespace-only (excluded)
    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["aa bb cc dd ee xx yy",
                 "zz aa bb cc dd ee",
                 "pp qq rr pp qq rr",
                 "one two",
                 "   "]})
    _write(tmp_path, "documents", docs)

    from kgray.pipelines.text import dedup_substring_mask
    got = (dedup_substring_mask(str(tmp_path)).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert list(got["doc_id"]) == [0, 1, 2, 3]       # blank doc excluded
    by = got.set_index("doc_id")
    # shared 'aa bb cc dd ee' covers positions of its 3 trigram spans = 5
    assert by.loc[0, "n_masked"] == 5
    assert by.loc[1, "n_masked"] == 5
    assert by.loc[2, "n_masked"] == 0      # internal repeats, df=1
    assert by.loc[3, "n_masked"] == 0      # no trigrams at all
    assert by.loc[0, "n_tokens"] == 7 and by.loc[3, "n_tokens"] == 2
    assert by.loc[1, "masked_fraction"] == 5.0 / 6.0


# ---------------------------------------------------- raw log-line source
def test_textlog_source_roundtrip(ray_session, tmp_path):
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.arange(200), unit="min")
    ev = pd.DataFrame({
        "event_id": np.arange(200, dtype=np.int64),
        "ts": ts.astype("datetime64[us]"),
        "user_id": np.arange(200, dtype=np.int64) % 9,
        "event_type": ["view", "click"] * 100,
        "value": np.round(np.random.default_rng(2).uniform(0, 100, 200), 7),
        "props": ["{}"] * 200})
    _write(tmp_path, "events", ev)

    from kgray.sources.textlog import events_to_log, read_events_log
    parsed = (read_events_log(events_to_log(str(tmp_path),
                                            root=str(tmp_path) + "/log"))
              .to_pandas().sort_values("event_id", ignore_index=True))
    assert len(parsed) == 200
    assert (parsed["user_id"] == ev["user_id"]).all()
    assert (parsed["event_type"] == ev["event_type"]).all()
    # repr round-trip + Arrow strtod == bitwise-equal floats
    assert (parsed["value"].to_numpy() == ev["value"].to_numpy()).all()


# ------------------------------------------------------------- CDC merge
def test_orders_cdc_latest_matches_duckdb(ray_session, tmp_path):
    con = _tpch_tables(tmp_path)
    from kgray.pipelines.relational import orders_cdc_latest
    got = (orders_cdc_latest(str(tmp_path)).to_pandas()
           .sort_values("o_orderkey", ignore_index=True))
    exp = con.sql("""
        WITH h AS (SELECT o_orderkey, o_totalprice,
                          CAST(('0x' || substr(md5(CAST(o_orderkey
                               AS VARCHAR)),1,8)) AS BIGINT) % 1000 hb
                   FROM orders),
        base AS (SELECT o_orderkey, 0 AS version, 'U' AS op,
                        o_totalprice AS price FROM orders),
        chg AS (SELECT o_orderkey, 1 AS version,
                       CASE WHEN hb < 100 THEN 'D' ELSE 'U' END AS op,
                       o_totalprice + 10.0 AS price
                FROM h WHERE hb < 300),
        allr AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
        latest AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                       ORDER BY version DESC) rn FROM allr)
        SELECT o_orderkey,
               CAST(FLOOR(price * 100.0 + 0.5) AS BIGINT) total_cents,
               CAST(version AS BIGINT) AS version
        FROM latest WHERE rn = 1 AND op = 'U'
        ORDER BY o_orderkey
    """).df()
    # deletes really removed rows; updates really bumped versions
    assert len(got) < 400 and (got["version"] == 1).any()
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


# --------------------------------------------------------------- skyline
def test_skyline_kernel_bruteforce():
    from kgray.pipelines.relational import _skyline_2d

    rng = np.random.default_rng(17)
    for trial in range(30):
        m = int(rng.integers(1, 60))
        # small value range plants many ties and duplicate points
        p = rng.integers(0, 8, m).astype(np.int64)
        d = rng.integers(0, 8, m).astype(np.int64)
        got = sorted(_skyline_2d(p, d).tolist())
        exp = [i for i in range(m)
               if not any((p[j] >= p[i]) and (d[j] >= d[i])
                          and (p[j] > p[i] or d[j] > d[i])
                          for j in range(m))]
        assert got == exp, (trial, p.tolist(), d.tolist())


def test_pareto_orders_matches_duckdb(ray_session, tmp_path):
    con = _tpch_tables(tmp_path)
    from kgray.pipelines.relational import pareto_orders
    got = (pareto_orders(str(tmp_path)).to_pandas()
           .sort_values("o_orderkey", ignore_index=True))
    exp = con.sql("""
        WITH o AS (SELECT o_orderkey,
                          CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT)
                              AS total_cents,
                          CAST(epoch_us(o_orderdate) AS BIGINT) AS date_us
                   FROM orders)
        SELECT o_orderkey, total_cents, date_us FROM o
        WHERE NOT EXISTS (SELECT 1 FROM o x
            WHERE x.total_cents >= o.total_cents
              AND x.date_us >= o.date_us
              AND (x.total_cents > o.total_cents OR x.date_us > o.date_us))
        ORDER BY o_orderkey
    """).df()
    assert 0 < len(got) < 400
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


# ------------------------------------------------- embedding dim profile
def test_embedding_dim_stats_matches_duckdb(ray_session, tmp_path):
    rng = np.random.default_rng(23)
    n, dim = 300, 7
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in emb],
                              type=pa.list_(pa.float32()))})
    pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")

    from kgray.pipelines.ann import embedding_dim_stats
    got = (embedding_dim_stats(str(tmp_path)).to_pandas()
           .sort_values("dim", ignore_index=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM read_parquet('{tmp_path}/embeddings.parquet')")
    exp = con.sql("""
        WITH e AS (SELECT generate_subscripts(embedding, 1) AS dim,
                          CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)
                               * 65536.0 + 0.5) AS BIGINT) AS q
                   FROM embeddings)
        SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
               CAST(SUM(q) AS BIGINT) AS sum_q,
               MIN(q) AS min_q, MAX(q) AS max_q
        FROM e GROUP BY dim ORDER BY dim
    """).df()
    assert len(got) == dim
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


# ------------------------------------------------------------------ TWAP
def test_user_value_twap_matches_duckdb(ray_session, tmp_path):
    rng = np.random.default_rng(31)
    n = 2500
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": (pd.to_datetime("2024-03-01")
               + pd.to_timedelta(rng.integers(0, 10**7, n), unit="ms")
               ).astype("datetime64[us]"),
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "event_type": ["view"] * n,
        "value": np.round(rng.uniform(0, 300, n), 2),
        "props": ["{}"] * n})
    # a single-event user exercises the span=0 NULL path
    ev.loc[0, "user_id"] = 999
    ev = ev[(ev.user_id != 999) | (ev.index == 0)]
    _write(tmp_path, "events", ev)

    from kgray.pipelines.relational import user_value_twap
    got = (user_value_twap(str(tmp_path)).to_pandas()
           .sort_values("user_id", ignore_index=True))
    con = duckdb.connect()
    con.register("events", ev)
    exp = con.sql("""
        WITH e AS (SELECT user_id, event_id,
                          CAST(epoch_us(ts) AS BIGINT) ev_us,
                          CAST(FLOOR(value*100.0+0.5) AS BIGINT) vc
                   FROM events),
        l AS (SELECT user_id, vc, ev_us,
                     LEAD(ev_us) OVER (PARTITION BY user_id
                         ORDER BY ev_us, event_id) nxt FROM e),
        w AS (SELECT user_id, CAST(SUM(vc * ((nxt - ev_us) // 1000))
                     AS BIGINT) wsum
              FROM l WHERE nxt IS NOT NULL GROUP BY user_id),
        b AS (SELECT user_id, COUNT(*) n_events, MIN(ev_us) mn,
                     MAX(ev_us) mx FROM e GROUP BY user_id)
        SELECT b.user_id, b.n_events, (b.mx - b.mn) // 1000 AS span_ms,
               CAST(COALESCE(w.wsum, 0) AS BIGINT) AS wsum,
               CASE WHEN (b.mx - b.mn) // 1000 = 0 THEN NULL
                    ELSE CAST(COALESCE(w.wsum,0) AS DOUBLE)
                         / CAST((b.mx - b.mn) // 1000 AS DOUBLE)
               END AS twap_cents
        FROM b LEFT JOIN w USING (user_id) ORDER BY user_id
    """).df()
    assert got["twap_cents"].isna().sum() == 1      # the 1-event user
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


# ------------------------------------------------------ inverted index
def test_token_postings_matches_duckdb(ray_session, tmp_path):
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["aa bb cc", "bb cc dd", "aa aa aa",  # repeats: 1 posting
                 "", "  ", "cc"]})
    _write(tmp_path, "documents", docs)

    from kgray.pipelines.text import token_postings
    got = (token_postings(str(tmp_path)).to_pandas()
           .sort_values("token", ignore_index=True))
    assert list(got["token"]) == ["aa", "bb", "cc", "dd"]
    by = got.set_index("token")
    assert by.loc["aa", "postings"] == "0,2"
    assert by.loc["cc", "postings"] == "0,1,5"
    assert by.loc["cc", "n_docs"] == 3


# ----------------------------------------------------- degree histogram
def test_copurchase_degree_hist_matches_duckdb(ray_session, tmp_path):
    rng = np.random.default_rng(41)
    rows = []
    oid = 0
    for _ in range(3):                     # star: hub 1 with spokes 2..5
        for spoke in (2, 3, 4, 5):
            oid += 1
            rows += [(oid, 1), (oid, spoke)]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]
                      ).astype(np.int64)
    _write(tmp_path, "lineitem", li)

    from kgray.pipelines.relational import copurchase_degree_hist
    got = (copurchase_degree_hist(str(tmp_path)).to_pandas()
           .sort_values("degree", ignore_index=True))
    # hub degree 4 (1 node), spokes degree 1 (4 nodes)
    assert got.to_dict("records") == [
        {"degree": 1, "n_nodes": 4}, {"degree": 4, "n_nodes": 1}]


# ------------------------------------------------------- winsorized agg
def test_events_value_winsorized_matches_duckdb(ray_session, tmp_path):
    rng = np.random.default_rng(51)
    n = 3000
    vals = rng.uniform(0, 100, n)
    vals[rng.integers(0, n, 30)] *= 1000          # planted fat tail
    ev = pd.DataFrame({
        "event_type": rng.choice(["a", "b"], n),
        "value": np.round(vals, 2)})
    _write(tmp_path, "events", ev)

    from kgray.pipelines.relational import events_value_winsorized
    got = (events_value_winsorized(str(tmp_path)).to_pandas()
           .sort_values("event_type", ignore_index=True))
    con = duckdb.connect()
    con.register("events", ev)
    exp = con.sql("""
        WITH c AS (SELECT event_type,
                          CAST(FLOOR(value*100.0+0.5) AS BIGINT) vc
                   FROM events),
        q AS (SELECT event_type, quantile_disc(vc, 0.05) lo,
                     quantile_disc(vc, 0.95) hi FROM c GROUP BY 1)
        SELECT c.event_type, COUNT(*) n_events,
               CAST(SUM(vc) AS BIGINT) sum_cents,
               CAST(SUM(LEAST(GREATEST(vc, lo), hi)) AS BIGINT)
                   winsor_cents,
               CAST(SUM(CASE WHEN vc < lo OR vc > hi THEN 1 ELSE 0 END)
                    AS BIGINT) n_clipped
        FROM c JOIN q USING (event_type) GROUP BY 1 ORDER BY 1
    """).df()
    assert (got["n_clipped"] > 0).all()          # tails really clipped
    assert (got["winsor_cents"] < got["sum_cents"]).all()
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


# ------------------------------------------------------ key-skew report
def test_user_key_skew_matches_duckdb(ray_session, tmp_path):
    rng = np.random.default_rng(61)
    # zipf-ish: one hot key with half the rows
    uid = np.where(rng.random(4000) < 0.5, 7,
                   rng.integers(0, 200, 4000)).astype(np.int64)
    ev = pd.DataFrame({"user_id": uid})
    _write(tmp_path, "events", ev)

    from kgray.pipelines.relational import user_key_skew
    got = user_key_skew(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.register("events", ev)
    exp = con.sql("""
        WITH c AS (SELECT user_id, COUNT(*) cnt FROM events GROUP BY 1),
        s AS (SELECT COUNT(*) n_keys, CAST(SUM(cnt) AS BIGINT) n_rows,
                     MAX(cnt) max_count, CAST(SUM(cnt*cnt) AS BIGINT) sum_sq
              FROM c)
        SELECT n_keys, n_rows, max_count, sum_sq,
               CAST(max_count AS DOUBLE) / CAST(n_rows AS DOUBLE) top_share,
               CAST(sum_sq AS DOUBLE) / CAST(n_rows * n_rows AS DOUBLE) hhi
        FROM s
    """).df()
    assert got["top_share"][0] > 0.4             # skew really planted
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


# ---------------------------------------------------------- RFM segments
def test_customer_rfm_segments_matches_duckdb(ray_session, tmp_path):
    con = _tpch_tables(tmp_path)
    from kgray.pipelines.relational import customer_rfm_segments
    got = (customer_rfm_segments(str(tmp_path)).to_pandas()
           .sort_values("c_custkey", ignore_index=True))
    exp = con.sql("""
        WITH m AS (SELECT o_custkey c_custkey,
                          MAX(CAST(epoch_us(o_orderdate) AS BIGINT)) r_us,
                          COUNT(*) f,
                          CAST(SUM(CAST(FLOOR(o_totalprice*100.0+0.5)
                               AS BIGINT)) AS BIGINT) m_cents
                   FROM orders GROUP BY 1),
        q AS (SELECT quantile_disc(r_us, 0.25) r1, quantile_disc(r_us, 0.50) r2,
                     quantile_disc(r_us, 0.75) r3, quantile_disc(f, 0.25) f1,
                     quantile_disc(f, 0.50) f2, quantile_disc(f, 0.75) f3,
                     quantile_disc(m_cents, 0.25) m1,
                     quantile_disc(m_cents, 0.50) m2,
                     quantile_disc(m_cents, 0.75) m3 FROM m),
        s AS (SELECT m.*,
                     1 + CAST(r_us > r1 AS BIGINT) + CAST(r_us > r2 AS BIGINT)
                       + CAST(r_us > r3 AS BIGINT) AS r_score,
                     1 + CAST(f > f1 AS BIGINT) + CAST(f > f2 AS BIGINT)
                       + CAST(f > f3 AS BIGINT) AS f_score,
                     1 + CAST(m_cents > m1 AS BIGINT)
                       + CAST(m_cents > m2 AS BIGINT)
                       + CAST(m_cents > m3 AS BIGINT) AS m_score
              FROM m, q)
        SELECT c_custkey, r_us, f, m_cents, r_score, f_score, m_score,
               CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                   || CAST(m_score AS VARCHAR) AS segment
        FROM s ORDER BY c_custkey
    """).df()
    assert set(got["r_score"]) <= {1, 2, 3, 4}
    assert got["segment"].nunique() > 5          # real spread
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


# ----------------------------------------------------- transition matrix
def test_event_type_transitions_matches_duckdb(ray_session, tmp_path):
    rng = np.random.default_rng(71)
    n = 3000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": (pd.to_datetime("2024-05-01")
               + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s")
               ).astype("datetime64[us]"),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "event_type": rng.choice(["view", "click", "purchase"], n)})
    _write(tmp_path, "events", ev)

    from kgray.pipelines.relational import event_type_transitions
    got = (event_type_transitions(str(tmp_path)).to_pandas()
           .sort_values(["from_type", "to_type"], ignore_index=True))
    con = duckdb.connect()
    con.register("events", ev)
    exp = con.sql("""
        WITH l AS (SELECT user_id, event_type,
                          LAG(event_type) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) from_type
                   FROM events)
        SELECT from_type, event_type to_type, COUNT(*) n
        FROM l WHERE from_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    assert got["n"].sum() == n - 40              # n - one per user
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


# --------------------------------------------------- calendar functions
def test_orders_seasonality_and_growth(ray_session, tmp_path):
    con = _tpch_tables(tmp_path, n_orders=600, seed=13)
    from kgray.pipelines.relational import (orders_monthly_seasonality,
                                            orders_quarter_growth)
    got = (orders_monthly_seasonality(str(tmp_path)).to_pandas()
           .sort_values(["year", "month"], ignore_index=True))
    exp = con.sql("""
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS year,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS month,
               COUNT(*) n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT))
                    AS BIGINT) revenue_cents
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])

    g = (orders_quarter_growth(str(tmp_path)).to_pandas()
         .sort_values(["year", "quarter"], ignore_index=True))
    ge = con.sql("""
        WITH q AS (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
                       AS year,
                   CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT)
                       AS quarter,
                   CAST(SUM(CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT))
                        AS BIGINT) revenue_cents
                   FROM orders GROUP BY 1, 2),
        l AS (SELECT *, LAG(revenue_cents) OVER (ORDER BY year, quarter)
                  prev_cents FROM q)
        SELECT year, quarter, revenue_cents, prev_cents,
               CASE WHEN prev_cents IS NULL OR prev_cents = 0 THEN NULL
                    ELSE (revenue_cents - prev_cents) * 100.0 / prev_cents
               END growth_pct
        FROM l ORDER BY year, quarter
    """).df()
    assert pd.isna(g["growth_pct"][0]) and g["growth_pct"].notna().sum() > 0
    pd.testing.assert_frame_equal(g[sorted(g.columns)],
                                  ge[sorted(ge.columns)])


# ------------------------------------------------------ gaps-and-islands
def test_user_weekly_streaks_planted(ray_session, tmp_path):
    # user 1: weeks 0,1,2, 5,6, 9        -> n_weeks 6, max_streak 3
    # user 2: weeks 4                    -> n_weeks 1, max_streak 1
    # user 3: weeks 0..7 consecutive     -> n_weeks 8, max_streak 8
    # duplicate events within a week must not inflate anything
    week_us = 7 * 86_400_000_000
    rows = []
    for uid, weeks in ((1, [0, 1, 2, 5, 6, 9]), (2, [4]),
                       (3, list(range(8)))):
        for w in weeks:
            for rep in range(2):              # two events per week
                rows.append((uid, (w * 7 - 3 + rep) * 86_400_000_000))
    ev = pd.DataFrame(rows, columns=["user_id", "us"])
    ev["ts"] = pd.to_datetime(ev.pop("us"), unit="us").astype(
        "datetime64[us]")
    ev["user_id"] = ev["user_id"].astype(np.int64)
    _write(tmp_path, "events", ev)

    from kgray.pipelines.relational import user_weekly_streaks
    got = (user_weekly_streaks(str(tmp_path)).to_pandas()
           .sort_values("user_id", ignore_index=True))
    assert got.to_dict("records") == [
        {"user_id": 1, "n_weeks": 6, "max_streak": 3},
        {"user_id": 2, "n_weeks": 1, "max_streak": 1},
        {"user_id": 3, "n_weeks": 8, "max_streak": 8}]

    con = duckdb.connect()
    con.register("events", ev)
    exp = con.sql("""
        WITH w AS (SELECT DISTINCT user_id,
                          (CAST(epoch_us(ts) AS BIGINT) // 86400000000
                           + 3) // 7 AS week FROM events),
        g AS (SELECT user_id, week, week - ROW_NUMBER() OVER (
                  PARTITION BY user_id ORDER BY week) AS grp FROM w),
        s AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2)
        SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_weeks,
               MAX(len) AS max_streak
        FROM s GROUP BY user_id ORDER BY user_id
    """).df()
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


# ------------------------------------------- incremental view maintenance
def test_events_hourly_incremental_merge_law(ray_session, tmp_path):
    rng = np.random.default_rng(91)
    n = 4000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": (pd.to_datetime("2024-06-01")
               + pd.to_timedelta(rng.integers(0, 3 * 86400, n), unit="s")
               ).astype("datetime64[us]"),
        "event_type": rng.choice(["a", "b"], n),
        "value": np.round(rng.uniform(0, 500, n), 2)})
    _write(tmp_path, "events", ev)

    from kgray.pipelines.relational import events_hourly_incremental
    got = (events_hourly_incremental(str(tmp_path)).to_pandas()
           .sort_values(["event_type", "epoch_hour"], ignore_index=True))
    con = duckdb.connect()
    con.register("events", ev)
    exp = con.sql("""
        SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS epoch_hour,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value*100.0+0.5) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    # merge(base_agg, delta_agg) must equal the full recompute exactly
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


# ---------------------------------------------------- Wilson bound / PMI
def test_events_ctr_wilson_matches_duckdb(ray_session, tmp_path):
    rng = np.random.default_rng(97)
    n = 3000
    ev = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": np.round(rng.uniform(0, 600, n), 2)})
    _write(tmp_path, "events", ev)

    from kgray.pipelines.relational import events_ctr_wilson
    got = (events_ctr_wilson(str(tmp_path)).to_pandas()
           .sort_values("event_type", ignore_index=True))
    con = duckdb.connect()
    con.register("events", ev)
    exp = con.sql("""
        WITH a AS (SELECT event_type, COUNT(*) n,
                          CAST(SUM(CASE WHEN CAST(FLOOR(value*100.0+0.5)
                               AS BIGINT) > 25000 THEN 1 ELSE 0 END)
                               AS BIGINT) k
                   FROM events GROUP BY 1),
        w AS (SELECT event_type, n, k,
                     CAST(k AS DOUBLE)/CAST(n AS DOUBLE) p FROM a)
        SELECT event_type, n, k, p rate,
               ((p + 1.96e0*1.96e0/(2.0e0*n))
                - 1.96e0*sqrt(p*(1.0e0-p)/n + 1.96e0*1.96e0/(4.0e0*n*n)))
               / (1.0e0 + 1.96e0*1.96e0/n) wilson_lo
        FROM w ORDER BY event_type
    """).df()
    # the bound must be a real lower bound strictly below the estimate
    assert (got["wilson_lo"] < got["rate"]).all()
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


def test_copurchase_pmi_prefers_exclusive_pairs(ray_session, tmp_path):
    # parts 1-2 co-occur ONLY with each other (high affinity);
    # parts 10-11 are each very popular and co-occur incidentally:
    # PMI must rank (1,2) above (10,11)
    rows = []
    oid = 0
    for _ in range(3):
        oid += 1
        rows += [(oid, 1), (oid, 2)]
    for _ in range(20):                 # 10 and 11 in many orders
        oid += 1
        rows += [(oid, 10), (oid, 11), (oid, int(20 + oid % 9))]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]
                      ).astype(np.int64)
    _write(tmp_path, "lineitem", li)

    from kgray.pipelines.relational import copurchase_pmi
    got = copurchase_pmi(str(tmp_path)).to_pandas()
    by = {(r.part_a, r.part_b): r.pmi for r in got.itertuples()}
    assert by[(1, 2)] > by[(10, 11)]


# --------------------------------------------------------- burst detection
def test_events_hourly_bursts_planted(ray_session, tmp_path):
    # flat series of 10 events/hour for 50 hours, plus ONE 300-event
    # burst hour — only the burst must flag
    rows = []
    for h in range(50):
        n = 300 if h == 25 else 10
        for i in range(n):
            rows.append(("a", h * 3_600_000_000 + i * 1000))
    ev = pd.DataFrame(rows, columns=["event_type", "us"])
    ev["ts"] = pd.to_datetime(ev.pop("us"), unit="us").astype(
        "datetime64[us]")
    _write(tmp_path, "events", ev)

    from kgray.pipelines.relational import events_hourly_bursts
    got = events_hourly_bursts(str(tmp_path)).to_pandas()
    assert got.to_dict("records") == [
        {"event_type": "a", "epoch_hour": 25, "c": 300}]

    con = duckdb.connect()
    con.register("events", ev)
    exp = con.sql("""
        WITH h AS (SELECT event_type,
                          CAST(epoch_us(ts) AS BIGINT) // 3600000000
                              AS epoch_hour, COUNT(*) c
                   FROM events GROUP BY 1, 2),
        m AS (SELECT event_type, COUNT(*) t, CAST(SUM(c) AS BIGINT) s,
                     CAST(SUM(c*c) AS BIGINT) sxx FROM h GROUP BY 1)
        SELECT h.event_type, h.epoch_hour, h.c
        FROM h JOIN m USING (event_type)
        WHERE (h.c * m.t - m.s) > 0
          AND (h.c*m.t - m.s) * (h.c*m.t - m.s) > 9 * (m.t*m.sxx - m.s*m.s)
    """).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        exp[sorted(exp.columns)].reset_index(drop=True))


# ------------------------------------------------------ zone-map pruning
def test_range_layout_really_prunes(ray_session, tmp_path):
    from kgray.stages.layout import (files_overlapping, read_range,
                                     write_range_layout)

    rng = np.random.default_rng(101)
    n = 60_000
    src = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                        "v": rng.permutation(n).astype(np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(src)).repartition(12)
    out = str(tmp_path / "layout")
    write_range_layout(ds, "v", out)

    lo, hi = 10_000, 14_999
    kept, total = files_overlapping(out, "v", lo, hi)
    assert len(total) >= 8                    # really multi-file
    assert len(kept) < len(total)             # pruning actually happened

    got = sorted(read_range(out, "v", lo, hi).to_pandas()["v"])
    assert got == list(range(lo, hi + 1))     # exact band, no loss

    with pytest.raises(FileNotFoundError):
        read_range(out, "v", 10**9, 2 * 10**9)
