"""global_rank: DuckDB window parity (heavy ties, several
partitionings), single-row edge, null rejection, ★Q parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("n_parts", [1, 9, 16])
def test_global_rank_duckdb_parity_ties(ray_session, n_parts):
    from kgray.stages.globalrank import global_rank

    rng = np.random.default_rng(31)
    n = 3000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 40, n).astype(np.int64)})   # heavy ties
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(n_parts)
    got = _norm(global_rank(ds, "v").to_pandas())
    con = duckdb.connect()
    con.register("t", df)
    exp = _norm(con.sql("""
        SELECT id, v, CAST(RANK() OVER w AS BIGINT) AS rank,
               PERCENT_RANK() OVER w AS percent_rank,
               CUME_DIST() OVER w AS cume_dist
        FROM t WINDOW w AS (ORDER BY v)""").df())
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()],
                                  check_dtype=True, check_exact=True)


def test_global_rank_single_row(ray_session):
    from kgray.stages.globalrank import global_rank

    ds = rd.from_arrow(pa.table({"id": pa.array([7], type=pa.int64()),
                                 "v": pa.array([5], type=pa.int64())}))
    got = global_rank(ds, "v").to_pandas()
    assert got["rank"][0] == 1
    assert got["percent_rank"][0] == 0.0
    assert got["cume_dist"][0] == 1.0


def test_global_rank_null_rejected(ray_session):
    from kgray.stages.globalrank import global_rank

    ds = rd.from_arrow(pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "v": pa.array([3, None], type=pa.int64())}))
    with pytest.raises(Exception, match="null order value"):
        global_rank(ds, "v").to_pandas()


def test_order_price_global_rank_parity(ray_session):
    import __ray_entry__ as entrymod
    from kgray.pipelines.relational import order_price_global_rank

    sf = "/root/testdata/sf0.001"
    got = _norm(order_price_global_rank(sf).to_pandas())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{sf}/orders.parquet')")
    exp = _norm(con.sql(
        entrymod.oracle_sql()["order_price_global_rank"]).df())
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()],
                                  check_dtype=True, check_exact=True)
