"""priority_counts_ivm: the signed-delta maintenance law — the
incrementally-maintained view must equal a full recompute bitwise —
plus retraction bookkeeping invariants."""

import duckdb
import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _hb(keys):
    return np.array([int(hashlib.md5(str(int(k)).encode()
                                     ).hexdigest()[:8], 16) % 1000
                     for k in keys])


def test_ivm_equals_recompute(ray_session):
    import __ray_entry__ as entrymod
    from kgray.pipelines.relational import priority_counts_ivm

    got = priority_counts_ivm(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{SF}/orders.parquet')")
    exp = con.sql(entrymod.oracle_sql()["priority_counts_ivm"]).df()
    got = got.sort_values("o_orderpriority", ignore_index=True)
    exp = exp.sort_values("o_orderpriority", ignore_index=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp,
                                  check_dtype=True, check_exact=True)


def test_ivm_deltas_actually_retract(ray_session):
    """Deletes must make counts strictly smaller than the base view —
    the property the insert-only IVM cannot express."""
    from kgray.pipelines.relational import priority_counts_ivm

    base = pq.read_table(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderpriority"]
                         ).to_pandas()
    hb = _hb(base["o_orderkey"])
    got = priority_counts_ivm(SF).to_pandas()
    n_deleted = int((hb < 100).sum())
    assert n_deleted > 0
    assert got["n_orders"].sum() == len(base) - n_deleted
    # every non-urgent priority lost rows (deletes + urgency moves)
    base_counts = base["o_orderpriority"].value_counts()
    for _, r in got.iterrows():
        if r["o_orderpriority"] != "1-URGENT":
            assert r["n_orders"] < base_counts[r["o_orderpriority"]]
