"""exact_auc: brute-force Mann-Whitney oracle (heavy ties), class
edge cases, partitioning invariance, and the ★Q's DuckDB parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _brute_auc(scores, labels):
    """Textbook midrank AUC."""
    order = np.argsort(scores, kind="mergesort")
    s = np.asarray(scores)[order]
    l = np.asarray(labels)[order]
    ranks = np.empty(len(s), dtype=np.float64)
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0          # midrank of positions i+1..j
        i = j
    P = int(l.sum())
    N = len(l) - P
    return (ranks[l == 1].sum() - P * (P + 1) / 2.0) / (P * N)


@pytest.mark.parametrize("n_parts", [1, 7, 16])
def test_exact_auc_vs_brute_with_ties(ray_session, n_parts):
    from kgray.stages.metrics import exact_auc

    rng = np.random.default_rng(23)
    n = 4000
    scores = rng.integers(0, 60, n).astype(np.int64)     # heavy ties
    labels = (rng.random(n) < (scores / 80.0)).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "s": pa.array(scores), "y": pa.array(labels)})).repartition(n_parts)
    got = exact_auc(ds, "s", "y").to_pandas()
    assert got["n_pos"][0] == labels.sum()
    assert got["n_neg"][0] == n - labels.sum()
    assert got["auc"][0] == pytest.approx(_brute_auc(scores, labels),
                                          abs=1e-12)


def test_exact_auc_partition_invariant_bitwise(ray_session):
    from kgray.stages.metrics import exact_auc

    rng = np.random.default_rng(5)
    scores = rng.integers(0, 25, 2000).astype(np.int64)
    labels = rng.integers(0, 2, 2000).astype(np.int64)
    vals = []
    for p in (2, 11):
        ds = rd.from_arrow(pa.table({"s": pa.array(scores),
                                     "y": pa.array(labels)})).repartition(p)
        vals.append(exact_auc(ds, "s", "y").to_pandas()["auc"][0])
    assert vals[0] == vals[1]                   # bit-identical, not approx


def test_exact_auc_single_class_raises(ray_session):
    from kgray.stages.metrics import exact_auc

    ds = rd.from_arrow(pa.table({
        "s": pa.array([1, 2, 3], type=pa.int64()),
        "y": pa.array([1, 1, 1], type=pa.int64())}))
    with pytest.raises(Exception, match="both classes"):
        exact_auc(ds, "s", "y").to_pandas()


def test_chars_zh_auc_duckdb_parity(ray_session):
    import __ray_entry__ as entrymod
    from kgray.pipelines.text import chars_zh_auc

    sf = "/root/testdata/sf0.001"
    got = chars_zh_auc(sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    exp = con.sql(entrymod.oracle_sql()["chars_zh_auc"]).df()
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                  check_exact=True)
