"""Session-5 operators: bag-semantics set ops, grouped skewness /
kurtosis, RANGE-frame trailing windows, funnel / retention analytics,
gap-filled series, column profiling, and the edit-distance fuzzy join
— each pinned against DuckDB or a direct serial computation on
synthetic data with planted edge cases."""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


# ------------------------------------------------------------- set ops ALL
def test_set_op_all_rows_matches_duckdb(ray_session):
    from kgray.stages.setops import set_op

    rng = np.random.default_rng(5)
    ldf = pd.DataFrame({"x": rng.integers(0, 15, 3000)}).astype(np.int64)
    rdf = pd.DataFrame({"x": rng.integers(0, 15, 2600)}).astype(np.int64)
    left = rd.from_arrow(pa.Table.from_pandas(ldf)).repartition(7)
    right = rd.from_arrow(pa.Table.from_pandas(rdf)).repartition(5)

    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    for op, sql in (("except", "EXCEPT ALL"), ("intersect", "INTERSECT ALL"),
                    ("union", "UNION ALL")):
        exp = sorted(con.sql(
            f"SELECT x FROM l {sql} SELECT x FROM r").df()["x"])
        got = sorted(set_op(left, right, op, all_rows=True)
                     .to_pandas()["x"])
        assert got == exp, op


def test_set_op_all_rows_multiplicity_exact(ray_session):
    from kgray.stages.setops import set_op

    left = rd.from_arrow(pa.table({"x": pa.array([1, 1, 1, 2, 3],
                                                 type=pa.int64())}))
    right = rd.from_arrow(pa.table({"x": pa.array([1, 3, 3],
                                                  type=pa.int64())}))
    assert sorted(set_op(left, right, "except", all_rows=True)
                  .to_pandas()["x"]) == [1, 1, 2]
    assert sorted(set_op(left, right, "intersect", all_rows=True)
                  .to_pandas()["x"]) == [1, 3]
    assert sorted(set_op(left, right, "union", all_rows=True)
                  .to_pandas()["x"]) == [1, 1, 1, 1, 2, 3, 3, 3]


# --------------------------------------------------------- skew / kurtosis
def _serial_moments(vals):
    n = len(vals)
    sx = sum(int(v) for v in vals)
    sxx = sum(int(v) ** 2 for v in vals)
    sx3 = sum(int(v) ** 3 for v in vals)
    sx4 = sum(int(v) ** 4 for v in vals)
    nd = float(n)
    mu = float(sx) / nd
    m2 = float(sxx) / nd - mu * mu
    if n <= 1 or m2 <= 0.0:
        return None, None
    m3 = float(sx3) / nd - 3.0 * mu * (float(sxx) / nd) + 2.0 * mu * mu * mu
    m4 = (float(sx4) / nd - 4.0 * mu * (float(sx3) / nd)
          + 6.0 * mu * mu * (float(sxx) / nd) - 3.0 * mu * mu * mu * mu)
    s = math.sqrt(m2)
    return m3 / (s * s * s), m4 / (m2 * m2) - 3.0


def test_grouped_skew_kurt_exact_and_invariant(ray_session):
    from kgray.stages.stats import grouped_skew_kurt

    rng = np.random.default_rng(17)
    n = 20_000
    df = pd.DataFrame({
        "k": rng.integers(0, 4, n).astype(np.int64),
        "x": (rng.normal(5_000, 2_000, n) ** 2 // 17).astype(np.int64)})
    # planted degenerate groups: constant (m2 == 0) and singleton
    df = pd.concat([df,
                    pd.DataFrame({"k": [9, 9, 9, 8], "x": [7, 7, 7, 3]})],
                   ignore_index=True)
    outs = []
    for parts in (3, 16):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)
        out = (grouped_skew_kurt(ds, "k", "x").to_pandas()
               .sort_values("k", ignore_index=True))
        outs.append(out)
    # partitioning invariance, bitwise
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    for _, row in out.iterrows():
        vals = df.loc[df.k == row.k, "x"].tolist()
        skew, kurt = _serial_moments(vals)
        assert row.n == len(vals)
        if skew is None:
            assert pd.isna(row.skew_x) and pd.isna(row.kurt_x)
        else:
            assert row.skew_x == skew and row.kurt_x == kurt, row.k
    # sanity vs numpy (population moments, loose tolerance)
    g0 = df.loc[df.k == 0, "x"].to_numpy(dtype=np.float64)
    c = g0 - g0.mean()
    ref_skew = (c ** 3).mean() / (c ** 2).mean() ** 1.5
    assert abs(out.loc[out.k == 0, "skew_x"].iloc[0] - ref_skew) < 1e-9


def test_grouped_skew_kurt_null_and_guard(ray_session):
    from kgray.stages.stats import grouped_skew_kurt

    t = pa.table({"k": pa.array([1, 1, 1, 1], type=pa.int64()),
                  "x": pa.array([5, None, 9, 2], type=pa.int64())})
    out = grouped_skew_kurt(rd.from_arrow(t), "k", "x").to_pandas()
    assert out.n.iloc[0] == 3          # NULL x excluded
    big = pa.table({"k": pa.array([1], type=pa.int64()),
                    "x": pa.array([40_000_000], type=pa.int64())})
    try:
        grouped_skew_kurt(rd.from_arrow(big), "k", "x").to_pandas()
        assert False, "magnitude guard did not trip"
    except Exception as e:
        assert "4th-moment" in str(e)


# -------------------------------------------------------------- fuzzy join
def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[-1]


def test_lev_le_1_matches_dp():
    from kgray.pipelines.text import _lev_le_1

    rng = np.random.default_rng(3)
    words = ["".join(rng.choice(list("abc"), size=rng.integers(1, 6)))
             for _ in range(120)]
    for a in words[:60]:
        for b in words[60:]:
            assert _lev_le_1(a, b) == (_lev(a, b) <= 1), (a, b)


def test_token_fuzzy_pairs_complete(ray_session, tmp_path):
    """Deletion-neighborhood candidates + verify find EXACTLY the
    lev<=1 pairs of the augmented token set (brute force oracle)."""
    import pyarrow.parquet as pq
    from kgray.pipelines.text import token_fuzzy_pairs, _lev_le_1
    from kgray.functions.sampling import _md5_bucket

    words = ["alpha", "alphas", "alpsa", "brave", "bravo", "crane",
             "cranes", "crate", "plain", "plane", "plan", "zebra"]
    docs = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array([" ".join(words[i::4]) for i in range(4)],
                         type=pa.string()),
        "lang": pa.array(["en"] * 4), "source": pa.array(["t"] * 4),
        "n_chars": pa.array([1] * 4, type=pa.int64())})
    pq.write_table(docs, tmp_path / "documents.parquet")

    got = set(map(tuple, token_fuzzy_pairs(str(tmp_path)).to_pandas()
                  .itertuples(index=False)))
    toks = {w for w in words if 4 <= len(w) <= 12}
    aug = set(toks) | {t + "s" for t in toks
                       if _md5_bucket([t], 1000)[0] < 250}
    exp = {(a, b) for a in aug for b in aug
           if a < b and _lev_le_1(a, b)}
    assert got == exp and len(exp) >= 3


# ------------------------------------------ funnel / retention / profiling
def _events_df(seed=11, n=4000, users=40):
    rng = np.random.default_rng(seed)
    ts0 = pd.Timestamp("2024-03-01").value // 1000
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(
            ts0 + rng.integers(0, 45 * 86_400_000_000, n),
            unit="us").astype("datetime64[us]"),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "event_type": rng.choice(
            ["view", "click", "purchase", "error"], n),
        "value": np.round(rng.exponential(40, n) + 0.01, 2),
        "props": rng.choice(["a", "b", None], n)})


def _write_events(tmp_path, df):
    import pyarrow.parquet as pq
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    return str(tmp_path)


def test_funnel_retention_profile_vs_duckdb(ray_session, tmp_path):
    import importlib.util
    import os
    from kgray.pipelines.relational import (user_funnel_counts,
                                            weekly_retention,
                                            events_hourly_dense,
                                            events_profile)

    df = _events_df()
    sf = _write_events(tmp_path, df)
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__ray_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")

    for name, fn in (("user_funnel_counts", user_funnel_counts),
                     ("weekly_retention", weekly_retention),
                     ("events_hourly_dense", events_hourly_dense),
                     ("events_profile", events_profile)):
        res = fn(sf)
        got = (res.to_pandas() if hasattr(res, "to_pandas") else res)
        if isinstance(got, pa.Table):
            got = got.to_pandas()
        exp = con.sql(oracles[name]).df()
        cols = sorted(got.columns)
        assert cols == sorted(exp.columns), name
        got = got[cols].sort_values(cols, ignore_index=True)
        exp = exp[cols].sort_values(cols, ignore_index=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=True), name
