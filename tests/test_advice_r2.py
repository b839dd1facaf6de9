"""Regression tests for the r2 ADVICE items: burst-predicate overflow,
auto_join payload on the fallback plan, events_profile -0.0, PMI
double-rounding, and the price-band layout-cache fingerprint."""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_burst_mask_exact_past_int64():
    """At 100-TB per-type totals, dev² exceeds 2^63: numpy would wrap
    where the SQL oracle raises — the guard must route to exact ints."""
    from kgray.pipelines.relational import _burst_mask

    # small path: plain int64 series
    c = np.array([10, 11, 200], dtype=np.int64)
    t = np.array([3, 3, 3], dtype=np.int64)
    s = np.array([221, 221, 221], dtype=np.int64)
    sxx = np.array([np.sum(c * c)] * 3, dtype=np.int64)
    small = _burst_mask(c, t, s, sxx)

    def oracle(c, t, s, sxx):
        out = []
        for ci, ti, si, xi in zip(c, t, s, sxx):
            dev = int(ci) * int(ti) - int(si)
            out.append(dev > 0 and dev * dev
                       > 9 * (int(ti) * int(xi) - int(si) * int(si)))
        return out

    assert list(small) == oracle(c, t, s, sxx)

    # big path: ~400k events/hour over 8760 hours -> the burst row's
    # dev = c·T − S ≈ 3.15e10, dev² ≈ 9.9e20 >> 2^63 (numpy would wrap)
    # while the STORED columns (c, t, s, sxx) all still fit int64
    base = 400_000
    c2 = np.array([base, base + 1000, base * 10], dtype=np.int64)
    t2 = np.array([8760] * 3, dtype=np.int64)
    s2 = np.array([base * 8760 + 12345] * 3, dtype=np.int64)
    sxx2 = np.array([base * base * 8760 + 987] * 3, dtype=np.int64)
    assert abs(int(c2[2]) * int(t2[2]) - int(s2[2])) ** 2 > 2 ** 63
    big = _burst_mask(c2, t2, s2, sxx2)
    assert list(big) == oracle(c2, t2, s2, sxx2)
    # the wrapped numpy predicate would disagree on at least the burst row
    assert big[2]                     # 10x the mean IS a burst


def test_auto_join_payload_identical_across_plans(ray_session):
    """payload must project the right side on BOTH plans — the shuffle
    fallback used to return all right columns (ADVICE r2)."""
    import ray.data as rd

    from kgray.stages.join import auto_join

    left = pd.DataFrame({"k": np.array([1, 2, 3, 4], dtype=np.int64),
                         "x": np.array([10, 20, 30, 40], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64),
                          "y": np.array([7, 8, 9], dtype=np.int64),
                          "z": ["a", "b", "c"]})

    def run(threshold):
        lds = rd.from_arrow(pa.Table.from_pandas(left))
        rds = rd.from_arrow(pa.Table.from_pandas(right))
        df = (auto_join(lds, rds, on="k", payload=["y"],
                        broadcast_rows=threshold)
              .to_pandas().sort_values("k", ignore_index=True))
        return df.reindex(sorted(df.columns), axis=1)

    bcast = run(10**6)
    shuffle = run(0)                  # force the sorted-merge fallback
    assert list(bcast.columns) == list(shuffle.columns) == ["k", "x", "y"]
    pd.testing.assert_frame_equal(bcast, shuffle)


def test_events_profile_negative_zero(ray_session, tmp_path):
    """-0.0 and 0.0 must count as ONE distinct value (SQL semantics)."""
    from kgray.pipelines.relational import events_profile

    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "ts": pd.to_datetime([1_700_000_000_000_000 + i for i in range(6)],
                             unit="us"),
        "user_id": np.array([1, 1, 2, 2, 3, 3], dtype=np.int64),
        "event_type": ["a", "a", "b", "b", "a", "a"],
        "value": np.array([-0.0, 0.0, 1.5, -1.5, 2.5, 2.5]),
        "props": ["{}", "{}", None, "{}", "{}", "{}"],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    got = events_profile(str(tmp_path)).to_pandas()
    n_distinct = dict(zip(got.col_name, got.n_distinct))
    con = duckdb.connect()
    exp = con.sql(
        f"SELECT COUNT(DISTINCT value) FROM '{tmp_path}/events.parquet'"
    ).fetchone()[0]
    assert n_distinct["value"] == exp == 4


def test_pmi_double_rounding_matches_sql():
    """log(float(a)/float(b)) — operands rounded to double BEFORE the
    division, exactly as DuckDB casts each product to DOUBLE."""
    orders, c, ca, cb = 2**54 + 1, 3, 2**53 + 1, 3
    got = math.log(float(orders * c) / float(ca * cb))
    con = duckdb.connect()
    # mirror the real oracle shape: exact BIGINT products, each CAST to
    # DOUBLE, then one division (__ray_entry__.py copurchase_pmi)
    exp = con.sql(
        f"SELECT ln(CAST(({orders} * {c}) AS DOUBLE) "
        f"/ CAST(({ca} * {cb}) AS DOUBLE))").fetchone()[0]
    assert got == exp
    # and the pre-fix Python exact-int division WOULD have differed here
    assert math.log((orders * c) / (ca * cb)) != got


def test_price_band_cache_fingerprints_source(ray_session, tmp_path):
    """Regenerated source data at the same path must invalidate the
    /tmp layout cache (fingerprint = size+mtime, ADVICE r2)."""
    from kgray.pipelines.relational import orders_price_band

    def write(n, price):
        pq.write_table(pa.table({
            "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            "o_totalprice": pa.array(np.full(n, price, dtype=np.float64)),
        }), tmp_path / "orders.parquet")

    write(10, 15000.00)                      # inside the default band
    r1 = orders_price_band(str(tmp_path)).to_pandas()
    assert int(r1.n_orders.iloc[0]) == 10
    import os
    import time
    time.sleep(0.01)
    write(25, 15000.00)                      # regenerate, same path
    os.utime(tmp_path / "orders.parquet")    # ensure mtime moves
    r2 = orders_price_band(str(tmp_path)).to_pandas()
    assert int(r2.n_orders.iloc[0]) == 25    # stale cache would say 10


def test_funnel_shared_scan_cross_block_and_ties(ray_session):
    """r3 shared-scan funnel: strict-after semantics at ts ties, users
    spanning many blocks, dead-stage users — vs a brute-force oracle."""
    import itertools
    import random

    import pyarrow as pa
    import ray.data as rd

    from kgray.pipelines.relational import user_funnel_counts

    rng = random.Random(6)
    stages = ("view", "click", "purchase")
    rows = []
    for u in range(40):
        for _ in range(rng.randint(1, 12)):
            rows.append((u, rng.choice(stages + ("error",)),
                         rng.randint(0, 20) * 1_000_000))
    # hot user spanning many blocks + exact-tie cases
    rows += [(99, "view", 5_000_000)] * 50
    rows += [(99, "click", 5_000_000)]          # tie: must NOT advance
    rows += [(99, "click", 6_000_000), (99, "purchase", 6_000_000),
             (99, "purchase", 7_000_000)]
    rows.sort(key=lambda r: rng.random())

    def brute():
        by_u = {}
        for u, t, ts in rows:
            by_u.setdefault(u, []).append((ts, t))
        counts = {i + 1: 0 for i in range(3)}
        for u, evs in by_u.items():
            f = -1
            depth = 0
            for j, st in enumerate(stages):
                cand = [ts for ts, t in evs if t == st and ts > f]
                if not cand:
                    break
                f = min(cand)
                depth = j + 1
            for d in range(1, depth + 1):
                counts[d] += 1
        return counts

    import pandas as pd
    import pyarrow.parquet as pq
    import tempfile, os
    tmp = tempfile.mkdtemp(prefix="funnel_")
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts_us"])
    df["ts"] = pd.to_datetime(df.pop("ts_us"), unit="us")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp, "events.parquet"))
    got = user_funnel_counts(tmp).to_pandas()
    got_counts = {int(s.split("_")[0]): n
                  for s, n in zip(got.stage, got.n_users)}
    assert got_counts == brute()
