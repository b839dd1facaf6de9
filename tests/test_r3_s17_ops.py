"""Session-17 batch: PSI drift monitor (serial replay + stability
law on exchangeable splits + planted-drift sensitivity), Gini spend
inequality (serial replay + boundary laws)."""

import hashlib
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _serial_psi(ev):
    cents = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    par = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                    % 2 for i in ev["event_id"]])
    v = np.sort(cents)
    n = len(v)
    bounds = np.array(
        [v[max(0, int(np.ceil(q * n)) - 1)]
         for q in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)],
        dtype=np.int64)
    bucket = np.searchsorted(bounds, cents, side="left")
    out = {}
    for t in sorted(set(ev["event_type"])):
        m = (ev["event_type"] == t).to_numpy()
        ca = np.bincount(bucket[m & (par == 0)], minlength=10)
        cb = np.bincount(bucket[m & (par == 1)], minlength=10)
        na, nb = int(ca.sum()), int(cb.sum())
        psi = 0.0
        for k in range(10):
            pa_ = (float(ca[k]) + 1.0) / (float(na) + 10.0)
            pb_ = (float(cb[k]) + 1.0) / (float(nb) + 10.0)
            psi = psi + (pa_ - pb_) * math.log(pa_ / pb_)
        out[t] = (na, nb, psi)
    return out


def test_psi_serial_and_stability(ray_session):
    from kgray.pipelines.relational import events_value_psi

    got = {r["event_type"]: r
           for r in events_value_psi(SF).to_pylist()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type",
                                "value"]).to_pandas()
    exp = _serial_psi(ev)
    assert set(got) == set(exp)
    for t, (na, nb, psi) in exp.items():
        assert got[t]["n_a"] == na and got[t]["n_b"] == nb
        assert got[t]["psi"] == psi
        # exchangeable split: the monitor must stay under the 0.25
        # action threshold (sf0.001 has ~10 rows/cell, so the 0.1
        # "watch" bar can be crossed by sampling noise alone)
        assert got[t]["psi"] < 0.25


def test_psi_detects_planted_drift(ray_session, tmp_path):
    from kgray.pipelines.relational import events_value_psi

    # split parity is md5(event_id)%2; plant a distribution shift:
    # even-md5 rows cluster low, odd-md5 rows cluster high
    n = 4000
    ids = np.arange(1, n + 1, dtype=np.int64)
    par = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                    % 2 for i in ids])
    rng = np.random.default_rng(9)
    value = np.where(par == 0, rng.uniform(1, 5, n),
                     rng.uniform(50, 90, n)).round(2)
    df = pd.DataFrame({
        "event_id": ids, "event_type": ["click"] * n, "value": value,
        "ts": pd.Timestamp("2024-01-05").as_unit("us"),
        "user_id": np.ones(n, dtype=np.int64), "props": ["{}"] * n})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(str(tmp_path), "events.parquet"))
    got = events_value_psi(str(tmp_path)).to_pylist()
    assert len(got) == 1
    assert got[0]["psi"] > 1.0            # gross drift reads as gross


def test_gini_serial_and_bounds(ray_session):
    from kgray.pipelines.relational import user_spend_gini

    got = user_spend_gini(SF).to_pylist()[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type",
                                "value"]).to_pandas()
    cents = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    sp = pd.DataFrame({
        "u": ev["user_id"],
        "x": np.where((ev["event_type"] == "purchase").to_numpy(),
                      cents, 0)}).groupby("u")["x"].sum()
    sp = sp.reset_index().sort_values(["x", "u"]).reset_index(drop=True)
    n = len(sp)
    s = int(sp["x"].sum())
    iw = int((np.arange(1, n + 1) * sp["x"].to_numpy()).sum())
    gini = float(2 * iw) / float(n * s) - float(n + 1) / float(n)
    assert got["n_users"] == n
    assert got["total_cents"] == s
    assert got["rank_weighted_cents"] == iw
    assert got["gini"] == gini
    assert 0.0 <= got["gini"] < 1.0


def test_gini_extremes(ray_session, tmp_path):
    from kgray.pipelines.relational import user_spend_gini

    # one whale, everyone else zero -> gini -> (n-1)/n
    n = 50
    df = pd.DataFrame({
        "event_id": np.arange(1, n + 1, dtype=np.int64),
        "event_type": ["purchase"] * n,
        "value": [0.0] * (n - 1) + [1000.0],
        "ts": pd.Timestamp("2024-01-05").as_unit("us"),
        "user_id": np.arange(1, n + 1, dtype=np.int64),
        "props": ["{}"] * n})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(str(tmp_path), "events.parquet"))
    got = user_spend_gini(str(tmp_path)).to_pylist()[0]
    assert got["gini"] == float(2 * n * 100000) / float(n * 100000) \
        - float(n + 1) / float(n)
    assert abs(got["gini"] - (n - 1) / n) < 1e-9
