"""Session-6 batch 2: personalized PageRank (dense==shuffle pin,
teleport-to-seeds semantics), the data-quality rule suite, one-scan
multi-window user features, and the deterministic Poisson bootstrap
CI (serial-oracle equality)."""

import hashlib
import math
import os
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- PPR
def _toy_edges():
    # two communities bridged by one edge; 's1','s2' seed community A
    e = [("s1", "a"), ("a", "s2"), ("s2", "s1"), ("a", "b"),
         ("b", "c"), ("c", "b"), ("c", "d")]          # d dangles
    return rd.from_arrow(pa.table({
        "src": pa.array([x for x, _ in e]),
        "dst": pa.array([y for _, y in e])})).repartition(3)


def _make_seed_fn():
    # defined dynamically so cloudpickle ships it BY VALUE — a plain
    # module-level function in a test module would pickle by reference
    # and Ray workers cannot import test modules
    return lambda names: np.array([n.startswith("s") for n in names],
                                  dtype=bool)


def test_ppr_dense_equals_shuffle(ray_session):
    from kgray.pipelines.graph import ppr

    d = ppr(_toy_edges(), _make_seed_fn(), iters=8, plan="dense") \
        .to_pandas().sort_values("node").reset_index(drop=True)
    s = ppr(_toy_edges(), _make_seed_fn(), iters=8, plan="shuffle") \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert d["node"].tolist() == s["node"].tolist()
    assert d["rank_fp"].tolist() == s["rank_fp"].tolist()


def test_ppr_teleports_to_seeds_only(ray_session):
    from kgray.pipelines.graph import UNIT, ppr

    got = {r["node"]: r["rank_fp"]
           for r in ppr(_toy_edges(), _make_seed_fn(), iters=12).take_all()}
    # exact serial replay of the documented integer recurrence
    nodes = sorted(got)
    edges = sorted({("s1", "a"), ("a", "s2"), ("s2", "s1"), ("a", "b"),
                    ("b", "c"), ("c", "b"), ("c", "d")})
    ix = {n: i for i, n in enumerate(nodes)}
    outdeg = np.zeros(len(nodes), dtype=np.int64)
    for s, _ in edges:
        outdeg[ix[s]] += 1
    seed = np.array([x.startswith("s") for x in nodes])
    n_seeds = int(seed.sum())
    base = (3 * UNIT) // (20 * n_seeds)
    r = np.where(seed, np.int64(UNIT // n_seeds), np.int64(0))
    for _ in range(12):
        share = int(r[outdeg == 0].sum()) // n_seeds
        infp = np.zeros(len(nodes), dtype=np.int64)
        for s, t in edges:
            infp[ix[t]] += r[ix[s]] // outdeg[ix[s]]
        r = (np.where(seed, base, 0)
             + ((infp + np.where(seed, share, 0)) * 17) // 20)
    assert got == dict(zip(nodes, r.tolist()))
    # semantics: the seed COMMUNITY {s1,s2,a} outranks the far tail
    assert got["s1"] > got["b"] and got["s2"] > got["c"]
    assert got["s1"] + got["s2"] + got["a"] > UNIT // 2
    # total mass stays ~UNIT (integer floors only ever lose micro-units)
    assert abs(sum(got.values()) - UNIT) < 100 * len(got)


def test_ppr_unreachable_node_gets_zero(ray_session):
    from kgray.pipelines.graph import ppr

    # y is NOT a seed and has no path from the seed component
    edges = rd.from_arrow(pa.table({
        "src": pa.array(["s", "a", "x"]),
        "dst": pa.array(["a", "s", "y"])}))
    got = {r["node"]: r["rank_fp"]
           for r in ppr(edges, _make_seed_fn(), iters=6).take_all()}
    assert got["y"] == 0 and got["x"] == 0
    assert got["s"] > 0 and got["a"] > 0


# ------------------------------------------------------- quality checks
def _write_events(tmp_path, df):
    df = df.copy()
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def test_quality_checks_counts(ray_session, tmp_path):
    from kgray.pipelines.relational import events_quality_checks

    n = 4000
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "event_id": np.arange(1, n + 1, dtype=np.int64),
        "event_type": rng.choice(
            ["click", "view", "purchase"], n),
        "value": rng.uniform(0.01, 10, n).round(2),
        "ts": pd.Timestamp("2024-01-05")
        + pd.to_timedelta(rng.integers(0, 20 * 86400, n), unit="s"),
        "user_id": rng.integers(1, 50, n).astype(np.int64),
        "props": ["{}"] * n,
    })
    sf = _write_events(tmp_path, df)

    got = {r["rule"]: r
           for r in events_quality_checks(sf).take_all()}
    corrupt = np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 97 == 0
         for i in df["event_id"]])
    n_corrupt = int(corrupt.sum())
    assert n_corrupt > 0, "injection must be non-vacuous"
    assert got["value_nonneg"]["n_violations"] == n_corrupt
    assert got["type_in_domain"]["n_violations"] == n_corrupt
    assert got["value_nonnull"]["n_violations"] == 0
    assert got["ts_in_window"]["n_violations"] == 0
    assert got["event_id_unique"]["n_violations"] == 0
    assert all(r["n_checked"] == n for r in got.values())
    assert got["value_nonneg"]["passed"] == 0
    assert got["ts_in_window"]["passed"] == 1


def test_quality_checks_catches_duplicates(ray_session, tmp_path):
    from kgray.pipelines.relational import events_quality_checks

    df = pd.DataFrame({
        "event_id": np.array([1, 2, 2, 3, 3, 3], dtype=np.int64),
        "event_type": ["click"] * 6,
        "value": [1.0] * 6,
        "ts": pd.Timestamp("2024-01-05"),
        "user_id": np.ones(6, dtype=np.int64),
        "props": ["{}"] * 6,
    })
    sf = _write_events(tmp_path, df)
    got = {r["rule"]: r
           for r in events_quality_checks(sf).take_all()}
    assert got["event_id_unique"]["n_violations"] == 3   # 6 rows, 3 keys


# ------------------------------------------------- window features
def test_user_window_features_matches_pandas(ray_session):
    from kgray.pipelines.relational import user_window_features

    got = (user_window_features(SF).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ts_us = ev["ts"].astype("int64")
    t = ts_us.max()
    cents = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    ev = ev.assign(ts_us=ts_us, cents=cents)
    day = 86_400_000_000
    exp = ev.groupby("user_id").apply(
        lambda g: pd.Series({
            "n_events": len(g),
            "n_7d": int((g["ts_us"] > t - 7 * day).sum()),
            "n_30d": int((g["ts_us"] > t - 30 * day).sum()),
            "purchase_cents_30d": int(g.loc[
                (g["ts_us"] > t - 30 * day)
                & (g["event_type"] == "purchase"), "cents"].sum()),
            "recency_us": int(t - g["ts_us"].max()),
            "tenure_us": int(g["ts_us"].max() - g["ts_us"].min()),
        }), include_groups=False).reset_index()
    assert len(got) == len(exp)
    for c in ["n_events", "n_7d", "n_30d", "purchase_cents_30d",
              "recency_us", "tenure_us"]:
        assert got[c].tolist() == exp[c].astype(np.int64).tolist(), c


# ----------------------------------------------------- bootstrap CI
def test_bootstrap_ci_serial_oracle(ray_session):
    from kgray.pipelines.relational import (_B_BOOT, _M40, _POIS_TH,
                                            events_bootstrap_ci)

    got = events_bootstrap_ci(SF).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type", "value"]) \
        .to_pandas()
    h40 = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
                    % _M40 for i in ev["event_id"]], dtype=np.int64)
    cents = np.floor(ev["value"].to_numpy() * 100.0 + 0.5) \
        .astype(np.int64)
    th = np.asarray(_POIS_TH, dtype=np.int64)
    out = {}
    for t, idx in ev.groupby("event_type").groups.items():
        ix = np.asarray(idx)
        means = []
        for b in range(_B_BOOT):
            u = (h40[ix] * (2 * b + 1)) % _M40
            w = np.searchsorted(th, u, side="right").astype(np.int64)
            sw = int(w.sum())
            if sw > 0:
                means.append((float((w * cents[ix]).sum()) / float(sw), b))
        means.sort()
        out[t] = (means[1][0], means[62][0])
    assert got["event_type"].tolist() == sorted(out)
    for _, r in got.iterrows():
        lo, hi = out[r["event_type"]]
        assert r["ci_lo"] == lo and r["ci_hi"] == hi
        assert lo <= hi
        # sanity: the interval brackets the CENTS sample mean
        mc = np.floor(ev.loc[ev["event_type"] == r["event_type"],
                             "value"].to_numpy() * 100.0 + 0.5).mean()
        assert lo < mc * 1.3 and hi > mc * 0.7
