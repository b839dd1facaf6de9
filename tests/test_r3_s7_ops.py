"""Session-7 batch: distributed OLS trend (planted-slope recovery +
serial equality), per-user entropy (closed-form boundary cases),
association rules (brute-force pandas oracle), and deterministic
random walks (neighbor validity, divergence, partition invariance)."""

import hashlib
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, df):
    df = df.copy()
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


# ------------------------------------------------------------ regression
def test_regression_recovers_planted_slope(ray_session, tmp_path):
    from kgray.pipelines.relational import events_value_regression

    # exact line: cents = 700 + 3*x  => value = cents/100 (exact in
    # float64 for these magnitudes), so OLS must recover slope=3,
    # intercept=700 to the last ulp of the closed form
    hours = np.arange(0, 500, dtype=np.int64)
    cents = 700 + 3 * hours
    df = pd.DataFrame({
        "event_id": np.arange(1, len(hours) + 1, dtype=np.int64),
        "event_type": ["click"] * len(hours),
        "value": cents / 100.0,
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(hours, unit="h"),
        "user_id": np.ones(len(hours), dtype=np.int64),
        "props": ["{}"] * len(hours),
    })
    got = events_value_regression(_write_events(tmp_path, df)).to_pandas()
    assert len(got) == 1
    assert abs(got["slope_cents_per_hour"][0] - 3.0) < 1e-9
    assert abs(got["intercept_cents"][0] - 700.0) < 1e-6
    assert got["n_events"][0] == len(hours)


def test_regression_matches_serial_formula(ray_session):
    from kgray.pipelines.relational import events_value_regression

    got = events_value_regression(SF).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value", "ts"]).to_pandas()
    x = (ev["ts"].astype("int64") // 3_600_000_000 - 473352).to_numpy()
    y = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    for _, r in got.iterrows():
        m = (ev["event_type"] == r["event_type"]).to_numpy()
        n = int(m.sum())
        sx, sy = int(x[m].sum()), int(y[m].sum())
        sxy, sxx = int((x[m] * y[m]).sum()), int((x[m] * x[m]).sum())
        slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        assert r["slope_cents_per_hour"] == slope
        assert r["intercept_cents"] == intercept
        assert r["n_events"] == n


# --------------------------------------------------------------- entropy
def test_entropy_boundary_cases(ray_session, tmp_path):
    from kgray.pipelines.relational import user_type_entropy

    # user 1: one type only -> H = 0 exactly
    # user 2: 8 events over 2 types uniformly -> H = ln 2
    # user 3: 4 types x 1 event -> H = ln 4
    rows = ([(1, "click")] * 5
            + [(2, "click")] * 4 + [(2, "view")] * 4
            + [(3, t) for t in ("click", "view", "error", "signup")])
    df = pd.DataFrame({
        "event_id": np.arange(1, len(rows) + 1, dtype=np.int64),
        "event_type": [t for _, t in rows],
        "value": 1.0,
        "ts": pd.Timestamp("2024-01-05"),
        "user_id": np.array([u for u, _ in rows], dtype=np.int64),
        "props": ["{}"] * len(rows),
    })
    got = {r["user_id"]: r for r in
           user_type_entropy(_write_events(tmp_path, df)).take_all()}
    assert got[1]["entropy_unat"] == 0 and got[1]["n_types"] == 1
    # ln2, ln4 in micro-nats with the documented quantization (±2 from
    # the two floor-rounds and the final integer division)
    assert abs(got[2]["entropy_unat"]
               - round(1e6 * math.log(2))) <= 2
    assert abs(got[3]["entropy_unat"]
               - round(1e6 * math.log(4))) <= 2
    assert got[2]["n_events"] == 8 and got[3]["n_types"] == 4


def test_entropy_matches_serial(ray_session):
    from kgray.pipelines.relational import user_type_entropy

    got = {r["user_id"]: r["entropy_unat"]
           for r in user_type_entropy(SF).take_all()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    for u, g in ev.groupby("user_id"):
        cs = g["event_type"].value_counts().to_numpy()
        n = int(cs.sum())
        s = sum(math.floor(1000000.0 * int(c) * math.log(int(c)) + 0.5)
                for c in cs)
        exp = (math.floor(1000000.0 * n * math.log(n) + 0.5) - s) // n
        assert got[u] == exp, u


# ----------------------------------------------------------------- rules
def test_rules_against_pandas_bruteforce(ray_session):
    from kgray.pipelines.relational import copurchase_rules

    got = copurchase_rules(SF, min_count=2, k_top=30).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    # brute-force pair counts (l1.partkey < l2.partkey within an order)
    from collections import Counter
    cnt = Counter()
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"])
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                if ps[i] != ps[j]:
                    cnt[(ps[i], ps[j])] += 1
    item = li["l_partkey"].value_counts()
    n_li = len(li)
    rules = []
    for (a, b), c in cnt.items():
        if c < 2:
            continue
        for u, v in ((a, b), (b, a)):
            rules.append((float(c) / float(item[u]), u, v, c,
                          float(n_li * c) / float(item[u] * item[v])))
    rules.sort(key=lambda r: (-r[0], r[1], r[2]))
    top = rules[:30]
    assert len(got) == len(top)
    for row, (conf, u, v, c, lift) in zip(got.itertuples(), top):
        assert (row.antecedent, row.consequent) == (u, v)
        assert row.n_copurchase == c
        assert row.confidence == conf and row.lift == lift
    # semantics: confidence <= 1, lift positive
    assert (got["confidence"] <= 1.0).all()
    assert (got["lift"] > 0).all()


# ----------------------------------------------------------------- walks
def _walks_df(repart=None):
    from kgray.pipelines.relational import part_random_walks

    ds = part_random_walks(SF, walk_len=3)
    return ds.to_pandas().sort_values(["walk", "step"]) \
        .reset_index(drop=True)


def test_walks_are_valid_paths(ray_session):
    from kgray.pipelines.relational import _copurchase_pair_counts, \
        _unpack_pair

    w = _walks_df()
    pairs = _copurchase_pair_counts(SF) \
        .map_batches(_unpack_pair, batch_format="pyarrow") \
        .to_pandas()
    pairs = pairs[pairs["n_copurchase"] >= 2]
    nbr = set()
    for a, b in zip(pairs["part_a"], pairs["part_b"]):
        nbr.add((a, b))
        nbr.add((b, a))
    assert len(w) > 0
    for walk, g in w.groupby("walk"):
        g = g.sort_values("step")
        steps = g["step"].tolist()
        assert steps == list(range(len(steps)))      # contiguous
        assert g["node"].iloc[0] == walk             # starts at seed
        path = g["node"].tolist()
        for x, y in zip(path, path[1:]):
            assert (x, y) in nbr, (walk, x, y)
    # seeds = md5-bucketed graph nodes
    seeds = {s for s in set(pairs["part_a"]) | set(pairs["part_b"])
             if int(hashlib.md5(str(s).encode()).hexdigest()[:8], 16)
             % 20 == 0}
    assert set(w["walk"]) == seeds


def test_walks_choose_min_rank_neighbor(ray_session):
    from kgray.pipelines.relational import _copurchase_pair_counts, \
        _unpack_pair

    w = _walks_df()
    pairs = _copurchase_pair_counts(SF) \
        .map_batches(_unpack_pair, batch_format="pyarrow").to_pandas()
    pairs = pairs[pairs["n_copurchase"] >= 2]
    adj = {}
    for a, b in zip(pairs["part_a"], pairs["part_b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def rank(walk, step, dst):
        v = (int(walk) << 34) | (step << 32) | int(dst)
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    for walk, g in w.groupby("walk"):
        path = g.sort_values("step")["node"].tolist()
        for t in range(1, len(path)):
            cands = adj[path[t - 1]]
            best = min(cands, key=lambda d: (rank(walk, t, d), d))
            assert path[t] == best, (walk, t)
