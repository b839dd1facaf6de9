"""Session-13 batch: sequential pattern support (serial oracle +
containment law), session paths (serial sessionizer replay + planted
gap), supplier HHI (serial oracle + boundary laws), adoption curve
(serial oracle + reconciliation)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_sequence_patterns_serial(ray_session):
    from kgray.pipelines.relational import event_sequence_patterns

    got = {(r["type_a"], r["type_b"]): r["n_users"]
           for r in event_sequence_patterns(SF).take_all()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type", "ts"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    exp = {}
    for u, g in ev.groupby("user_id"):
        agg = g.groupby("event_type")["ts_us"].agg(["min", "max"])
        for a in agg.index:
            for b in agg.index:
                if a != b and agg.loc[a, "min"] < agg.loc[b, "max"]:
                    exp[(a, b)] = exp.get((a, b), 0) + 1
    assert got == exp
    # law: support(a,b) <= users having both a and b
    both = {}
    for u, g in ev.groupby("user_id"):
        ts = set(g["event_type"])
        for a in ts:
            for b in ts:
                if a != b:
                    both[(a, b)] = both.get((a, b), 0) + 1
    for k, v in got.items():
        assert v <= both[k]


def test_session_paths_serial_and_planted(ray_session, tmp_path):
    from kgray.pipelines.relational import session_top_paths

    # serial replay on the real corpus
    got = session_top_paths(SF, k_top=10).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type", "event_id",
                                "ts"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    from collections import Counter
    c = Counter()
    for u, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        path, last = None, None
        for _, r in g.iterrows():
            if last is None or r["ts_us"] - last > 1_800_000_000:
                if path is not None:
                    c[">".join(path)] += 1
                path = [r["event_type"]]
            elif len(path) < 3:
                path.append(r["event_type"])
            last = r["ts_us"]
        if path is not None:
            c[">".join(path)] += 1
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["path"], got["n_sessions"])) == exp

    # planted: one user, two sessions split by a >30min gap
    t0 = pd.Timestamp("2024-01-05")
    rows = [(1, "view", 1, t0),
            (1, "click", 2, t0 + pd.Timedelta(minutes=1)),
            (1, "purchase", 3, t0 + pd.Timedelta(minutes=2)),
            (1, "error", 4, t0 + pd.Timedelta(minutes=3)),   # 4th: cut
            (1, "signup", 5, t0 + pd.Timedelta(hours=2))]    # new session
    df = pd.DataFrame(rows, columns=["user_id", "event_type",
                                     "event_id", "ts"])
    df["value"] = 1.0
    df["props"] = "{}"
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(str(tmp_path), "events.parquet"))
    got2 = {r["path"]: r["n_sessions"]
            for r in session_top_paths(str(tmp_path)).take_all()}
    assert got2 == {"view>click>purchase": 1, "signup": 1}


def test_supplier_hhi_serial(ray_session):
    from kgray.pipelines.relational import part_supplier_hhi

    got = {r["l_partkey"]: r for r in part_supplier_hhi(SF).take_all()}
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey", "l_suppkey"]).to_pandas()
    for pk, g in li.groupby("l_partkey"):
        cs = g["l_suppkey"].value_counts().to_numpy().astype(np.int64)
        t = int(cs.sum())
        hhi = float(int((cs * cs).sum())) / float(t * t)
        r = got[pk]
        assert r["n_lineitems"] == t
        assert r["n_suppliers"] == len(cs)
        assert r["hhi"] == hhi
        # bounds: 1/n <= hhi <= 1
        assert 1.0 / len(cs) - 1e-12 <= r["hhi"] <= 1.0
    # single-supplier parts score exactly 1.0
    ones = [r for r in got.values() if r["n_suppliers"] == 1]
    assert all(r["hhi"] == 1.0 for r in ones)


def test_adoption_curve_serial(ray_session):
    from kgray.pipelines.relational import events_adoption_curve

    got = events_adoption_curve(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    first = ev.groupby("user_id")["ts"].min().astype("int64") \
        // 86_400_000_000
    exp = first.value_counts().sort_index()
    assert got["day"].tolist() == exp.index.tolist()
    assert got["n_new"].tolist() == exp.tolist()
    assert got["n_cum"].tolist() == exp.cumsum().tolist()
    # reconciliation: final cumulative = distinct users
    assert got["n_cum"].iloc[-1] == ev["user_id"].nunique()
