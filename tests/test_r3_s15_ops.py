"""Session-15 batch: shrunk CTR (serial replay + shrink-toward-prior
law), bounce rates (serial sessionizer), ship-lag quantiles (serial
order stats), peak concurrency (serial sweep + planted overlap)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _sessions(ev, gap_us=1_800_000_000):
    """[(user, [(ts, event_id, type), ...]), ...] serial sessionizer."""
    out = []
    for u, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        cur, last = [], None
        for _, r in g.iterrows():
            if last is not None and r["ts_us"] - last > gap_us:
                out.append((u, cur))
                cur = []
            cur.append((r["ts_us"], r["event_id"], r["event_type"]))
            last = r["ts_us"]
        if cur:
            out.append((u, cur))
    return out


def test_ctr_shrunk_serial_and_law(ray_session):
    from kgray.pipelines.relational import user_ctr_shrunk

    got = {r["user_id"]: r for r in user_ctr_shrunk(SF).take_all()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    agg = ev.groupby("user_id")["event_type"].agg(
        v=lambda s: int((s == "view").sum()),
        c=lambda s: int((s == "click").sum()))
    m = float(int(agg["c"].sum())) / float(int(agg["v"].sum()))
    for u, e in agg.iterrows():
        r = got[u]
        assert r["n_views"] == e["v"] and r["n_clicks"] == e["c"]
        raw = float(e["c"]) / float(e["v"]) if e["v"] > 0 else 0.0
        assert r["ctr_raw"] == raw
        assert r["ctr_shrunk"] == \
            (float(e["c"]) + 20.0 * m) / (float(e["v"]) + 20.0)
        # shrinkage law: shrunk sits between raw and the pooled prior
        lo, hi = sorted((raw, m))
        assert lo - 1e-12 <= r["ctr_shrunk"] <= hi + 1e-12


def test_bounce_rates_serial(ray_session):
    from kgray.pipelines.relational import session_bounce_rates

    got = {r["entry_type"]: r
           for r in session_bounce_rates(SF).take_all()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type", "event_id",
                                "ts"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    from collections import Counter
    ns, nb = Counter(), Counter()
    for _, sess in _sessions(ev):
        entry = sess[0][2]
        ns[entry] += 1
        if len(sess) == 1:
            nb[entry] += 1
    assert {t: r["n_sessions"] for t, r in got.items()} == dict(ns)
    for t, r in got.items():
        assert r["n_bounces"] == nb.get(t, 0)
        assert r["bounce_rate"] == \
            float(nb.get(t, 0)) / float(ns[t])


def test_ship_lag_quantiles_serial(ray_session):
    from kgray.pipelines.relational import order_ship_lag_quantiles

    got = {r["priority"]: r
           for r in order_ship_lag_quantiles(SF).take_all()}
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_shipdate"]).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_orderdate",
                               "o_orderpriority"]).to_pandas()
    first = li.assign(s=li["l_shipdate"].astype("int64")) \
        .groupby("l_orderkey")["s"].min()
    o = o[o["o_orderkey"].isin(first.index)]
    lag = (first[o["o_orderkey"]].to_numpy()
           - o["o_orderdate"].astype("int64").to_numpy()) \
        // 86_400_000_000
    df = pd.DataFrame({"p": o["o_orderpriority"].to_numpy(),
                       "lag": lag})
    for p, g in df.groupby("p"):
        v = np.sort(g["lag"].to_numpy())
        n = len(v)
        # quantile_disc: element at 0-based index max(0, ceil(q*n)-1)
        p50 = v[max(0, int(np.ceil(0.5 * n)) - 1)]
        p95 = v[max(0, int(np.ceil(0.95 * n)) - 1)]
        assert got[p]["p50_days"] == p50, p
        assert got[p]["p95_days"] == p95, p
        assert got[p]["n"] == n


def test_peak_concurrency_serial_and_planted(ray_session, tmp_path):
    from kgray.pipelines.relational import sessions_peak_concurrency

    got = sessions_peak_concurrency(SF).take_all()
    assert len(got) == 1
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_id", "ts"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    ev["event_type"] = "x"
    sw = []
    for _, sess in _sessions(ev):
        sw.append((sess[0][0], 0, 1))
        sw.append((sess[-1][0], 1, -1))
    sw.sort(key=lambda r: (r[0], r[1]))
    best, cur = None, 0
    for ts, _, d in sw:
        cur += d
        if best is None or cur > best[0]:
            best = (cur, ts)
    assert got[0]["peak_sessions"] == best[0]
    assert got[0]["at_us"] == best[1]

    # planted: three users, overlapping sessions -> peak 3 at the
    # moment the third session starts
    t0 = pd.Timestamp("2024-01-05").value // 1000
    rows = []
    eid = 1
    for u, off_min in ((1, 0), (2, 5), (3, 10)):
        for k in range(3):
            rows.append((u, eid,
                         t0 + (off_min + k * 5) * 60_000_000))
            eid += 1
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts_us"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us") \
        .astype("datetime64[us]")
    df["event_type"] = "click"
    df["value"] = 1.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(
        df[["user_id", "event_id", "event_type", "value", "ts",
            "props"]], preserve_index=False),
        os.path.join(str(tmp_path), "events.parquet"))
    got2 = sessions_peak_concurrency(str(tmp_path)).take_all()[0]
    assert got2["peak_sessions"] == 3
    assert got2["at_us"] == t0 + 10 * 60_000_000
