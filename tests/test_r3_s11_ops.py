"""Session-11 batch: Markov stationary distribution (serial replay +
fixpoint law), conversion survival table (serial KM-input oracle +
at-risk reconciliation), hourly changepoint (brute-force SSE argmin +
planted-shift recovery), cohort LTV triangle (pandas oracle)."""

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------- markov
def test_markov_stationary_serial(ray_session):
    from kgray.pipelines.relational import (event_type_transitions,
                                            events_markov_stationary)

    got = {r["event_type"]: r["stationary_fp"]
           for r in events_markov_stationary(SF).to_pylist()}
    tr = event_type_transitions(SF).take_all()
    rowsum = {}
    for r in tr:
        rowsum[r["from_type"]] = rowsum.get(r["from_type"], 0) + r["n"]
    types = sorted(rowsum)
    UNIT = 10 ** 12
    pi = {t: UNIT // len(types) for t in types}
    for _ in range(10):
        nxt = {t: 0 for t in types}
        for r in tr:
            if r["to_type"] in nxt:
                nxt[r["to_type"]] += (pi.get(r["from_type"], 0)
                                      * r["n"]) // rowsum[r["from_type"]]
        pi = nxt
    assert got == pi
    # a converged chain conserves nearly all mass (floors only lose
    # micro-units per entry per round)
    assert abs(sum(got.values()) - UNIT) < 10 * 25 * len(types)
    # every type present in the chain appears
    assert set(got) == set(types)


def test_markov_stationary_is_near_fixpoint(ray_session):
    from kgray.pipelines.relational import (event_type_transitions,
                                            events_markov_stationary)

    got = {r["event_type"]: r["stationary_fp"]
           for r in events_markov_stationary(SF, iters=30).to_pylist()}
    tr = event_type_transitions(SF).take_all()
    rowsum = {}
    for r in tr:
        rowsum[r["from_type"]] = rowsum.get(r["from_type"], 0) + r["n"]
    # one more application moves each entry by < 1e-6 of UNIT
    nxt = {t: 0 for t in got}
    for r in tr:
        if r["to_type"] in nxt:
            nxt[r["to_type"]] += (got.get(r["from_type"], 0)
                                  * r["n"]) // rowsum[r["from_type"]]
    for t in got:
        assert abs(nxt[t] - got[t]) < 10 ** 6, t


# -------------------------------------------------------------- survival
def test_survival_serial(ray_session):
    from kgray.pipelines.relational import user_conversion_survival

    got = user_conversion_survival(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type", "ts"]).to_pandas()
    ts = ev["ts"].astype("int64")
    horizon = int(ts.max())
    day = 86_400_000_000
    from collections import Counter
    d_conv, d_cens = Counter(), Counter()
    for u, g in ev.assign(ts_us=ts).groupby("user_id"):
        views = g.loc[g["event_type"] == "view", "ts_us"]
        if views.empty:
            continue
        t0 = int(views.min())
        purch = g.loc[(g["event_type"] == "purchase")
                      & (g["ts_us"] >= t0), "ts_us"]
        if purch.empty:
            d_cens[(horizon - t0) // day] += 1
        else:
            d_conv[(int(purch.min()) - t0) // day] += 1
    days = sorted(set(d_conv) | set(d_cens))
    total = sum(d_conv.values()) + sum(d_cens.values())
    assert got["day"].tolist() == days
    done = 0
    for _, r in got.iterrows():
        assert r["n_converted"] == d_conv.get(r["day"], 0)
        assert r["n_censored"] == d_cens.get(r["day"], 0)
        assert r["n_at_risk"] == total - done
        done += r["n_converted"] + r["n_censored"]
    # at-risk is monotone non-increasing and ends at the last row's mass
    ar = got["n_at_risk"].tolist()
    assert all(a >= b for a, b in zip(ar, ar[1:]))


# ------------------------------------------------------------ changepoint
def test_changepoint_brute_force(ray_session):
    from kgray.pipelines.relational import events_hourly_changepoint

    got = {r["event_type"]: r
           for r in events_hourly_changepoint(SF).take_all()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["hour"] = ev["ts"].astype("int64") // 3_600_000_000
    for t, g in ev.groupby("event_type"):
        hc = g.groupby("hour").size().sort_index()
        hours = hc.index.to_numpy()
        c = hc.to_numpy().astype(np.int64)
        best = None
        for i in range(len(c) - 1):
            nl, nr = i + 1, len(c) - i - 1
            sl, sr = int(c[:i + 1].sum()), int(c[i + 1:].sum())
            xl = int((c[:i + 1] ** 2).sum())
            xr = int((c[i + 1:] ** 2).sum())
            cost = ((float(xl) - float(sl * sl) / float(nl))
                    + (float(xr) - float(sr * sr) / float(nr)))
            key = (cost, int(hours[i]))
            if best is None or key < best:
                best = key
        assert got[t]["split_hour"] == best[1], t
        assert got[t]["cost"] == best[0], t


def test_changepoint_recovers_planted_shift(ray_session, tmp_path):
    from kgray.pipelines.relational import events_hourly_changepoint

    # level 2/hour for 100 hours, then 20/hour for 100 hours: the SSE
    # argmin must land exactly on the boundary hour
    rows = []
    eid = 1
    for h in range(200):
        n = 2 if h < 100 else 20
        for _ in range(n):
            rows.append((eid, "click",
                         pd.Timestamp("2024-01-01")
                         + pd.Timedelta(hours=h, seconds=eid % 3000)))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "event_type", "ts"])
    df["value"] = 1.0
    df["user_id"] = np.int64(1)
    df["props"] = "{}"
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(str(tmp_path), "events.parquet"))
    got = events_hourly_changepoint(str(tmp_path)).take_all()
    assert len(got) == 1
    base_hour = int(pd.Timestamp("2024-01-01").value // 10 ** 3
                    // 3_600_000_000)
    assert got[0]["split_hour"] == base_hour + 99


# ------------------------------------------------------------------ ltv
def test_cohort_ltv_pandas(ray_session):
    from kgray.pipelines.relational import orders_cohort_ltv

    got = orders_cohort_ltv(SF).to_pandas() \
        .sort_values(["cohort_month", "months_since"]) \
        .reset_index(drop=True)
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_custkey", "o_orderdate",
                               "o_totalprice"]).to_pandas()
    mi = (12 * o["o_orderdate"].dt.year
          + o["o_orderdate"].dt.month - 1).astype(np.int64)
    cents = np.floor(o["o_totalprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
    o = o.assign(mi=mi, cents=cents)
    o["cohort"] = o.groupby("o_custkey")["mi"].transform("min")
    exp = (o.assign(ms=o["mi"] - o["cohort"])
           .groupby(["cohort", "ms"])
           .agg(n_orders=("cents", "size"),
                revenue_cents=("cents", "sum"))
           .reset_index().sort_values(["cohort", "ms"])
           .reset_index(drop=True))
    assert got["cohort_month"].tolist() == exp["cohort"].tolist()
    assert got["months_since"].tolist() == exp["ms"].tolist()
    assert got["n_orders"].tolist() == exp["n_orders"].tolist()
    assert got["revenue_cents"].tolist() == exp["revenue_cents"].tolist()
    # triangle sanity: age-0 exists for every cohort (the first order
    # itself lands there)
    age0 = set(got.loc[got["months_since"] == 0, "cohort_month"])
    assert age0 == set(got["cohort_month"])
