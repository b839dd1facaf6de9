"""Session-23 batch: clamped credit balance (serial recurrence replay
of the max-plus monoid exchange), SCD2 temporal dimension join
(per-order segment replay over the md5 version bands), and Markov
removal-effect attribution (full serial chain replay + monotonicity
law)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _hb(k) -> int:
    return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 1000


def _cents(v: float) -> int:
    return int(np.floor(v * 100.0 + 0.5))


def test_credit_balance_serial_replay(ray_session):
    from kgray.pipelines.relational import user_credit_balance

    got = {r["user_id"]: r for r in user_credit_balance(SF).take_all()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_id",
                                "event_type", "value"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"])
    for uid, g in ev.groupby("user_id"):
        s, peak = 0, None
        for _, r in g.iterrows():
            d = _cents(r["value"]) if r["event_type"] == "purchase" \
                else -500
            s = max(0, s + d)
            peak = s if peak is None else max(peak, s)
        row = got[uid]
        assert row["final_balance"] == s
        assert row["peak_balance"] == peak
        assert row["n_events"] == len(g)
    assert set(got) == set(ev["user_id"].unique())


def test_scd2_segment_replay(ray_session):
    from kgray.pipelines.relational import customer_scd2_orders

    got = {r["segment"]: r for r in customer_scd2_orders(SF).take_all()}
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]
                         ).to_pandas().set_index("c_custkey")
    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"]).to_pandas()
    V1 = pd.Timestamp("1995-07-01")
    V2 = pd.Timestamp("1996-07-01")
    exp = {}
    for _, r in orders.iterrows():
        k = r["o_custkey"]
        hb = _hb(k)
        seg = cust.loc[k, "c_mktsegment"]
        if hb < 300 and r["o_orderdate"] >= V1:
            seg = "MIGRATED"
        if hb < 100 and r["o_orderdate"] >= V2:
            seg = "CHURNED"
        n, c = exp.get(seg, (0, 0))
        exp[seg] = (n + 1, c + _cents(r["o_totalprice"]))
    assert set(got) == set(exp)
    for seg, (n, c) in exp.items():
        assert got[seg]["n_orders"] == n
        assert got[seg]["revenue_cents"] == c
    # conservation: every order lands in exactly one version interval
    assert sum(r["n_orders"] for r in got.values()) == len(orders)


def _serial_attribution(sf):
    """Independent replay of the absorbing-chain removal model."""
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "ts", "event_id",
                                "event_type"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"])
    UNIT = 10 ** 12
    trans, starts, ends = {}, {}, {}
    for _, g in ev.groupby("user_id"):
        types = g["event_type"].tolist()
        starts[types[0]] = starts.get(types[0], 0) + 1
        if types[-1] != "purchase":
            ends[types[-1]] = ends.get(types[-1], 0) + 1
        for a, b in zip(types, types[1:]):
            if a != "purchase":
                trans[(a, b)] = trans.get((a, b), 0) + 1
    tbl = dict(trans)
    for t, n in ends.items():
        tbl[(t, "__END__")] = tbl.get((t, "__END__"), 0) + n
    tbl[("purchase", "purchase")] = 1
    rowsum = {}
    for (f, _t), n in tbl.items():
        rowsum[f] = rowsum.get(f, 0) + n
    p_fp = {ft: 10**6 * n // rowsum[ft[0]] for ft, n in tbl.items()}
    tot = sum(starts.values())

    def run(removed):
        mass = {s: (10**6 * n // tot) * 10**6
                for s, n in starts.items() if s != removed}
        for _ in range(16):
            nxt = {}
            for (f, t), p in p_fp.items():
                if f == removed or t == removed or t == "__END__":
                    continue
                m = mass.get(f, 0)
                if m:
                    nxt[t] = nxt.get(t, 0) + m * p // 10**6
            mass = nxt
        return mass.get("purchase", 0)

    chans = sorted(set(ev["event_type"]) - {"purchase"})
    full = run("__none__")
    return {c: (full, run(c)) for c in chans}


def test_markov_attribution_serial_replay(ray_session):
    from kgray.pipelines.relational import purchase_markov_attribution

    got = {r["channel"]: r
           for r in purchase_markov_attribution(SF).to_pylist()}
    exp = _serial_attribution(SF)
    assert set(got) == set(exp)
    for c, (full, rem) in exp.items():
        assert got[c]["conv_full_fp"] == full
        assert got[c]["conv_removed_fp"] == rem
        assert got[c]["removal_effect_micro"] == \
            (0 if full == 0 else 10**6 * (full - rem) // full)
        # removal can only lose conversion mass in this model
        assert rem <= full


def test_bitemporal_composition_law(ray_session):
    """The bitemporal read must equal composing the two single-
    dimension ops by hand: system snapshot at v1, then per-order
    valid-time segment."""
    from kgray.pipelines.relational import orders_bitemporal_state

    got = {r["segment"]: r
           for r in orders_bitemporal_state(SF).take_all()}
    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"]).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]
                         ).to_pandas().set_index("c_custkey")
    V1 = pd.Timestamp("1995-07-01")
    V2 = pd.Timestamp("1996-07-01")
    exp = {}
    for _, r in orders.iterrows():
        hb = _hb(r["o_orderkey"])
        if hb < 100:
            continue                      # deleted at system v1
        price = r["o_totalprice"] + (10.0 if hb < 300 else 0.0)
        chb = _hb(r["o_custkey"])
        seg = cust.loc[r["o_custkey"], "c_mktsegment"]
        if chb < 300 and r["o_orderdate"] >= V1:
            seg = "MIGRATED"
        if chb < 100 and r["o_orderdate"] >= V2:
            seg = "CHURNED"
        n, c = exp.get(seg, (0, 0))
        exp[seg] = (n + 1, c + _cents(price))
    assert set(got) == set(exp)
    for seg, (n, c) in exp.items():
        assert got[seg]["n_orders"] == n
        assert got[seg]["revenue_cents"] == c
