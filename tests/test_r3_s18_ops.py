"""Session-18 batch: forecast backtest (serial replay + planted
seasonality makes seasonal-naive win), Heaps vocabulary growth
(serial replay + monotonicity / reconciliation laws)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_backtest_serial(ray_session):
    from kgray.pipelines.relational import events_forecast_backtest

    got = {r["event_type"]: r
           for r in events_forecast_backtest(SF).to_pylist()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["hour"] = ev["ts"].astype("int64") // 3_600_000_000
    for t, g in ev.groupby("event_type"):
        hc = g.groupby("hour").size()
        lo, hi = int(hc.index.min()), int(hc.index.max())
        s = np.array([int(hc.get(h, 0)) for h in range(lo, hi + 1)])
        nv = len(s) - 1
        en = int(np.abs(np.diff(s)).sum())
        ns = max(0, len(s) - 24)
        es = int(np.abs(s[24:] - s[:-24]).sum()) if ns else 0
        r = got[t]
        assert (r["n_points"], r["mae_naive_num"],
                r["n_seasonal"], r["mae_seasonal_num"]) == \
            (nv, en, ns, es)
        exp_w = "naive" if ns == 0 or en * ns <= es * nv else "seasonal"
        assert r["winner"] == exp_w


def test_backtest_planted_seasonality(ray_session, tmp_path):
    from kgray.pipelines.relational import events_forecast_backtest

    # strict 24h cycle with large within-day swings: seasonal-naive is
    # perfect (error 0), naive is terrible
    rows = []
    eid = 1
    for day in range(6):
        for h in range(24):
            n = 1 + 20 * (h % 2)        # alternating 1,21,1,21...
            for _ in range(n):
                rows.append((eid, "click",
                             pd.Timestamp("2024-01-01")
                             + pd.Timedelta(days=day, hours=h)))
                eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "event_type", "ts"])
    df["value"] = 1.0
    df["user_id"] = np.int64(1)
    df["props"] = "{}"
    df["ts"] = df["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(str(tmp_path), "events.parquet"))
    got = events_forecast_backtest(str(tmp_path)).to_pylist()[0]
    assert got["mae_seasonal_num"] == 0
    assert got["mae_naive_num"] > 0
    assert got["winner"] == "seasonal"


def test_vocab_growth_serial_and_laws(ray_session):
    from kgray.pipelines.relational import vocab_growth_curve

    got = vocab_growth_curve(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ids = docs["doc_id"].to_numpy()
    n = len(ids)
    cuts = sorted({int(ids[max(0, int(np.ceil(q * n)) - 1)])
                   for q in [i / 10 for i in range(1, 11)]})
    toks = [t.split() for t in docs["text"]]
    exp = []
    for cut in cuts:
        m = ids <= cut
        nd = int(m.sum())
        ct = sum(len(tk) for tk, keep in zip(toks, m) if keep)
        vocab = set()
        for tk, keep in zip(toks, m):
            if keep:
                vocab.update(tk)
        exp.append((cut, nd, ct, len(vocab)))
    assert list(zip(got["checkpoint_doc"], got["n_docs"],
                    got["cum_tokens"], got["distinct_tokens"])) == exp
    # laws: all three curves are non-decreasing; vocab is concave-ish
    # (new vocab per doc never exceeds tokens per doc)
    for c in ("n_docs", "cum_tokens", "distinct_tokens"):
        v = got[c].to_numpy()
        assert (np.diff(v) >= 0).all()
    assert (got["distinct_tokens"] <= got["cum_tokens"]).all()
    # last checkpoint covers the whole corpus
    assert got["n_docs"].iloc[-1] == n
