"""Interval-union coverage: brute-force parity on the testdata, plus a
cross-block chain — one hot user whose intervals all overlap must come
back as ONE island even when the sorted run spans every block."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _brute(df, dur_us):
    out = {}
    for uid, g in df.groupby("user_id"):
        s = np.sort(g["s"].to_numpy())
        e = s + dur_us
        n, tot = 0, 0
        cs, ce = None, None
        for a, b in zip(s, e):
            if cs is None or a > ce:
                if cs is not None:
                    n += 1
                    tot += ce - cs
                cs, ce = a, b
            else:
                ce = max(ce, b)
        n += 1
        tot += ce - cs
        out[int(uid)] = (n, int(tot))
    return out


def test_active_spans_matches_bruteforce(ray_session):
    from kgray.pipelines.relational import user_active_spans

    sf = "/root/testdata/sf0.001"
    got = {r["user_id"]: (r["n_islands"], r["active_us"])
           for r in user_active_spans(sf).take_all()}
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["s"] = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    exp = _brute(ev, 300 * 1_000_000)
    assert got == exp and len(got) > 10


def test_active_spans_hot_user_one_island(ray_session, tmp_path):
    from kgray.pipelines.relational import user_active_spans

    # user 7: 50k events 1s apart (dur 300s -> one giant island);
    # user 8: events 1h apart -> every event its own island
    n = 50_000
    ts7 = np.arange(n, dtype=np.int64) * 1_000_000
    ts8 = np.arange(200, dtype=np.int64) * 3_600_000_000
    ts = np.concatenate([ts7, ts8])
    uid = np.concatenate([np.full(n, 7), np.full(200, 8)]).astype(np.int64)
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "user_id": pa.array(uid),
        "ts": pa.array(ts.astype("datetime64[us]")),
    }), f"{sf}/events.parquet")
    got = {r["user_id"]: (r["n_islands"], r["active_us"])
           for r in user_active_spans(sf).take_all()}
    assert got[7] == (1, (n - 1) * 1_000_000 + 300 * 1_000_000)
    assert got[8] == (200, 200 * 300 * 1_000_000)
