"""grouped_running_max vs a brute-force exclusive prefix max —
including a hot key spanning many blocks (carry threading) and
single-row keys (all-NULL output)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _brute(df):
    out = []
    for _, g in df.sort_values(["k", "o"]).groupby("k", sort=False):
        v = g["v"].to_numpy()
        prev = np.empty(len(v), dtype=object)
        prev[0] = None
        for i in range(1, len(v)):
            prev[i] = int(max(v[:i]))
        out.append(pd.DataFrame({"k": g["k"], "o": g["o"], "v": g["v"],
                                 "prev_max": prev}))
    return pd.concat(out, ignore_index=True)


def test_running_max_brute_force(ray_session):
    from kgray.stages.scan import grouped_running_max

    rng = np.random.default_rng(7)
    n = 4000
    # one hot key (~35%) guarantees multi-block runs at 16 partitions
    keys = np.where(rng.random(n) < 0.35, 777,
                    rng.integers(0, 80, n)).astype(np.int64)
    df = pd.DataFrame({
        "k": keys,
        "o": np.arange(n, dtype=np.int64),
        "v": rng.integers(-10**12, 10**12, n).astype(np.int64)})
    # a few single-row keys
    df.loc[df.index[:3], "k"] = np.array([9001, 9002, 9003])

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(16)
    got = (grouped_running_max(ds, "k", ["o"], "v")
           .to_pandas().sort_values(["k", "o"], ignore_index=True))
    exp = _brute(df).sort_values(["k", "o"], ignore_index=True)
    got["prev_max"] = got["prev_max"].astype(object).where(
        got["prev_max"].notna(), None)
    assert list(got["k"]) == list(exp["k"])
    assert list(got["o"]) == list(exp["o"])
    for a, b in zip(got["prev_max"], exp["prev_max"]):
        assert (a is None and b is None) or int(a) == int(b)
    # single-row keys → NULL watermark
    for k in (9001, 9002, 9003):
        assert got.loc[got["k"] == k, "prev_max"].isna().all()


def test_events_cusum_peaks_matches_serial_recurrence(ray_session):
    """The linearized CUSUM (prefix sum minus clamped prefix min)
    equals the serial ``s_i = max(0, s_{i-1} + d_i)`` recurrence — the
    identity the distributed plan depends on — checked per type over
    sf0.001, and the reported peaks are exactly the top-10."""
    import duckdb
    import numpy as np

    from kgray.pipelines.relational import events_cusum_peaks

    sf = "/root/testdata/sf0.001"
    got = events_cusum_peaks(sf).to_pandas()

    rows = duckdb.sql(f"""
        SELECT event_type, event_id, CAST(epoch_us(ts) AS BIGINT) AS ev_us,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS vc
        FROM read_parquet('{sf}/events.parquet')
        ORDER BY event_type, ev_us, event_id""").df()
    exp_peaks = {}
    for et, grp in rows.groupby("event_type", sort=True):
        vc = grp["vc"].to_numpy()
        target = int(vc.sum()) // len(vc)
        s, peaks = 0, []
        for eid, us, v in zip(grp["event_id"], grp["ev_us"], vc):
            s = max(0, s + int(v) - target)
            peaks.append((s, -int(eid), int(eid), int(us)))
        top = sorted(peaks, key=lambda p: (-p[0], p[2]))[:10]
        exp_peaks[et] = [(r + 1, eid, us, s)
                         for r, (s, _, eid, us) in enumerate(top)]
    for et, grp in got.groupby("event_type"):
        mine = [(int(r["rank"]), int(r["event_id"]), int(r["ev_us"]),
                 int(r["cusum_cents"]))
                for _, r in grp.sort_values("rank").iterrows()]
        assert mine == exp_peaks[et]
