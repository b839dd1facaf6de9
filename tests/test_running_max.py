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
