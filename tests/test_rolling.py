"""Rolling-frame window operator (stages/rolling.py): pandas equality
including a hot key spanning many blocks, frame-boundary and k=0 edge
cases, and partitioning invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgray.stages.rolling import grouped_rolling


def _expected(df, k):
    g = df.sort_values(["key", "o"]).groupby("key")["v"]
    r = g.rolling(k + 1, min_periods=1)
    out = df.sort_values(["key", "o"]).reset_index(drop=True)
    out["roll_sum"] = r.sum().values.astype(np.int64)
    out["roll_n"] = r.count().values.astype(np.int64)
    out["roll_min"] = r.min().values.astype(np.int64)
    out["roll_max"] = r.max().values.astype(np.int64)
    out["roll_avg"] = out["roll_sum"].astype(float) / out["roll_n"].astype(float)
    return out


def _run(df, k, parts):
    ds = rd.from_arrow(pa.table({
        "key": pa.array(df["key"].tolist(), type=pa.string()),
        "o": pa.array(df["o"].tolist(), type=pa.int64()),
        "v": pa.array(df["v"].tolist(), type=pa.int64())})).repartition(parts)
    return (grouped_rolling(ds, "key", ["o"], "v", k)
            .to_pandas().sort_values(["key", "o"]).reset_index(drop=True))


def test_rolling_matches_pandas_with_hot_key(ray_session):
    rng = np.random.default_rng(5)
    # hot key 'h' is ~half the rows -> guaranteed to span many blocks
    keys = rng.choice(["h", "a", "b", "c", "d", "h", "h", "h"], size=3000)
    df = pd.DataFrame({"key": keys,
                       "o": np.arange(3000),
                       "v": rng.integers(-1000, 1000, size=3000)})
    got = _run(df, 3, parts=16)
    exp = _expected(df, 3)
    for c in ("roll_sum", "roll_n", "roll_min", "roll_max"):
        assert got[c].tolist() == exp[c].tolist(), c
    assert got["roll_avg"].tolist() == exp["roll_avg"].tolist()


def test_rolling_wide_frame_and_k0(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"key": rng.choice(["x", "y"], size=200),
                       "o": np.arange(200),
                       "v": rng.integers(0, 50, size=200)})
    # frame wider than most partitions -> UNBOUNDED-like behavior
    got = _run(df, 150, parts=7)
    exp = _expected(df, 150)
    for c in ("roll_sum", "roll_n", "roll_min", "roll_max"):
        assert got[c].tolist() == exp[c].tolist(), c
    # k = 0: every frame is just the row itself
    got0 = _run(df, 0, parts=7)
    assert got0["roll_sum"].tolist() == got0["v"].tolist()
    assert got0["roll_n"].unique().tolist() == [1]


def test_rolling_partitioning_invariance(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"key": rng.choice(list("pq"), size=500),
                       "o": np.arange(500),
                       "v": rng.integers(-99, 99, size=500)})
    outs = [_run(df, 4, parts=p) for p in (1, 3, 11)]
    for o in outs[1:]:
        assert o.equals(outs[0])


def test_first_last_value_matches_pandas(ray_session):
    """grouped_first_last vs pandas transform, incl. a hot key spanning
    many blocks and a null partition key."""
    from kgray.stages.scan import grouped_first_last

    rng = np.random.default_rng(21)
    keys = rng.choice([7, 7, 7, 1, 2, None], size=2000).tolist()
    df = pd.DataFrame({"key": pd.array(keys, dtype="Int64"),
                       "o": np.arange(2000),
                       "v": [f"v{i%17}" for i in range(2000)]})
    ds = rd.from_arrow(pa.table({
        "key": pa.array(keys, type=pa.int64()),
        "o": pa.array(df["o"], type=pa.int64()),
        "v": pa.array(df["v"], type=pa.string())})).repartition(16)
    got = (grouped_first_last(ds, "key", ["o"], "v")
           .to_pandas().sort_values("o").reset_index(drop=True))
    grp = df.groupby("key", dropna=False)["v"]
    exp_first = grp.transform("first")
    exp_last = grp.transform("last")
    assert got["first_value"].tolist() == exp_first.tolist()
    assert got["last_value"].tolist() == exp_last.tolist()


def test_rolling_quantile_matches_bruteforce(ray_session):
    """grouped_rolling_quantile == a per-row sorted-frame oracle,
    including a hot key spanning 16 blocks (carry crosses many block
    boundaries), frames wider than the run, and q = 1/4 and 1/2."""
    import math
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kgray.stages.rolling import grouped_rolling_quantile

    rng = np.random.default_rng(23)
    keys = [7] * 200 + [1, 2, 3] * 20 + [None] * 5
    rows = [(k, i, int(rng.integers(-50, 50)))
            for i, k in enumerate(keys)]
    t = pa.table({"k": pa.array([r[0] for r in rows], type=pa.int64()),
                  "o": pa.array([r[1] for r in rows], type=pa.int64()),
                  "v": pa.array([r[2] for r in rows], type=pa.int64())})
    for qn, qd, k in ((1, 2, 5), (1, 4, 3), (1, 2, 0)):
        got = (grouped_rolling_quantile(rd.from_arrow(t).repartition(16),
                                        "k", ["o"], "v", k,
                                        q_num=qn, q_den=qd)
               .to_pandas().sort_values(["k", "o"], ignore_index=True))
        df = t.to_pandas().sort_values(["k", "o"], ignore_index=True)
        want = []
        for i in range(len(df)):
            ki = df.k[i]
            same = df[(df.k == ki) if ki == ki and ki is not None
                      else df.k.isna()]
            pos = same.index.get_loc(i)
            fr = sorted(same.v.iloc[max(0, pos - k):pos + 1])
            want.append(fr[math.ceil(qn * len(fr) / qd) - 1])
        assert got.roll_med.tolist() == want, (qn, qd, k)
