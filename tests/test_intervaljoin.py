"""windowed_pair_join: large×large stream-stream interval join —
brute-force equality including keys spanning block boundaries, a hot
key over many blocks, inclusive window edges, and null keys."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kgray.stages.intervaljoin import windowed_pair_join


def _brute(L, R, window):
    out = set()
    for lk, lt, lid in L:
        if lk is None:
            continue
        for rk, rt, rid in R:
            if rk == lk and lt - window <= rt <= lt:
                out.add((lid, rid, lk, lt - rt))
    return out


def _got(ds):
    df = ds.to_pandas()
    if df.empty:
        return set()
    return set(zip(df.left_id, df.right_id, df.key, df.lag))


def _mk(rows, nparts):
    t = pa.table({
        "k": pa.array([r[0] for r in rows], type=pa.int64()),
        "t": pa.array([r[1] for r in rows], type=pa.int64()),
        "i": pa.array([r[2] for r in rows], type=pa.int64())})
    return rd.from_arrow(t).repartition(nparts)


def test_matches_bruteforce_random(ray_session):
    rng = np.random.default_rng(17)
    L = [(int(rng.integers(0, 12)), int(rng.integers(0, 1000)), 1000 + i)
         for i in range(120)]
    R = [(int(rng.integers(0, 12)), int(rng.integers(0, 1000)), 5000 + i)
         for i in range(200)]
    got = _got(windowed_pair_join(_mk(L, 7), _mk(R, 9),
                                  "k", "t", "i", window=50))
    assert got == _brute(L, R, 50)
    assert got                                   # non-vacuous


def test_hot_key_spans_blocks_and_inclusive_edges(ray_session):
    # one key, rows spread over 16 blocks; window edges inclusive
    L = [(1, 10 * j, 1000 + j) for j in range(64)]
    R = [(1, 10 * j + d, 5000 + 10 * j + d) for j in range(64) for d in (0, -30)]
    got = _got(windowed_pair_join(_mk(L, 16), _mk(R, 16),
                                  "k", "t", "i", window=30))
    want = _brute(L, R, 30)
    assert got == want
    # the exact-boundary match (lag == window) is present
    assert any(g == 30 for (_, _, _, g) in want)
    assert all(0 <= g <= 30 for (_, _, _, g) in got)


def test_null_keys_never_match_and_empty_sides(ray_session):
    L = [(None, 5, 1), (2, 5, 2)]
    R = [(None, 5, 3), (2, 4, 4), (3, 4, 5)]
    got = _got(windowed_pair_join(_mk(L, 2), _mk(R, 2),
                                  "k", "t", "i", window=10))
    assert got == {(2, 4, 2, 1)}
    got2 = _got(windowed_pair_join(_mk(L, 2), _mk([], 1),
                                   "k", "t", "i", window=10))
    assert got2 == set()
