"""Sequence packing (pipelines/pack.py) and mixture sampling
(functions/sampling.py:mixture_sample)."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from kgray.functions.sampling import mixture_sample
from kgray.pipelines.pack import pack_documents, pack_tokens_kernel


def _brute_pack(tok, budget):
    bins, b, fill = [], 0, 0
    for t in tok:
        if fill and fill + t > budget:
            b += 1
            fill = 0
        bins.append(b)
        fill += t
    return bins


def test_pack_kernel_matches_brute_force():
    rng = np.random.default_rng(13)
    for _ in range(20):
        tok = rng.integers(1, 120, size=rng.integers(1, 400))
        budget = int(rng.integers(50, 300))
        got = pack_tokens_kernel(tok.astype(np.int64), budget).tolist()
        assert got == _brute_pack(tok.tolist(), budget)
    # oversize documents get their own bin and don't stall the scan
    assert pack_tokens_kernel(np.array([500, 10, 500, 10]), 100).tolist() \
        == [0, 1, 2, 3]
    assert pack_tokens_kernel(np.array([], dtype=np.int64), 100).tolist() == []


def test_pack_documents_end_to_end(ray_session):
    docs = pa.table({
        "doc_id": pa.array(list(range(20)), type=pa.int64()),
        "text": pa.array([" ".join(["w"] * (5 + 7 * (i % 4)))
                          for i in range(20)])})
    out = (pack_documents(rd.from_arrow(docs).repartition(4),
                          budget=30, n_shards=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 20
    assert out["n_tokens"].tolist() == [5 + 7 * (i % 4) for i in range(20)]
    assert (out["shard"] == out["doc_id"] % 3).all()
    # within each shard: bins follow the greedy brute force over the
    # shard's doc_id order, and bin fills never exceed the budget
    for s, grp in out.groupby("shard"):
        grp = grp.sort_values("doc_id")
        local = (grp["bin_id"] - (s << 40)).tolist()
        assert local == _brute_pack(grp["n_tokens"].tolist(), 30)
        fills = grp.groupby("bin_id")["n_tokens"].sum()
        assert (fills <= 30).all()
        # bin_pos is the 0-based position inside the bin
        assert grp.groupby("bin_id")["bin_pos"].apply(
            lambda p: p.tolist() == list(range(len(p)))).all()


def test_mixture_sample_rates_and_determinism(ray_session):
    n = 4000
    t = pa.table({
        "k": pa.array(list(range(n)), type=pa.int64()),
        "g": pa.array(["keep_all" if i % 2 else "tenth" for i in range(n)])})
    rates = {"keep_all": 1000, "tenth": 100}
    got = (mixture_sample(rd.from_arrow(t).repartition(5), "g", "k", rates)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # keep_all rows all survive
    assert (got["g"] == "keep_all").sum() == n // 2
    kept_tenth = (got["g"] == "tenth").sum()
    assert 0.05 * n / 2 < kept_tenth < 0.15 * n / 2
    # exact md5 membership (deterministic, engine-independent)
    exp = [i for i in range(0, n, 2)
           if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
           % 1000 < 100]
    assert got.loc[got["g"] == "tenth", "k"].tolist() == exp
    # unlisted groups use the default rate (keep-all by default)
    got2 = mixture_sample(rd.from_arrow(t), "g", "k", {}).to_pandas()
    assert len(got2) == n
