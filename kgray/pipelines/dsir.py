"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by how much more likely
its hashed n-gram features are under a TARGET distribution than under
the RAW distribution, then keep the top slice.  The pretraining-data
selector used when you want "more like Wikipedia" out of a crawl.

Engine-exact formulation (the repo's integer discipline):

* features = hashed unigrams + bigrams (``polyhash64_batch`` over the
  flat token array; bigrams from one shifted vectorized combine — no
  per-row Python);
* the target and raw feature distributions are EXACT int64 count
  vectors (one ``D``-long partial per block, order-independent sums);
* the per-feature log-ratio ``ln((ct+1)/(Nt+D)) − ln((cr+1)/(Nr+D))``
  is evaluated driver-side with ``math.log`` ON EXACT INTEGERS and
  quantized to int64 micro-nats — every downstream score is an exact
  integer dot ``counts · ratio``, a pure function of the data;
* selection = global top-k by (score desc, url asc) through the same
  per-block-topk + driver-merge exchange as ``global_topk`` — no full
  sort, no all-to-all.

The target here is the corpus's zh pages (an md5-chosen sample of
them), standing in for the curated target corpus; DSIR should then
select the remaining zh-like pages out of the raw crawl — pinned by
the enrichment test.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import polyhash64_batch

__all__ = ["dsir_scores", "dsir_select"]

D = 1 << 14                   # hashed feature buckets
_NAT_SCALE = 1_000_000        # micro-nats
TARGET_SAMPLE_PERMILLE = 500  # md5(url) bucket < 500 AND zh → target


def _feature_rows(texts) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string array → (flat feature ids, doc index per feature):
    unigram hashes plus bigram hashes (unigram hash pairs combined with
    one vectorized multiply-xor), all mod D."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(texts)
    n = len(toks)
    offs = np.asarray(toks.offsets, dtype=np.int64)
    widths = np.diff(offs)
    flat = toks.flatten()
    if not len(flat):
        return (np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    h = polyhash64_batch(flat)                    # uint64 per token
    docidx = np.repeat(np.arange(n, dtype=np.int64), widths)
    keep = np.asarray(pc.utf8_length(flat), dtype=np.int64) > 0
    h, docidx = h[keep], docidx[keep]
    uni = (h % np.uint64(D)).astype(np.int64)
    # bigrams: adjacent tokens within the same doc
    with np.errstate(over="ignore"):
        big = (h[:-1] * np.uint64(0x9E3779B97F4A7C15)) ^ h[1:]
    same = docidx[:-1] == docidx[1:]
    bi = (big[same] % np.uint64(D)).astype(np.int64)
    return (np.concatenate([uni, bi]),
            np.concatenate([docidx, docidx[:-1][same]]))


def _is_target(urls, langs) -> np.ndarray:
    from ..functions.sampling import _md5_bucket
    samp = _md5_bucket(list(urls), 1000) < TARGET_SAMPLE_PERMILLE
    return samp & (np.asarray(langs) == "zh")


def _pages_ds(sf_dir: str):
    from ..sources.derived import pages_dataset
    return pages_dataset(sf_dir)


def _count_partial(b: pa.Table) -> pa.Table:
    """Two D-long exact count rows per block: target and raw."""
    feats, docidx = _feature_rows(b.column("text"))
    tgt_doc = _is_target(b.column("url").to_pylist(),
                         b.column("lang").to_pylist())
    raw = np.zeros(D, dtype=np.int64)
    tgt = np.zeros(D, dtype=np.int64)
    if len(feats):
        np.add.at(raw, feats, 1)
        tm = tgt_doc[docidx]
        np.add.at(tgt, feats[tm], 1)
    slots = np.arange(D, dtype=np.int64)
    return pa.table({
        "slot": pa.array(np.r_[slots, slots]),
        "side": pa.array(np.r_[np.zeros(D, np.int8), np.ones(D, np.int8)]),
        "c": pa.array(np.r_[raw, tgt])})


def _log_ratio_table(sf_dir: str) -> np.ndarray:
    """int64 micro-nat log-ratio per feature bucket (driver-side
    math.log on exact integer counts — libm is deterministic)."""
    docs = _pages_ds(sf_dir)
    raw = np.zeros(D, dtype=np.int64)
    tgt = np.zeros(D, dtype=np.int64)
    for t in ray.get(docs.map_batches(_count_partial, batch_format="pyarrow",
                                      zero_copy_batch=True).to_arrow_refs()):
        if t.num_rows == 0:
            continue
        slots = t.column("slot").to_numpy(zero_copy_only=False)
        side = t.column("side").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        np.add.at(raw, slots[side == 0], c[side == 0])
        np.add.at(tgt, slots[side == 1], c[side == 1])
    nt, nr = int(tgt.sum()), int(raw.sum())
    ratio = np.empty(D, dtype=np.int64)
    for f in range(D):
        lr = (math.log(int(tgt[f]) + 1) - math.log(nt + D)
              - math.log(int(raw[f]) + 1) + math.log(nr + D))
        ratio[f] = math.floor(lr * _NAT_SCALE)
    return ratio


def dsir_scores(sf_dir: str):
    """(url, dsir_score) for every page: exact int64 micro-nat
    importance log-weight ``Σ_f c_f · ratio_f`` — one streaming pass,
    ratio table broadcast once."""
    ratio = _log_ratio_table(sf_dir)
    ref = ray.put(ratio)

    def score(b: pa.Table) -> pa.Table:
        r = ray.get(ref)
        feats, docidx = _feature_rows(b.column("text"))
        s = np.zeros(b.num_rows, dtype=np.int64)
        if len(feats):
            np.add.at(s, docidx, r[feats])
        return pa.table({"url": b.column("url"),
                         "dsir_score": pa.array(s, type=pa.int64())})

    return _pages_ds(sf_dir).map_batches(score, batch_format="pyarrow",
                                         zero_copy_batch=True)


def dsir_select(sf_dir: str, keep_permille: int = 100):
    """Top ``keep_permille``‰ of pages by (dsir_score desc, url asc) —
    the resampled training slice.  k is computed from the exact corpus
    count; selection goes through the per-block-topk exchange (≤ k rows
    per block to one driver merge)."""
    from ..stages.topk import global_topk

    scores = dsir_scores(sf_dir).materialize()
    n = scores.count()
    k = max(1, (n * keep_permille) // 1000)
    return global_topk(scores, [("dsir_score", "descending"),
                                ("url", "ascending")], k)
