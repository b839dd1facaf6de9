"""Model-based document quality filtering (CCNet / FineWeb style):
a hashed bag-of-tokens logistic regression trained ON THE ENGINE with
weak labels, then streamed over the corpus as a scoring stage.

Determinism discipline (the repo's standard): the model never leaves
the integer grid when it matters —

* features are raw token counts hashed into ``D`` buckets
  (``polyhash64_batch`` over the flat token array, no per-row Python);
* the per-doc logit is an INTEGER dot product ``counts · wq`` of int64
  counts with the 2^24-quantized weight vector, finished by ONE IEEE
  division and one ``exp`` — a pure function of (doc, wq), immune to
  batch shape and BLAS blocking;
* per-doc gradient contributions quantize to int64 micro-units before
  they are summed, so the distributed full-batch gradient is an exact,
  order-independent integer reduction — weights after every epoch are
  bit-identical for ANY partitioning or worker count (same law as
  ``train_crf_distributed`` / ``embedding_kmeans``).

Scale shape: training runs on a deterministic md5 sample (quality
models are always trained on a sample — CCNet trains on a Wikipedia
subset); each epoch ships one ``D+1``-long int64 partial per block.
Scoring is one streaming pass with the quantized weights broadcast
once via ``ray.put``.

No reference counterpart (the reference is a token-level tagger).
The weak label is the page corpus's ``lang == 'zh'`` flag — a genuine
text property (different script → different hashed vocabulary),
standing in for the "looks like Wikipedia" target of the real
pipelines; the ``documents`` table is a shared-vocabulary word soup
whose metadata is unlearnable by construction (LDA ceiling ≈ 0.61),
so the classifier runs over the derived web corpus instead.  The
label is imbalanced (~4% zh), so the quality gate pins BOTH-class
recall, not accuracy alone.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import polyhash64_batch

__all__ = ["train_quality_model", "doc_quality_scores"]

D = 1 << 12                  # hashed feature buckets (+1 bias slot)
_WQ_SCALE = 1 << 24          # weight / gradient fixed-point scale
TRAIN_PERMILLE = 600         # md5(url) bucket < 600 trains


def _hash_counts(texts) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string array/chunked-array of documents → (counts
    ``[n, D]`` int64, n_tokens ``[n]`` int64) with zero per-row
    Python: one C++ whitespace split, one vectorized polynomial hash
    over the flat token array, one ``np.add.at`` scatter."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(texts)
    n = len(toks)
    offs = np.asarray(toks.offsets, dtype=np.int64)
    widths = np.diff(offs)
    flat = toks.flatten()
    counts = np.zeros((n, D), dtype=np.int64)
    if len(flat):
        h = (polyhash64_batch(flat) % np.uint64(D)).astype(np.int64)
        keep = np.asarray(pc.utf8_length(flat), dtype=np.int64) > 0
        docidx = np.repeat(np.arange(n, dtype=np.int64), widths)
        np.add.at(counts, (docidx[keep], h[keep]), 1)
    return counts, counts.sum(axis=1)


def _logits_q(counts: np.ndarray, ntok: np.ndarray,
              wq: np.ndarray) -> np.ndarray:
    """Integer dot + ONE IEEE division per doc:
    ``z = (counts · wq[:D] + ntok·0 + wq[D]·ntok?)`` — bias enters as
    ``wq[D]`` once per doc; empty docs get the bias only."""
    zi = counts @ wq[:D]                       # int64 exact
    denom = np.maximum(ntok, 1) * _WQ_SCALE
    return zi / denom + wq[D] / _WQ_SCALE


def _train_ids_mask(urls) -> np.ndarray:
    from ..functions.sampling import _md5_bucket
    return _md5_bucket(list(urls), 1000) < TRAIN_PERMILLE


def _pages_ds(sf_dir: str):
    from ..sources.derived import pages_dataset
    return pages_dataset(sf_dir)


def _epoch_partial(b: pa.Table, wq: np.ndarray) -> pa.Table:
    """One block's exact int64 gradient partial over its train rows."""
    tmask = _train_ids_mask(b.column("url").to_pylist())
    if not tmask.any():
        return pa.table({"slot": pa.array([], type=pa.int64()),
                         "g": pa.array([], type=pa.int64())})
    texts = b.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = texts.filter(pa.array(tmask))
    y = (np.asarray(b.column("lang").to_pylist())[tmask]
         == "zh").astype(np.float64)
    counts, ntok = _hash_counts(texts)
    z = _logits_q(counts, ntok, wq)
    p = 1.0 / (1.0 + np.exp(-z))
    resid = p - y                               # [n]
    # quantize PER DOC, then integer-sum: a float reduction before the
    # rint would make the rounding depend on block boundaries
    perdoc = resid / np.maximum(ntok, 1)        # [n]
    Gq = np.rint(perdoc[:, None] * counts * _WQ_SCALE).astype(np.int64)
    gq = Gq.sum(axis=0)                         # [D] exact
    gb = int(np.rint(resid * _WQ_SCALE).astype(np.int64).sum())
    # slots 0..D-1 = feature grads, D = bias grad, D+1 = train-row count
    # (one output block may concatenate several batches' partials — the
    # count must be a summable row, not per-row metadata)
    return pa.table({
        "slot": pa.array(np.r_[np.arange(D + 1, dtype=np.int64), D + 1]),
        "g": pa.array(np.r_[gq, gb, int(tmask.sum())])})


def train_quality_model(sf_dir: str, epochs: int = 40,
                        lr: float = 300.0, _docs=None) -> np.ndarray:
    """Full-batch GD on the md5 train split; returns the QUANTIZED
    int64 weight vector ``wq [D+1]`` (bias last) — bit-identical for
    any partitioning (exact integer gradient reduction per epoch).
    ``_docs`` overrides the page source (partitioning-invariance
    tests)."""
    docs = (_docs if _docs is not None else _pages_ds(sf_dir)).materialize()
    wq = np.zeros(D + 1, dtype=np.int64)
    for _ in range(epochs):
        ref = ray.put(wq)

        def partial(b: pa.Table) -> pa.Table:
            return _epoch_partial(b, ray.get(ref))

        gsum = np.zeros(D + 1, dtype=np.int64)
        n_train = 0
        for t in ray.get(docs.map_batches(partial, batch_format="pyarrow",
                                          zero_copy_batch=True)
                         .to_arrow_refs()):
            if t.num_rows == 0:
                continue
            slots = t.column("slot").to_numpy(zero_copy_only=False)
            g = t.column("g").to_numpy(zero_copy_only=False)
            gm = slots <= D
            np.add.at(gsum, slots[gm], g[gm])
            n_train += int(g[~gm].sum())
        if n_train == 0:
            break
        # w -= lr * grad / n, carried on the integer grid: one float
        # expression per slot, then re-quantize — pure function of
        # (gsum, n_train), so the epoch update is order-independent
        w = wq / _WQ_SCALE - lr * (gsum / _WQ_SCALE) / n_train
        wq = np.rint(w * _WQ_SCALE).astype(np.int64)
    return wq


def doc_quality_scores(sf_dir: str, epochs: int = 40, lr: float = 300.0):
    """queries() surface: (url, score, pred_zh) for every page — the
    trained model streamed over the corpus, weights broadcast once.
    ``score`` is the sigmoid of the integer-dot logit (one IEEE
    division + exp per page); ``pred_zh`` = score >= 0.5."""
    wq = train_quality_model(sf_dir, epochs=epochs, lr=lr)
    ref = ray.put(wq)

    def score(b: pa.Table) -> pa.Table:
        w = ray.get(ref)
        counts, ntok = _hash_counts(b.column("text"))
        z = _logits_q(counts, ntok, w)
        s = 1.0 / (1.0 + np.exp(-z))
        return pa.table({"url": b.column("url"),
                         "score": pa.array(s, type=pa.float64()),
                         "pred_zh": pa.array(s >= 0.5)})

    return _pages_ds(sf_dir).map_batches(score, batch_format="pyarrow",
                                         zero_copy_batch=True)
