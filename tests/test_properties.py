"""Forward-backward consistency, tag-accuracy gates, and
property-based (hypothesis) checks for the kernels."""

import math
import random

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from kgray.kernels import bio, conll, crf, hmm


# --------------------------------------------------------------------------- forward-backward


def _tiny_crf(seed=0):
    rng = random.Random(seed)
    vocab = ["a", "b", "Alice", "Paris"]
    tags = ["O", "B-PER", "B-LOC"]
    sw = [[rng.choice(vocab) for _ in range(rng.randint(1, 4))] for _ in range(10)]
    stg = [[rng.choice(tags) for _ in s] for s in sw]
    f2i, t2i, i2t = crf.build_features(sw, stg)
    m = crf.CRFModel(weights=np.random.default_rng(seed).normal(0, 0.5, len(f2i)),
                     feature_to_idx=f2i, tag_to_idx=t2i, idx_to_tag=i2t)
    return m


def test_forward_backward_consistency():
    """Unary marginals sum to 1 at every position; pairwise marginals
    are consistent with unaries (row/col sums) — the forward-backward
    check the north star names."""
    m = _tiny_crf(3)
    for words in (["a"], ["a", "b"], ["Alice", "b", "Paris", "a"]):
        logZ, unary, pair, stop_m = crf._marginals(words, m)
        L = len(words)
        for i in range(L):
            assert abs(unary[i].sum() - 1.0) < 1e-9
        assert abs(stop_m.sum() - 1.0) < 1e-9
        for i in range(1, L):
            # row-sum of pairwise == unary at i-1; col-sum == unary at i
            np.testing.assert_allclose(pair[i - 1].sum(axis=1), unary[i - 1], atol=1e-9)
            np.testing.assert_allclose(pair[i - 1].sum(axis=0), unary[i], atol=1e-9)
        # logZ equals the forward value
        assert abs(logZ - crf.log_forward(words, m)) < 1e-9


# --------------------------------------------------------------------------- tag accuracy (north star)


def test_tag_accuracy_on_conll_splits(tiny_corpus_dir):
    """Both taggers reach high token accuracy on the held-out
    CoNLL-style validation split."""
    import os
    import pyarrow.parquet as pq

    train = pq.read_table(os.path.join(tiny_corpus_dir, "conll_train.parquet"))
    valid = pq.read_table(os.path.join(tiny_corpus_dir, "conll_valid.parquet"))
    tw, tt = train["tokens"].to_pylist(), train["tags"].to_pylist()
    vw, vt = valid["tokens"].to_pylist(), valid["tags"].to_pylist()

    hm = hmm.train_hmm(tw, tt)
    preds = hmm.viterbi_batch(vw, hm)
    acc = sum(p == g for ps, gs in zip(preds, vt) for p, g in zip(ps, gs)) / \
        sum(len(g) for g in vt)
    assert acc >= 0.9, f"HMM token accuracy {acc}"

    cm = crf.train_crf_sgd(tw[:400], tt[:400], epochs=2, lr=0.05)
    cpreds = crf.viterbi_batch(vw[:100], cm)
    cacc = sum(p == g for ps, gs in zip(cpreds, vt[:100]) for p, g in zip(ps, gs)) / \
        sum(len(g) for g in vt[:100])
    assert cacc >= 0.9, f"CRF token accuracy {cacc}"


# --------------------------------------------------------------------------- hypothesis properties


@settings(max_examples=50, deadline=None)
@given(st.lists(st.sampled_from(["O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC"]),
                max_size=12))
def test_bio_spans_partition_non_O(tags):
    """Decoded spans cover exactly the non-O positions, without overlap."""
    spans = bio.decode_bio(tags)
    covered = []
    for b, e, t in spans:
        assert 0 <= b < e <= len(tags)
        assert t in ("PER", "ORG", "LOC")
        covered.extend(range(b, e))
    assert sorted(covered) == [i for i, t in enumerate(tags) if t != "O"]
    assert len(covered) == len(set(covered))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["tok", "Alice", "x1", "Ümlaut", "."]),
                         min_size=1, max_size=6), min_size=1, max_size=8))
def test_conll_roundtrip_property(sentences):
    tags = [["O"] * len(s) for s in sentences]
    text = conll.format_tagged(sentences, tags)
    back_w, back_t = conll.parse_labeled_text(text)
    assert back_w == sentences
    assert back_t == tags


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_hmm_batch_equals_single(seed):
    """Batched (length-bucketed, vectorized) Viterbi == per-sentence
    decode on random sentences incl. OOV words."""
    rng = random.Random(seed)
    vocab = ["a", "b", "c", "Alice"]
    tags = ["O", "B-PER", "I-PER"]
    sw = [[rng.choice(vocab) for _ in range(rng.randint(1, 5))] for _ in range(15)]
    stg = [[rng.choice(tags) for _ in s] for s in sw]
    m = hmm.train_hmm(sw, stg)
    test_sents = [[rng.choice(vocab + ["OOV"]) for _ in range(rng.randint(0, 6))]
                  for _ in range(10)]
    batch = hmm.viterbi_batch(test_sents, m)
    single = [hmm.viterbi_decode(s, m) for s in test_sents]
    assert batch == single
