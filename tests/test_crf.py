"""CRF kernel tests: Viterbi and forward algorithm vs brute-force path
enumeration, analytic gradient vs numeric gradient, template parsing,
training sanity."""

import itertools
import math
import random

import numpy as np
import pytest

from kgray.constants import START_TAG, STOP_TAG
from kgray.kernels import crf


def _tiny_model(seed=0, n_sent=12):
    rng = random.Random(seed)
    vocab = ["the", "cat", "Alice", "Paris", "sat"]
    tags = ["O", "B-PER", "B-LOC"]
    sw, st = [], []
    for _ in range(n_sent):
        L = rng.randint(1, 4)
        sw.append([rng.choice(vocab) for _ in range(L)])
        st.append([rng.choice(tags) for _ in range(L)])
    f2i, t2i, i2t = crf.build_features(sw, st)
    rng2 = np.random.default_rng(seed)
    model = crf.CRFModel(weights=rng2.normal(0, 0.5, len(f2i)),
                         feature_to_idx=f2i, tag_to_idx=t2i, idx_to_tag=i2t)
    return model, sw, st


def test_template_parsing():
    r = crf.parse_template_rule("U06:%x[-1,0]/%x[0,0]")
    assert r.kind == "U" and r.offsets == (-1, 0) and r.prefix == "U06"
    r = crf.parse_template_rule("B")
    assert r.kind == "B_pure"
    r = crf.parse_template_rule("B05:%x[-2,0]/%x[-1,0]")
    assert r.kind == "B_obs" and r.offsets == (-2, -1)
    assert crf.parse_template_rule("X00:%x[0,0]") is None
    assert crf.parse_template_rule("U00:%y[0,0]") is None
    # file parsing mirrors the on-disk template (template_for_crf.utf8)
    rules = crf.parse_template_file("# comment\nU00:%x[-2,0]\n\nB\n")
    assert [r.kind for r in rules] == ["U", "B_pure"]


def test_feature_keys_match_reference_format():
    sw = [["the", "Bank"]]
    st = [["O", "B-ORG"]]
    f2i, _, _ = crf.build_features(sw, st)
    # key formats per crf_ner.py:133-147
    assert "U06:the/Bank_B-ORG" in f2i
    assert "U02:the_O" in f2i
    assert f"B02:the_{START_TAG}_O" in f2i
    assert "B:O_B-ORG" in f2i
    assert f"B:{START_TAG}_O" in f2i
    assert f"B:B-ORG_{STOP_TAG}" in f2i
    # BOS/EOS virtual tokens (crf_ner.py:120-128)
    assert "U00:BOS_O" in f2i
    assert f"U03:EOS_B-ORG" in f2i
    # invalid transitions excluded (crf_ner.py:583)
    assert all(not k.startswith(f"B:{STOP_TAG}_") for k in f2i)
    assert all(not k.endswith(f"_{START_TAG}") or not k.startswith("B:") for k in f2i)


def _brute_paths(words, model):
    """All (path, score) via the key-level scorer — independent of the
    compiled-potentials code path."""
    tags = model.actual_tags
    out = []
    for path in itertools.product(tags, repeat=len(words)):
        out.append((list(path), crf.sentence_score(words, list(path), model)))
    return out


def test_viterbi_vs_brute_force():
    model, sw, _ = _tiny_model(1)
    rng = random.Random(2)
    for _ in range(15):
        L = rng.randint(1, 4)
        words = [rng.choice(["the", "cat", "Alice", "UNSEEN"]) for _ in range(L)]
        paths = _brute_paths(words, model)
        best_path, best_score = max(paths, key=lambda ps: ps[1])
        got_path, got_score = crf.viterbi_decode(words, model)
        assert abs(got_score - best_score) < 1e-9
        # scores of the returned path must equal the claimed score
        assert abs(crf.sentence_score(words, got_path, model) - got_score) < 1e-9


def test_forward_vs_brute_force():
    model, _, _ = _tiny_model(3)
    rng = random.Random(4)
    for _ in range(10):
        L = rng.randint(1, 4)
        words = [rng.choice(["the", "cat", "Paris", "UNSEEN"]) for _ in range(L)]
        scores = [s for _, s in _brute_paths(words, model)]
        m = max(scores)
        brute_logZ = m + math.log(sum(math.exp(s - m) for s in scores))
        assert abs(crf.log_forward(words, model) - brute_logZ) < 1e-9


def test_forward_ge_viterbi():
    model, _, _ = _tiny_model(5)
    words = ["the", "cat", "sat"]
    _, v = crf.viterbi_decode(words, model)
    assert crf.log_forward(words, model) >= v - 1e-12


def test_gradient_numeric_check():
    model, sw, st = _tiny_model(6, n_sent=6)
    words, tags = sw[0], st[0]
    loss, grad = crf.nll_and_grad(words, tags, model)
    rng = np.random.default_rng(0)
    for idx in rng.choice(len(model.weights), size=12, replace=False):
        eps = 1e-6
        w0 = model.weights[idx]
        model.weights[idx] = w0 + eps
        model._compiled = None
        lp = crf.nll_and_grad(words, tags, model)[0]
        model.weights[idx] = w0 - eps
        model._compiled = None
        lm = crf.nll_and_grad(words, tags, model)[0]
        model.weights[idx] = w0
        model._compiled = None
        num = (lp - lm) / (2 * eps)
        assert abs(num - grad[idx]) < 1e-4, f"idx {idx}: numeric {num} vs analytic {grad[idx]}"


def test_training_fits_small_data():
    """SGD training drives NLL down and recovers the training tags."""
    sw = [["Alice", "works", "for", "Acme"],
          ["Bob", "lives", "in", "Paris"],
          ["the", "cat", "sat"]] * 3
    st = [["B-PER", "O", "O", "B-ORG"],
          ["B-PER", "O", "O", "B-LOC"],
          ["O", "O", "O"]] * 3
    model = crf.train_crf_sgd(sw, st, epochs=12, lr=0.1)
    for words, tags in zip(sw[:3], st[:3]):
        pred, _ = crf.viterbi_decode(words, model)
        assert pred == tags


def test_empty_sentence():
    model, _, _ = _tiny_model(8)
    path, score = crf.viterbi_decode([], model)
    assert path == []
    assert np.isfinite(score) or score == 0.0
    assert abs(crf.log_forward([], model) - score) < 1e-12


def test_model_save_load_roundtrip(tmp_path):
    model, _, _ = _tiny_model(9)
    p = str(tmp_path / "crf_model")
    model.save(p)
    m2 = crf.CRFModel.load(p)
    words = ["the", "Alice", "UNSEEN"]
    assert crf.viterbi_decode(words, model)[0] == crf.viterbi_decode(words, m2)[0]
    assert abs(crf.log_forward(words, model) - crf.log_forward(words, m2)) < 1e-9


def test_window_cache_identical_decode():
    """The per-batch window-score memo must not change any prediction."""
    model, sw, _ = _tiny_model(11, n_sent=20)
    rng = random.Random(12)
    sentences = []
    for _ in range(60):
        L = rng.randint(1, 6)
        sentences.append([rng.choice(["the", "cat", "Alice", "Paris", "sat", "NEW"])
                          for _ in range(L)])
    cache = {}
    with_cache = [crf.viterbi_decode(s, model, cache) for s in sentences]
    without = [crf.viterbi_decode(s, model) for s in sentences]
    assert with_cache == without
    assert len(cache) > 0
    # batch API uses the cache internally
    assert crf.viterbi_batch(sentences, model) == [p for p, _ in without]


def test_window_cache_wide_offset_rules():
    """A model with |offset| > 2 template rules (the advertised extension
    surface) must not take false memo hits between positions that share
    a 5-token window but differ at ±3 — the memo window is derived from
    max rule offset (kgray/kernels/crf.py compiled()['win'])."""
    rules = crf.parse_template_file(
        "U00:%x[0,0]\nU01:%x[-3,0]\nU02:%x[3,0]\nB00:%x[0,0]\nB\n")
    rng = random.Random(21)
    vocab = ["a", "b", "c", "d", "e", "x", "y"]
    tags = ["O", "B-PER"]
    sw = [[rng.choice(vocab) for _ in range(rng.randint(1, 9))] for _ in range(15)]
    st = [[rng.choice(tags) for _ in range(len(s))] for s in sw]
    f2i, t2i, i2t = crf.build_features(sw, st, rules=rules)
    model = crf.CRFModel(weights=np.random.default_rng(7).normal(0, 1.0, len(f2i)),
                         feature_to_idx=f2i, tag_to_idx=t2i, idx_to_tag=i2t,
                         rules=rules)
    assert model.compiled()["win"] == 3
    # positions 2 and 8 share the ±2 window (a b c d e) but differ at -3
    probe = ["a", "b", "c", "d", "e", "x", "a", "b", "c", "d", "e", "y"]
    sentences = [probe] + sw
    cache = {}
    with_cache = [crf.viterbi_decode(s, model, cache) for s in sentences]
    without = [crf.viterbi_decode(s, model) for s in sentences]
    assert with_cache == without
