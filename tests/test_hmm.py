"""HMM kernel tests: brute-force correctness + subprocess parity with the
actual reference script (/root/reference/hmm_ner.py is stdlib-only, so we
can run it directly as the oracle)."""

import itertools
import math
import pickle
import random
import subprocess
import sys

import numpy as np
import pytest

from kgray.kernels import conll, hmm

REF = "/root/reference/hmm_ner.py"


def _random_sentences(seed, n_sent=40, vocab=("the", "dog", "Alice", "ran", "Acme", "fast", "Paris")):
    rng = random.Random(seed)
    tags = ["O", "B-PER", "I-PER", "B-ORG", "B-LOC"]
    sents_w, sents_t = [], []
    for _ in range(n_sent):
        L = rng.randint(1, 8)
        sents_w.append([rng.choice(vocab) for _ in range(L)])
        sents_t.append([rng.choice(tags) for _ in range(L)])
    return sents_w, sents_t


def _brute_force_decode(words, model: hmm.HMMModel):
    """Enumerate all tag paths; replicate reference scoring incl. unknown
    words; first-max tie break by path lexicographic order == index order."""
    T = len(model.idx_to_tag)
    best_score, best_path = -math.inf, None
    E = hmm._emission_matrix(words, model)
    for path in itertools.product(range(T), repeat=len(words)):
        s = model.pi[path[0]] + E[0][path[0]]
        for t in range(1, len(words)):
            s += model.A[path[t - 1], path[t]] + E[t][path[t]]
        if s > best_score:
            best_score, best_path = s, path
    return [model.idx_to_tag[i] for i in best_path]


def test_viterbi_matches_brute_force():
    sents_w, sents_t = _random_sentences(1)
    model = hmm.train_hmm(sents_w, sents_t)
    rng = random.Random(2)
    for _ in range(25):
        L = rng.randint(1, 5)
        words = [rng.choice(["the", "dog", "Alice", "UNSEEN", "Paris"]) for _ in range(L)]
        assert hmm.viterbi_decode(words, model) == _brute_force_decode(words, model)


def test_partial_counts_merge_equals_serial():
    sents_w, sents_t = _random_sentences(3, n_sent=60)
    serial = hmm.count_sentences(sents_w, sents_t)
    c1 = hmm.count_sentences(sents_w[:20], sents_t[:20])
    c2 = hmm.count_sentences(sents_w[20:45], sents_t[20:45])
    c3 = hmm.count_sentences(sents_w[45:], sents_t[45:])
    merged = hmm.merge_counts(hmm.merge_counts(c1, c2), c3)
    assert merged.word_counts == serial.word_counts
    assert merged.tag_counts == serial.tag_counts
    assert merged.initial_tag_counts == serial.initial_tag_counts
    assert merged.num_sentences == serial.num_sentences
    for t in serial.transition_counts:
        assert merged.transition_counts[t] == serial.transition_counts[t]
    # finalize with the canonical (sorted) order: same predictions
    m_sorted = hmm.finalize_model(merged, word_order=sorted(serial.word_counts),
                                  tag_order=sorted(serial.tag_counts))
    m_serial = hmm.finalize_model(serial)
    words = ["Alice", "ran", "UNSEEN", "Paris"]
    assert hmm.viterbi_decode(words, m_sorted) == hmm.viterbi_decode(words, m_serial)


def test_reference_script_parity(tmp_path):
    """Train + predict via the actual reference CLI and via our kernel on
    the same CoNLL files; predicted tags must match token-for-token."""
    sents_w, sents_t = _random_sentences(5, n_sent=80)
    train_path = tmp_path / "train.txt"
    conll.write_tagged(str(train_path), sents_w, sents_t)

    rng = random.Random(6)
    test_sents = []
    for _ in range(30):
        L = rng.randint(1, 9)
        test_sents.append([rng.choice(["the", "dog", "Alice", "ran", "Acme",
                                       "fast", "Paris", "NOVEL", "Zurich"]) for _ in range(L)])
    test_path = tmp_path / "test.txt"
    conll.write_tagged(str(test_path), test_sents, [["O"] * len(s) for s in test_sents])

    model_path = tmp_path / "ref.pkl"
    out_path = tmp_path / "ref_out.txt"
    subprocess.run([sys.executable, REF, "train", "--input", str(train_path),
                    "--model", str(model_path)], check=True, capture_output=True)
    subprocess.run([sys.executable, REF, "predict", "--model", str(model_path),
                    "--input", str(test_path), "--output", str(out_path)],
                   check=True, capture_output=True)
    ref_sents, ref_tags = conll.parse_labeled_text(out_path.read_text(encoding="utf-8"))

    ours = hmm.train_hmm(*conll.read_labeled(str(train_path)))
    our_tags = hmm.viterbi_batch(test_sents, ours)

    assert ref_sents == test_sents
    assert our_tags == ref_tags

    # model parameters also match bit-for-bit (same index order: insertion)
    with open(model_path, "rb") as f:
        ref_model = pickle.load(f)
    np.testing.assert_array_equal(np.array(ref_model["pi"]), ours.pi)
    np.testing.assert_array_equal(np.array(ref_model["A"]), ours.A)
    np.testing.assert_array_equal(np.array(ref_model["B"]), ours.B)
    assert ref_model["word_to_idx"] == ours.word_to_idx
    assert ref_model["tag_to_idx"] == ours.tag_to_idx


def test_smoothing_quirks():
    """Lock in the reference's quirks: pi=0.0 for never-initial tags,
    A rows all-0.0 for tags never seen as predecessor (hmm_ner.py:76-86)."""
    sents_w = [["a", "b"], ["a", "c"]]
    sents_t = [["X", "Y"], ["X", "Y"]]           # Y never initial, never a predecessor
    m = hmm.train_hmm(sents_w, sents_t)
    iY = m.tag_to_idx["Y"]
    iX = m.tag_to_idx["X"]
    assert m.pi[iY] == 0.0                        # quirk: log-prob "1"
    assert np.all(m.A[iY] == 0.0)                 # unseen prev row stays 0.0
    assert m.A[iX, iY] < 0.0


def test_model_save_load_roundtrip(tmp_path):
    sents_w, sents_t = _random_sentences(9)
    m = hmm.train_hmm(sents_w, sents_t)
    p = str(tmp_path / "hmm_model")
    m.save(p)
    m2 = hmm.HMMModel.load(p)
    words = ["Alice", "UNSEEN", "Paris"]
    assert hmm.viterbi_decode(words, m) == hmm.viterbi_decode(words, m2)
