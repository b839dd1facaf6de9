"""Transformer-CRF NumPy inference (reference T5 semantics,
transformer_ner.py:65-274 / :580-626): structural correctness of the
forward pass, Viterbi vs brute force, reference predict-time quirks."""

import itertools

import numpy as np
import pytest

from kgray.kernels import transformer as tfm


def _tiny_model(seed=3, V_words=("alice", "went", "to", "paris", "bank"),
                tags=("B-LOC", "B-PER", "I-PER", "O"), msl=8):
    w2i = {tfm.PAD_TOKEN: 0, tfm.UNK_TOKEN: 1}
    for w in V_words:
        w2i[w] = len(w2i)
    t2i = {tfm.PAD_TAG: 0}
    for t in sorted(tags):
        t2i[t] = len(t2i)
    return tfm.init_random(w2i, t2i, embedding_dim=16, hidden_dim=32,
                           num_layers=2, num_heads=4, max_seq_len=msl,
                           seed=seed)


def test_positional_encoding_formula():
    """pe[pos, 2i] = sin(pos/10000^(2i/d)), pe[pos, 2i+1] = cos(...) —
    transformer_ner.py:281-289."""
    m = _tiny_model()
    d = m.config["embedding_dim"]
    pe = m.pos_encoding(6)
    for pos in (0, 3, 5):
        for i in range(0, d, 2):
            angle = pos / (10000 ** (i / d))
            assert np.isclose(pe[pos, i], np.sin(angle), atol=1e-12)
            assert np.isclose(pe[pos, i + 1], np.cos(angle), atol=1e-12)


def test_emissions_pad_invariance():
    """Key-padding mask correctness: a sentence's emissions at real
    positions must be identical no matter how much padding follows and
    no matter what other sentences share the batch."""
    m = _tiny_model()
    sent = [2, 3, 4]                      # alice went to
    a = np.zeros((1, 4), dtype=np.int64)
    a[0, :3] = sent
    b = np.zeros((2, 8), dtype=np.int64)
    b[0, :3] = sent
    b[1, :5] = [5, 6, 2, 3, 4]            # a different sentence in the batch
    ea = tfm.emissions(m, a, a != 0)
    eb = tfm.emissions(m, b, b != 0)
    np.testing.assert_allclose(ea[0, :3], eb[0, :3], rtol=1e-10, atol=1e-10)


def test_viterbi_vs_bruteforce():
    rng = np.random.default_rng(9)
    T, L = 4, 5
    em = rng.normal(0, 1, (L, T))
    tr = rng.normal(0, 1, (T, T))
    st = rng.normal(0, 1, T)
    en = rng.normal(0, 1, T)
    for n in range(1, L + 1):
        got = tfm.viterbi_tcrf(em, n, tr, st, en)
        best, best_s = None, -np.inf
        for path in itertools.product(range(T), repeat=n):
            s = st[path[0]] + em[0, path[0]]
            for t in range(1, n):
                s += tr[path[t - 1], path[t]] + em[t, path[t]]
            s += en[path[-1]]
            if s > best_s:
                best, best_s = list(path), s
        assert got == best
    assert tfm.viterbi_tcrf(em, 0, tr, st, en) == []


def test_predict_truncation_and_unk():
    """Sentences longer than max_seq_len: positions beyond it are 'O'
    (transformer_ner.py:624-626); unknown words hit UNK, not a crash."""
    m = _tiny_model(msl=4)
    long_sent = ["alice", "went", "to", "paris", "bank", "zzz"]
    tags = tfm.predict_sentences(m, [long_sent])[0]
    assert len(tags) == 6
    assert tags[4] == "O" and tags[5] == "O"          # beyond max_seq_len
    assert all(isinstance(t, str) for t in tags)
    [unk_tags] = tfm.predict_sentences(m, [["neverseen", "words"]])
    assert len(unk_tags) == 2


def test_predict_pad_tag_rewritten_to_O():
    """If Viterbi emits the PAD tag (idx 0) it is written as 'O'
    (transformer_ner.py:620-623) — force it with loaded weights."""
    m = _tiny_model()
    T = m.config["tag_size"]
    m.weights["hidden2tag.weight"][:] = 0.0
    m.weights["hidden2tag.bias"][:] = 0.0
    m.weights["hidden2tag.bias"][0] = 50.0            # PAD tag dominates
    m.weights["transitions"][:] = 0.0
    m.weights["start_transitions"][:] = 0.0
    m.weights["end_transitions"][:] = 0.0
    [tags] = tfm.predict_sentences(m, [["alice", "went"]])
    assert tags == ["O", "O"]


def test_empty_sentence_and_batching_independence():
    m = _tiny_model()
    sents = [["alice", "went", "to", "paris"], [], ["bank"]]
    batched = tfm.predict_sentences(m, sents)
    single = [tfm.predict_sentences(m, [s])[0] for s in sents]
    assert batched == single
    assert batched[1] == []
    assert len(batched[0]) == 4 and len(batched[2]) == 1


def test_save_load_roundtrip(tmp_path):
    m = _tiny_model()
    p = str(tmp_path / "tcrf")
    m.save(p)
    m2 = tfm.TransformerCRFModel.load(p + ".npz")
    sents = [["alice", "went", "to", "paris"], ["bank", "alice"]]
    assert tfm.predict_sentences(m, sents) == tfm.predict_sentences(m2, sents)
    assert m2.config == m.config


def test_build_vocab_reference_semantics():
    """PAD=0/UNK=1 then first-occurrence words; PAD tag 0 then sorted
    tags (transformer_ner.py:344-357)."""
    sents = [["b", "a"], ["a", "c"]]
    tags = [["O", "B-PER"], ["B-PER", None]]
    w2i, t2i = tfm.build_vocab(sents, tags)
    assert list(w2i.items())[:2] == [("<PAD>", 0), ("<UNK>", 1)]
    assert [w for w in w2i][2:] == ["b", "a", "c"]    # first occurrence
    assert t2i == {"<PAD>": 0, "B-PER": 1, "O": 2}
    assert tfm.max_len_pow2([["x"] * 5]) == 8


def test_tagger_actor_e2e(ray_session, tmp_path):
    """TransformerTagger through a real map_batches actor pool."""
    import pyarrow as pa
    import ray.data as rd
    from kgray.stages.tagger import TransformerTagger

    m = _tiny_model()
    p = str(tmp_path / "tcrf_en")
    m.save(p)
    src = pa.table({
        "url": pa.array([f"u{i}" for i in range(6)]),
        "sent_id": pa.array(range(6), type=pa.int32()),
        "tokens": pa.array([["alice", "went", "to", "paris"]] * 3
                           + [["bank"]] * 3, type=pa.list_(pa.string())),
        "lang": pa.array(["en"] * 5 + ["xx"]),
    })
    out = (rd.from_arrow(src).repartition(2)
           .map_batches(TransformerTagger,
                        fn_constructor_kwargs={"model_paths": {"en": p + ".npz"}},
                        batch_format="pyarrow", batch_size=4,
                        concurrency=1, num_cpus=1)
           .to_pandas().sort_values("sent_id", ignore_index=True))
    assert len(out) == 6
    assert all(len(t) == len(tk) for t, tk in zip(out["tags"], out["tokens"]))
    assert list(out.loc[5, "tags"]) == ["O"]          # no model for lang 'xx'
    expect = tfm.predict_sentences(m, [["alice", "went", "to", "paris"]])[0]
    assert list(out.loc[0, "tags"]) == expect
