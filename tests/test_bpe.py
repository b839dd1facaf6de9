"""Distributed BPE tokenizer training (r3): merge-loop semantics,
distributed == serial word counts, deterministic training, and the
segmentation laws."""

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kgray.pipelines.bpe import (END_OF_WORD, bpe_segment_word,
                                 bpe_train_merges)


def test_merge_loop_hand_case():
    """The canonical BPE example: 'low'-family corpus — first merges
    pick the most frequent adjacent pair, weighted by word count."""
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_merges(wc, n_merges=4)
    # 'es' occurs in newest(6)+widest(3)=9 — the top pair; then 'est',
    # then 'est</w>', then 'lo' (low 5 + lower 2 = 7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END_OF_WORD)
    assert merges[3] == ("l", "o")


def test_tie_break_deterministic():
    wc = {"ab": 3, "cd": 3}
    merges = bpe_train_merges(wc, n_merges=1)
    # counts tie at 3: lexicographically smallest pair wins
    assert merges[0] == ("a", "b")


def test_segment_word_reconstructs():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_merges(wc, n_merges=6)
    for w in list(wc) + ["lowest", "news", "zzz"]:
        seq = bpe_segment_word(w, merges)
        assert "".join(seq) == w + END_OF_WORD
        assert len(seq) <= len(w) + 1
    # trained words compress strictly
    assert len(bpe_segment_word("newest", merges)) < len("newest") + 1


def test_distributed_counts_and_determinism(ray_session, tmp_path):
    """bpe_merges over a documents table == merges trained on a serial
    Counter of the same corpus; repeated runs identical."""
    import ray.data as rd

    from kgray.pipelines.bpe import bpe_merges, bpe_token_counts

    rng = np.random.default_rng(2)
    vocab = ["alpha", "beta", "gamma", "delta", "alphabet", "better"]
    texts = [" ".join(vocab[i] for i in rng.integers(0, 6, 30))
             for _ in range(24)]
    docs = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")

    got = bpe_merges(str(tmp_path), n_merges=12)
    got2 = bpe_merges(str(tmp_path), n_merges=12)
    assert got.equals(got2)                       # bit-identical reruns

    serial_wc = collections.Counter(
        w for t in texts for w in t.split())
    exp = bpe_train_merges(dict(serial_wc), n_merges=12)
    assert list(zip(got.column("left").to_pylist(),
                    got.column("right").to_pylist())) == exp

    # token counts: distributed == serial segmentation
    counts = bpe_token_counts(str(tmp_path), n_merges=12).to_pandas()
    by_doc = dict(zip(counts.doc_id, counts.n_bpe_tokens))
    for d, t in enumerate(texts):
        exp_n = sum(len(bpe_segment_word(w, exp)) for w in t.split())
        assert by_doc[d] == exp_n
    # compression sanity: BPE tokens < raw characters
    assert counts.n_bpe_tokens.sum() < sum(len(t) for t in texts)
