"""Distributed BPE tokenizer training + application (r3).

The classic BPE algorithm (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") runs its merge loop over
the WORD-FREQUENCY table, not the raw corpus — so the scale-heavy step
is the corpus-wide word count, and that is exactly a distributed
aggregate.  The shape here:

1. **word counts** (corpus-sized → vocab-sized): per-batch ``Counter``
   partials inside ``map_batches`` → ``sorted_group_aggregate`` sum —
   the only pass that touches the corpus; at 100 TB this is the same
   mergeable-partial exchange as every other count in this repo,
2. **merge loop** (vocab-sized, driver): deterministic greedy merges
   over the reduced (word, count) table — pair counts are weighted by
   word frequency; tie-break = highest count, then lexicographically
   smallest (left, right).  This is the standard sentencepiece/HF
   trainer structure (their merge loops are also single-node over the
   reduced vocab),
3. **application** (corpus-sized, streaming): merges broadcast via
   ``ray.put`` once; each batch segments its documents with a
   per-distinct-word memo — stateless, zero shuffle.

Determinism: counts are exact integers, the tie-break is total, and
the word-count aggregate is order-independent — training is
bit-identical across parallelism (pinned by test), so the sf0.01
fixture oracle is stable across fresh processes.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from .text import _tokens, read_documents

__all__ = ["bpe_word_counts", "bpe_train_merges", "bpe_merges",
           "bpe_token_counts", "bpe_segment_word", "END_OF_WORD"]

END_OF_WORD = "</w>"


def bpe_word_counts(sf_dir: str):
    """Corpus-wide (word, cnt) — the distributed reduction BPE trains
    over.  One streaming pass, mergeable Counter partials."""
    from ..stages.aggregate import sorted_group_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch.column("text").to_pylist():
            c.update(_tokens(t))
        return pa.table({
            "word": pa.array(list(c.keys()), type=pa.string()),
            "cnt": pa.array(list(c.values()), type=pa.int64())})

    return sorted_group_aggregate(
        read_documents(sf_dir, columns=("text",))
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "word", [("cnt", "sum")], precombine=False)


def bpe_train_merges(word_counts: dict, n_merges: int = 40,
                     min_pair_count: int = 2) -> list:
    """Greedy BPE merge list from a (word -> count) dict (vocab-sized;
    the driver-side step, identical in structure to the HF/sentencepiece
    trainers).  Returns [(left, right)] in merge order.  Deterministic:
    best pair = max count, ties broken by lexicographically smallest
    (left, right)."""
    seqs = {w: tuple(w) + (END_OF_WORD,) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, seq in seqs.items():
            c = word_counts[w]
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        best = min(pair_counts.items(),
                   key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((left, right))
        merged = left + right
        new_seqs = {}
        for w, seq in seqs.items():
            out = []
            i = 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == left
                        and seq[i + 1] == right):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    return merges


def bpe_segment_word(word: str, merges: list, rank: dict | None = None) -> list:
    """Apply a merge list to one word (rank-greedy, the standard BPE
    encoder: always apply the earliest-learned applicable merge).
    Pass a precomputed ``rank`` map when segmenting many words."""
    if rank is None:
        rank = {m: i for i, m in enumerate(merges)}
    seq = list(word) + [END_OF_WORD]
    while len(seq) > 1:
        best_i, best_r = -1, len(merges)
        for i in range(len(seq) - 1):
            r = rank.get((seq[i], seq[i + 1]), len(merges))
            if r < best_r:
                best_i, best_r = i, r
        if best_i < 0 or best_r >= len(merges):
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_merges(sf_dir: str, n_merges: int = 40):
    """The learned merge table: (rank, left, right, merged) — trained
    distributed (word-count exchange) + deterministic driver loop."""
    wc_rows = bpe_word_counts(sf_dir).take_all()
    word_counts = {r["word"]: r["cnt"] for r in wc_rows}
    merges = bpe_train_merges(word_counts, n_merges=n_merges)
    return pa.table({
        "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
        "left": pa.array([m[0] for m in merges], type=pa.string()),
        "right": pa.array([m[1] for m in merges], type=pa.string()),
        "merged": pa.array([m[0] + m[1] for m in merges],
                           type=pa.string()),
    })


def bpe_token_counts(sf_dir: str, n_merges: int = 40):
    """Per-document BPE token counts under the trained merges — the
    token-budget estimate a data pipeline runs before packing.  Merges
    broadcast once (``ray.put``); application is a stateless streaming
    map with a per-distinct-word memo per batch."""
    import ray

    merges_tbl = bpe_merges(sf_dir, n_merges=n_merges)
    merges = list(zip(merges_tbl.column("left").to_pylist(),
                      merges_tbl.column("right").to_pylist()))
    mref = ray.put(merges)

    def fn(batch: pa.Table) -> pa.Table:
        m = ray.get(mref)
        rank = {p: i for i, p in enumerate(m)}
        memo: dict = {}
        out = []
        for t in batch.column("text").to_pylist():
            n = 0
            for w in _tokens(t):
                hit = memo.get(w)
                if hit is None:
                    hit = memo[w] = len(bpe_segment_word(w, m, rank))
                n += hit
            out.append(n)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_bpe_tokens": pa.array(out, type=pa.int64())})

    return read_documents(sf_dir, columns=("doc_id", "text")).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)
