"""Edit-distance ≤ 2 fuzzy join (r3): banded-DP verifier, SymSpell
depth-2 completeness, and the candidate-cap knob."""

import itertools
import random

import numpy as np
import pytest

from kgray.pipelines.text import _deletions_upto, _lev_le_k


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev = dp[0]
        dp[0] = i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[-1]


def test_lev_le_k_matches_full_dp():
    rng = random.Random(4)
    alpha = "abc"
    words = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 6)))
             for _ in range(60)]
    for a, b in itertools.product(words, repeat=2):
        for k in (1, 2, 3):
            assert _lev_le_k(a, b, k) == (_lev(a, b) <= k), (a, b, k)


def test_symspell_depth2_candidate_completeness():
    """EVERY pair at distance ≤ 2 shares a depth-2 deletion variant —
    the theorem the distributed self-join plan relies on."""
    rng = random.Random(9)
    alpha = "abcd"
    words = {"".join(rng.choice(alpha) for _ in range(rng.randint(3, 8)))
             for _ in range(120)}
    words = sorted(words)
    dels = {w: _deletions_upto(w, 2) for w in words}
    for a, b in itertools.combinations(words, 2):
        if _lev(a, b) <= 2:
            assert dels[a] & dels[b], (a, b, _lev(a, b))


def test_fuzzy_d2_pairs_equal_bruteforce(ray_session, tmp_path):
    """End-to-end on a synthetic documents table: engine pair set ==
    quadratic brute-force DP (includes the planted 's'/'ed' twins)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgray.pipelines.text import token_fuzzy_pairs_d2

    vocab = ["table", "tables", "tabled", "cable", "fable", "stable",
             "market", "marked", "masked", "parser", "parsed", "sparse",
             "window", "widow", "willow", "yellow", "zzzzzz"]
    docs = pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "text": pa.array([" ".join(vocab[i::6]) for i in range(6)]),
        "lang": pa.array(["en"] * 6),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = token_fuzzy_pairs_d2(str(tmp_path)).to_pandas()
    got_pairs = set(zip(got.tok_a, got.tok_b))

    # brute force over the SAME augmented token set
    from kgray.functions.sampling import _md5_bucket
    toks = sorted({w for w in vocab})
    buckets = dict(zip(toks, _md5_bucket(toks, 1000)))
    aug = set(toks)
    aug |= {t + "s" for t in toks if buckets[t] < 250}
    aug |= {t + "ed" for t in toks if buckets[t] < 250}
    exp = {(a, b) for a, b in itertools.combinations(sorted(aug), 2)
           if _lev(a, b) <= 2}
    assert got_pairs == exp
    assert any(_lev(a, b) == 2 for a, b in got_pairs)   # non-vacuous at d=2


def test_fuzzy_d2_cap_knob_drops_hot_buckets(ray_session, tmp_path):
    """max_bucket prunes variants shared by too many tokens; the result
    stays a SUBSET of the exact pair set (documented trade)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgray.pipelines.text import token_fuzzy_pairs_d2

    vocab = [f"aa{c}{d}" for c in "bcdefg" for d in "hijk"]  # dense family
    docs = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array([" ".join(vocab)]),
        "lang": pa.array(["en"]),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    exact = token_fuzzy_pairs_d2(str(tmp_path)).to_pandas()
    capped = token_fuzzy_pairs_d2(str(tmp_path), max_bucket=4).to_pandas()
    exact_pairs = set(zip(exact.tok_a, exact.tok_b))
    capped_pairs = set(zip(capped.tok_a, capped.tok_b))
    assert capped_pairs <= exact_pairs
    assert len(capped_pairs) < len(exact_pairs)   # the knob actually bit


def test_chunk_documents_reassembles_and_overlaps(ray_session, tmp_path):
    """Chunk windows cover every token; consecutive chunks overlap by
    chunk-stride tokens; empty docs vanish."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgray.pipelines.text import chunk_documents

    texts = [" ".join(f"t{i}" for i in range(n)) for n in (0, 1, 48, 64,
                                                           65, 150)]
    docs = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    df = (chunk_documents(str(tmp_path), chunk_tokens=64, stride=48)
          .to_pandas().sort_values(["doc_id", "chunk_id"],
                                   ignore_index=True))
    assert 0 not in set(df.doc_id)                    # empty doc: no chunks
    for d, n in [(1, 1), (2, 48), (3, 64), (4, 65), (5, 150)]:
        sub = df[df.doc_id == d]
        toks = texts[d].split()
        # full coverage: union of [begin, end) == [0, n)
        covered = set()
        for r in sub.itertuples():
            assert r.chunk_text == " ".join(toks[r.begin_tok:r.end_tok])
            assert r.n_tokens == r.end_tok - r.begin_tok <= 64
            covered.update(range(r.begin_tok, r.end_tok))
        assert covered == set(range(n))
        # stride law
        assert list(sub.begin_tok) == list(range(0, n, 48))
