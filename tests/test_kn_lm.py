"""Kneser-Ney bigram LM: brute-force serial parity on a controlled
corpus plus the defining semantic property — continuation probability
downweights words that occur in only one context, even when frequent
(the 'San Francisco' effect)."""

import math
import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp, texts):
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
        "url": pa.array([f"http://x/{i}" for i in range(len(texts))]),
        "lang": pa.array(["en"] * len(texts)),
    }), f"{tmp}/documents.parquet")
    return tmp


def _brute_kn(texts, D=0.75):
    from kgray.pipelines.text import _tokens

    big = Counter()
    for t in texts:
        toks = _tokens(t)
        big.update(zip(toks, toks[1:]))
    c1, n1p, nc = Counter(), Counter(), Counter()
    for (a, b), c in big.items():
        c1[a] += c
        n1p[a] += 1
        nc[b] += 1
    T = len(big)
    out = {}
    for d, t in enumerate(texts):
        toks = _tokens(t)
        if len(toks) < 2:
            continue
        s, n = 0, 0
        for a, b in zip(toks, toks[1:]):
            p = (max(float(big[(a, b)]) - D, 0.0) / float(c1[a])) \
                + ((D * float(n1p[a])) / float(c1[a])) \
                  * (float(nc[b]) / float(T))
            s += math.floor(math.log(p) * 1e6)
            n += 1
        out[d] = (n, s)
    return out


def test_kn_matches_bruteforce(ray_session, tmp_path):
    from kgray.pipelines.text import bigram_kn_logprob

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "san francisco is on the bay",
        "a cat and a dog and a rat",
        "the cat and the dog sat",
        "x",                      # single token: no bigrams, drops out
        "",                       # empty doc drops out
    ]
    sf = _write_docs(str(tmp_path / "kn"), texts)
    got = {r["doc_id"]: (r["n_bigrams"], r["logprob_micronats"])
           for r in bigram_kn_logprob(sf).take_all()}
    assert got == _brute_kn(texts)


def test_kn_continuation_beats_raw_frequency(ray_session, tmp_path):
    """'francisco' is as frequent as 'road' but ALWAYS follows 'san';
    after an unseen-ish context the interpolated mass must favor the
    many-context word: P_KN(road|the) ranks via nc, and a doc made of
    one-context continuations scores below a doc of versatile words
    with the same raw unigram frequencies."""
    from kgray.pipelines.text import bigram_kn_logprob

    texts = (["san francisco " for _ in range(5)]
             + ["old road ", "new road ", "long road ", "wet road ",
                "dry road "]
             + ["the road here", "the francisco here"])
    sf = _write_docs(str(tmp_path / "kn2"), [t.strip() for t in texts])
    rows = {r["doc_id"]: r["avg_logprob_micronats"]
            for r in bigram_kn_logprob(sf).take_all()}
    # doc 10 = "the road here", doc 11 = "the francisco here"
    assert rows[10] > rows[11]


def test_lang_balanced_sample_equal_classes(ray_session):
    """Every language comes back with exactly min-class-count docs and
    the selection is the md5-smallest rule (stable across runs)."""
    import duckdb

    from kgray.pipelines.text import lang_balanced_sample

    sf = "/root/testdata/sf0.001"
    df = lang_balanced_sample(sf).to_pandas()
    counts = df.groupby("lang").size()
    assert counts.nunique() == 1, counts.to_dict()
    mn = duckdb.sql(
        f"SELECT MIN(n) FROM (SELECT lang, COUNT(*) n FROM "
        f"read_parquet('{sf}/documents.parquet') GROUP BY lang)"
    ).fetchone()[0]
    assert counts.iloc[0] == mn
    df2 = lang_balanced_sample(sf).to_pandas()
    assert df.sort_values(["lang", "doc_id"], ignore_index=True).equals(
        df2.sort_values(["lang", "doc_id"], ignore_index=True))
