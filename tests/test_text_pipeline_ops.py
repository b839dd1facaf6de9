"""Training-pipeline text operators: split assignment, unigram-LM
scoring, benchmark decontamination, value histograms — brute-force
(serial pandas/Counter) equality over the driver-generated sf0.001
testdata."""

import hashlib
import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"

_WS = re.compile(r"\s+")


def _toks(t):
    t = t.strip()
    return _WS.split(t) if t else []


def _bucket(v, mod=1000):
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % mod


def test_split_assign_deterministic_and_exhaustive(ray_session):
    from kgray.pipelines.text import doc_splits

    df = doc_splits(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    assert sorted(df.doc_id) == sorted(docs.doc_id)      # total partition
    for _, r in df.iterrows():
        b = _bucket(r.doc_id)
        want = "train" if b < 900 else ("val" if b < 950 else "test")
        assert r.split == want
    assert set(df.split) == {"train", "val", "test"}

    # stability: a second run assigns identically (pure function of key)
    df2 = doc_splits(SF).to_pandas()
    m = df.merge(df2, on="doc_id", suffixes=("", "_2"))
    assert (m.split == m.split_2).all()


def test_split_assign_bounds_validation(ray_session):
    import pytest
    import ray.data as rd

    from kgray.functions.sampling import split_assign

    ds = rd.range(4)
    with pytest.raises(ValueError):
        split_assign(ds, "id", bounds=(950, 900))
    with pytest.raises(ValueError):
        split_assign(ds, "id", bounds=(900,), names=("a", "b", "c"))


def test_unigram_logprob_matches_serial(ray_session):
    from kgray.pipelines.text import unigram_logprob

    got = unigram_logprob(SF).to_pandas().set_index("doc_id")

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    cnt = Counter()
    per_doc = {}
    for _, r in docs.iterrows():
        tf = Counter(_toks(r.text))
        if tf:
            per_doc[r.doc_id] = tf
            cnt.update(tf)
    n_total = sum(cnt.values())

    assert sorted(got.index) == sorted(per_doc)
    for doc_id, tf in per_doc.items():
        micro = sum(n * math.floor(math.log(cnt[w] / n_total) * 1e6)
                    for w, n in tf.items())
        n_tok = sum(tf.values())
        row = got.loc[doc_id]
        assert row.n_tokens == n_tok
        assert row.logprob_micronats == micro
        assert row.avg_logprob_micronats == micro / n_tok
    # log-probs are negative: every doc scores below zero
    assert (got.avg_logprob_micronats < 0).all()


def test_decontaminate_matches_serial(ray_session):
    n, perm = 8, 50
    from kgray.pipelines.text import decontaminate

    got = decontaminate(SF, n=n, eval_permille=perm).to_pandas() \
        .set_index("doc_id")

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    grams = {r.doc_id: {" ".join(ts[i:i + n])
                        for ts in [_toks(r.text)]
                        for i in range(len(ts) - n + 1)}
             for _, r in docs.iterrows()}
    ev = set().union(*(g for d, g in grams.items() if _bucket(d) < perm))
    train = {d: g for d, g in grams.items() if _bucket(d) >= perm}

    assert sorted(got.index) == sorted(train)
    for d, g in train.items():
        assert got.loc[d].n_grams == len(g)
        assert got.loc[d].n_overlap == len(g & ev)
    # the check must be non-vacuous on this corpus (planted near-dups)
    assert (got.n_overlap > 0).any()


def test_events_value_histogram_matches_pandas(ray_session):
    from kgray.pipelines.relational import events_value_histogram

    got = events_value_histogram(SF).to_pandas() \
        .sort_values(["event_type", "value_bin"], ignore_index=True)

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    ev["value_bin"] = np.floor(ev.value / 50.0).astype(np.int64)
    ev["value_cents"] = np.floor(ev.value * 100.0 + 0.5).astype(np.int64)
    want = (ev.groupby(["event_type", "value_bin"], as_index=False)
              .agg(n_events=("value", "size"), value_cents=("value_cents", "sum"))
              .sort_values(["event_type", "value_bin"], ignore_index=True))
    want["n_events"] = want.n_events.astype(np.int64)

    pd.testing.assert_frame_equal(
        got[["event_type", "value_bin", "n_events", "value_cents"]], want)
    # bins partition the events exactly
    assert got.n_events.sum() == len(ev)


def test_pii_scrub_redacts_and_counts(ray_session):
    """Injected docs lose their email/IP/phone (one each, typed
    placeholders appear); non-injected docs pass through byte-identical
    with zero counts."""
    from kgray.functions.sampling import _md5_bucket
    from kgray.pipelines.text import pii_scrub

    got = pii_scrub(SF).to_pandas().set_index("doc_id").sort_index()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .set_index("doc_id").sort_index()
    injected = _md5_bucket(docs.index.tolist(), 1000) < 300
    assert injected.any() and not injected.all()

    inj = got[injected]
    assert (inj[["n_email", "n_ip", "n_phone"]] == 1).all().all()
    assert inj.text_clean.str.contains("<EMAIL>").all()
    assert inj.text_clean.str.contains("<IP>").all()
    assert inj.text_clean.str.contains("<PHONE>").all()
    assert not inj.text_clean.str.contains("@example.com").any()

    clean = got[~injected]
    assert (clean[["n_email", "n_ip", "n_phone"]] == 0).all().all()
    assert (clean.text_clean == docs.text[~injected]).all()


def test_nb_lang_predictions_bruteforce(ray_session, tmp_path):
    """Naive Bayes on a hand-checkable corpus: scores equal the serial
    add-1-smoothed computation exactly (micro-nat for micro-nat), and
    the argmax tie-breaks to the lexicographically first class."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgray.pipelines.text import nb_lang_predictions

    docs = [
        (0, "a b a", "en"), (1, "a b", "en"), (2, "x y x", "zh"),
        (3, "x y", "zh"), (4, "a x", "en"), (5, "  ", "zh"),  # empty: dropped
        (6, "b b y", "de"),
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
        "text": pa.array([d[1] for d in docs]),
        "lang": pa.array([d[2] for d in docs])}),
        tmp_path / "documents.parquet")

    got = {r["doc_id"]: (r["pred_lang"], r["score_micronats"])
           for r in nb_lang_predictions(str(tmp_path)).take_all()}

    # serial NB
    kept = [d for d in docs if d[1].strip()]
    langs = sorted({d[2] for d in kept})
    nd = {lg: sum(1 for d in kept if d[2] == lg) for lg in langs}
    cnt, tot = {}, {lg: 0 for lg in langs}
    for _, text, lg in kept:
        for tok in text.split():
            cnt[(tok, lg)] = cnt.get((tok, lg), 0) + 1
            tot[lg] += 1
    vocab = len({t for (t, _) in cnt})
    exp = {}
    for did, text, _ in kept:
        best = None
        for lg in langs:
            s = math.floor(math.log(nd[lg] / len(kept)) * 1e6)
            for tok in text.split():
                s += math.floor(math.log(
                    (cnt.get((tok, lg), 0) + 1) / (tot[lg] + vocab)) * 1e6)
            if best is None or s > best[1]:
                best = (lg, s)
        exp[did] = best
    assert got == exp
    assert 5 not in got                      # empty doc dropped


def test_nb_lang_predictions_parallelism_invariant(ray_session):
    """The distributed fit is exact: bitwise-identical predictions and
    scores regardless of block structure (counts are mergeable int64
    partials; micro-nat quantization happens before every reduction)."""
    import pandas as pd

    from kgray.pipelines.text import nb_lang_predictions

    sf = "/root/testdata/sf0.001"
    a = nb_lang_predictions(sf).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024   # force many tiny blocks
        b = nb_lang_predictions(sf).to_pandas() \
            .sort_values("doc_id", ignore_index=True)
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)


def test_bm25_search_oracle_parity_sf0001(ray_session):
    """BM25 at the OTHER scale (the gate pins sf0.01): score-for-score
    vs the DuckDB oracle, ranks contiguous from 1 per query."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod
    from kgray.pipelines.text import bm25_search

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    exp = con.sql(entrymod.oracle_sql()["bm25_search"]).df() \
        .sort_values(["query_id", "rank"], ignore_index=True)
    got = bm25_search(sf).to_pandas() \
        .sort_values(["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp,
                                  check_dtype=True, check_exact=True)
    for qid, grp in got.groupby("query_id"):
        assert grp["rank"].tolist() == list(range(1, len(grp) + 1))
        assert (grp["score_micro"].diff().dropna() <= 0).all()


def test_mixture_token_budget_ledger(ray_session):
    """Per-source delivered tokens land in [owed, owed + max_doc): the
    prefix rule overshoots by at most one document; oversampled sources
    (weight 3) run ≥ 2 full epochs while weight-1 sources never repeat;
    no (doc, epoch) row duplicates."""
    import duckdb
    import pandas as pd

    from kgray.pipelines.text import (_MIX_WEIGHT_TOTAL, _MIX_WEIGHTS,
                                      mixture_token_budget)

    sf = "/root/testdata/sf0.01"
    got = mixture_token_budget(sf).to_pandas()
    assert not got.duplicated(["doc_id", "epoch"]).any()

    base = duckdb.sql(f"""
        SELECT source, CAST(SUM(len(regexp_split_to_array(trim(text),
               '\\s+'))) AS BIGINT) AS t,
               CAST(MAX(len(regexp_split_to_array(trim(text),
               '\\s+'))) AS BIGINT) AS mx
        FROM read_parquet('{sf}/documents.parquet')
        WHERE len(trim(text)) > 0 GROUP BY 1""").df().set_index("source")
    delivered = got.groupby("source")["n_tokens"].sum()
    for s, row in base.iterrows():
        owed = 40_000 * _MIX_WEIGHTS[s] // _MIX_WEIGHT_TOTAL
        dl = int(delivered.get(s, 0))
        assert owed <= dl < owed + int(row["mx"]), (s, owed, dl)
        max_epoch = int(got[got["source"] == s]["epoch"].max())
        if _MIX_WEIGHTS[s] == 3:
            assert max_epoch >= 2          # ~3400 owed vs ~1300 have
        if _MIX_WEIGHTS[s] == 1:
            assert max_epoch == 0          # under-budget: prefix only


def test_source_ngram_overlap_planted(ray_session, tmp_path):
    """Two sources sharing exactly one distinct trigram count 1;
    within-source duplicates never inflate the distinct count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgray.pipelines.text import source_ngram_overlap

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "source": pa.array(["sa", "sa", "sb", "sc"]),
        "text": pa.array([
            "common three gram plus noise",
            "common three gram again here",     # sa dup of the shared gram
            "common three gram different tail",
            "totally unrelated words only now",
        ])})
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = {(r["source_a"], r["source_b"]): r["n_shared"]
           for r in source_ngram_overlap(str(tmp_path)).to_pandas()
           .to_dict("records")}
    assert got[("sa", "sb")] == 1          # only "common three gram"
    assert ("sa", "sc") not in got and ("sb", "sc") not in got


def test_token_cms_never_underestimates(ray_session, tmp_path):
    """The CMS law: estimates are ≥ exact counts ALWAYS, including
    under forced collisions (width 4 « vocabulary), and the sketch is
    merge-order independent (pure int sums)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgray.pipelines.text import token_cms_counts

    texts = [" ".join(f"w{i % 23}" for i in range(j, j + 40))
             for j in range(0, 400, 7)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts)}), tmp_path / "documents.parquet")
    t = token_cms_counts(str(tmp_path), k=23, depth=3,
                         width=4).to_pandas()
    assert (t["cms_estimate"] >= t["exact_cnt"]).all()
    assert (t["cms_estimate"] > t["exact_cnt"]).any()   # collisions real
    wide = token_cms_counts(str(tmp_path), k=23, depth=4,
                            width=4096).to_pandas()
    assert (wide["cms_estimate"] == wide["exact_cnt"]).all()
