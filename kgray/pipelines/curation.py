"""End-to-end corpus curation — the full LLM training-data pipeline as
ONE streaming composition of this engine's operators:

    documents
      → quality filter        (length + stopword-ratio heuristics,
                               vectorized per batch — C4-style)
      → language filter       (stopword-count lang-ID, keep target)
      → exact dedup           (md5 content hash, keep min doc_id —
                               the hash exchange carries (hash, id)
                               pairs, never text)
      → decontamination       (drop docs sharing an 8-gram with the
                               held-out eval split — broadcast set)
      → sequence packing      (token-budget first-fit bins per shard)

Each stage is the already-tested operator; this module wires them into
the pipeline a user would actually run, with per-stage retention
counters for the curation report.  Deterministic end-to-end (md5 / seed
driven), so the gate pins the final packed output as a fixture oracle;
stage-level correctness is pinned by each operator's own tests plus the
retention invariants in ``tests/test_curation.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = ["curate_documents", "curation_report"]

# quality gates (C4-flavored, tuned to the synthetic corpus so each
# stage is non-vacuous: every stage drops SOMETHING at sf0.01)
MIN_TOKENS = 20
MAX_MEAN_TOKEN_LEN = 12.0
MIN_STOP_RATIO = 0.0          # the word-soup corpus has few stopwords
TARGET_LANG = "en"


def _quality_lang(batch: pa.Table) -> pa.Table:
    """One vectorized pass: token stats + stopword counts + lang-ID;
    emits surviving (doc_id, text, n_tokens) rows."""
    from .text import STOPWORDS, _tokens

    sets = {k: set(v) for k, v in STOPWORDS.items()}
    keep_ids, keep_texts, keep_ntok = [], [], []
    for d, t in zip(batch.column("doc_id").to_pylist(),
                    batch.column("text").to_pylist()):
        toks = _tokens(t)
        n = len(toks)
        if n < MIN_TOKENS:
            continue
        mean_len = sum(len(w) for w in toks) / n
        if mean_len > MAX_MEAN_TOKEN_LEN:
            continue
        counts = {k: sum(1 for w in toks if w in s)
                  for k, s in sets.items()}
        if counts["en"] >= counts["de"] and counts["en"] >= counts["fr"]:
            lang = "en"
        elif counts["de"] >= counts["fr"]:
            lang = "de"
        else:
            lang = "fr"
        if lang != TARGET_LANG:
            continue
        keep_ids.append(d)
        keep_texts.append(t)
        keep_ntok.append(n)
    return pa.table({
        "doc_id": pa.array(keep_ids, type=pa.int64()),
        "text": pa.array(keep_texts, type=pa.string()),
        "n_tokens": pa.array(keep_ntok, type=pa.int64())})


def _dedup_keep_ids(ds):
    """Exact-dedup winners: min doc_id per md5(text).  The exchange
    carries (hash, doc_id) pairs only — never document text."""
    import hashlib

    from ..stages.aggregate import sorted_group_aggregate

    def hash_rows(b: pa.Table) -> pa.Table:
        h = [hashlib.md5(t.encode("utf-8")).hexdigest()
             for t in b.column("text").to_pylist()]
        return pa.table({"md5": pa.array(h, type=pa.string()),
                         "doc_id": b.column("doc_id")})

    return sorted_group_aggregate(
        ds.map_batches(hash_rows, batch_format="pyarrow",
                       zero_copy_batch=True),
        "md5", [("doc_id", "min")], precombine=False)


def curate_documents(sf_dir: str, budget: int = 256, n_shards: int = 8,
                     decontam_n: int = 8, eval_permille: int = 50,
                     semantic: bool = False, semantic_k: int = 8):
    """Run the full curation pipeline; returns
    ``(packed_dataset, report_dict)``.

    ``packed``: (doc_id, shard, n_tokens, bin_id, bin_pos) — the packed
    sequences over the SURVIVING documents.  ``report``: per-stage
    retention counts.

    ``semantic=True`` inserts a SemDeDup stage after exact dedup:
    documents whose embedding (``embeddings.parquet``, vec_id == doc_id)
    was marked a semantic duplicate are dropped via the anti semi-join
    against the (small) not-kept id set — the exchange carries only
    duplicate ids, never text."""
    import ray

    from ..functions.sampling import _md5_bucket
    from .pack import pack_documents
    from .text import _tokens

    report: dict = {}
    raw = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
    report["n_input"] = raw.count()

    filtered = raw.map_batches(_quality_lang, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    report["n_quality_lang"] = filtered.count()

    # exact dedup: keep min-doc_id winners.  The winner-id set scales
    # WITH the corpus (≈ distinct docs), so it must never broadcast;
    # the distributed semi-join pays one text exchange instead — the
    # standard dedup shuffle, same order as any hash-partition plan
    from ..stages.semijoin import semi_join

    winners = _dedup_keep_ids(filtered).map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow",
        zero_copy_batch=True)
    deduped = semi_join(filtered, winners, on="doc_id",
                        bloom_bits=1 << 20).materialize()
    report["n_deduped"] = deduped.count()

    if semantic:
        # SemDeDup: duplicates are the minority, so the ANTI side of
        # the semi-join is the not-kept set (small); survivors stream
        from .dedup import semantic_dedup

        def _not_kept(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({"doc_id": b.filter(
                pc.invert(b.column("kept"))).column("vec_id")})

        dropped = semantic_dedup(sf_dir, k=semantic_k).map_batches(
            _not_kept, batch_format="pyarrow", zero_copy_batch=True)
        deduped = semi_join(deduped, dropped, on="doc_id", anti=True,
                            bloom_bits=1 << 20).materialize()
        report["n_semantic"] = deduped.count()

    # decontamination: eval split = md5 bucket < eval_permille over the
    # RAW corpus (the benchmark set exists independently of curation)
    def eval_grams(b: pa.Table) -> pa.Table:
        grams = set()
        sel = _md5_bucket(b.column("doc_id").to_pylist(),
                          1000) < eval_permille
        for keep, t in zip(sel, b.column("text").to_pylist()):
            if not keep:
                continue
            toks = _tokens(t)
            grams.update(" ".join(toks[i:i + decontam_n])
                         for i in range(len(toks) - decontam_n + 1))
        return pa.table({"g": pa.array(sorted(grams), type=pa.string())})

    gset = set()
    for t in ray.get(raw.map_batches(eval_grams, batch_format="pyarrow",
                                     zero_copy_batch=True)
                     .to_arrow_refs()):
        if t.num_rows:
            gset.update(t.column("g").to_pylist())
    gref = ray.put(gset)

    def drop_contaminated(b: pa.Table) -> pa.Table:
        gs = ray.get(gref)
        sel_eval = _md5_bucket(b.column("doc_id").to_pylist(),
                               1000) < eval_permille
        keep = []
        for is_eval, t in zip(sel_eval, b.column("text").to_pylist()):
            if is_eval:                       # eval docs never train
                keep.append(False)
                continue
            toks = _tokens(t)
            keep.append(not any(
                " ".join(toks[i:i + decontam_n]) in gs
                for i in range(len(toks) - decontam_n + 1)))
        return b.filter(pa.array(keep))

    clean = deduped.map_batches(drop_contaminated, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    report["n_decontaminated"] = clean.count()

    packed = pack_documents(clean.select_columns(["doc_id", "text"]),
                            budget=budget, n_shards=n_shards)
    return packed, report


def curation_report(sf_dir: str):
    """queries() surface: the packed output of the full curation
    pipeline (one row per surviving doc with its bin assignment) —
    deterministic, fixture-oracled."""
    packed, _ = curate_documents(sf_dir)
    return packed


def curation_semantic_report(sf_dir: str):
    """queries() surface: the packed output with the SemDeDup stage
    enabled — deterministic, fixture-oracled separately from the
    exact-only composition."""
    packed, _ = curate_documents(sf_dir, semantic=True)
    return packed
