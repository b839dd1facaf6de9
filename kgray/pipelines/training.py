"""Distributed training-side aggregations (SURVEY.md §2.4).

The reference trains in one process over in-memory lists
(``hmm_ner.py:44-55``).  Here the counting passes (A1-A4) run as
per-batch partials inside ``map_batches`` with a driver-side merge —
the counts are associative/commutative, so the split is exact — and the
normalization (A5, with all reference smoothing quirks) stays a small
driver step.  Index assignment uses sorted (canonical) order because
first-occurrence order is not stable under distribution
(``hmm_ner.py:37-39``; SURVEY.md §7.4): predictions are identical up to
exact float ties.

Also here: distributed CRF gold-path feature extraction (A7) and the
distributed token-level evaluation (A9) as confusion-matrix partials.
"""

from __future__ import annotations

import pickle

import pyarrow as pa

from ..constants import START_TAG, STOP_TAG
from ..kernels import crf as crf_kernel
from ..kernels import hmm as hmm_kernel
from ..kernels.evaluate import classification_report

__all__ = ["train_hmm_distributed", "build_crf_features_distributed",
           "evaluate_tagged", "max_seq_len"]


def train_hmm_distributed(sentences_ds) -> hmm_kernel.HMMModel:
    """HMM from a Dataset of (tokens: list<str>, tags: list<str>) rows.

    map_batches emits one pickled :class:`HMMCounts` partial per batch;
    the driver merges (tiny: vocab-sized) and finalizes with canonical
    sorted index order.
    """
    def partial(batch: pa.Table) -> pa.Table:
        c = hmm_kernel.count_sentences(batch.column("tokens").to_pylist(),
                                       batch.column("tags").to_pylist())
        return pa.table({"counts": pa.array([pickle.dumps(c)], type=pa.binary())})

    merged = hmm_kernel.HMMCounts()
    for row in sentences_ds.map_batches(partial, batch_format="pyarrow",
                                        zero_copy_batch=True).take_all():
        merged = hmm_kernel.merge_counts(merged, pickle.loads(row["counts"]))
    return hmm_kernel.finalize_model(merged,
                                     word_order=sorted(merged.word_counts),
                                     tag_order=sorted(merged.tag_counts))


def build_crf_features_distributed(sentences_ds, rules=None):
    """Gold-path feature keys (A7) extracted per batch, deduplicated
    with a distributed groupby, then indexed in sorted order (the
    reference's insertion order is distribution-unstable,
    crf_ner.py:150-155).  Returns (feature_to_idx, tag_to_idx, idx_to_tag).
    """
    from ..stages.aggregate import sorted_group_aggregate

    rules = crf_kernel._rules(rules)

    def keys_partial(batch: pa.Table) -> pa.Table:
        seen = set()
        tags_seen = set()
        for words, tags in zip(batch.column("tokens").to_pylist(),
                               batch.column("tags").to_pylist()):
            tags_seen.update(tags)
            seen.update(crf_kernel._gold_path_keys(words, tags, rules))
        return pa.table({
            "key": pa.array(sorted(seen) + [f"\x00TAG\x00{t}" for t in sorted(tags_seen)],
                            type=pa.string()),
            "one": pa.array([1] * (len(seen) + len(tags_seen)), type=pa.int64()),
        })

    rows = sorted_group_aggregate(
        sentences_ds.map_batches(keys_partial, batch_format="pyarrow",
                                 zero_copy_batch=True),
        "key", [("one", "sum")], precombine=False).take_all()
    keys, tag_set = [], {START_TAG, STOP_TAG}
    for r in rows:
        if r["key"].startswith("\x00TAG\x00"):
            tag_set.add(r["key"][5:])
        else:
            keys.append(r["key"])
    tag_to_idx, idx_to_tag = crf_kernel.build_tag_index(tag_set)
    feature_to_idx = {k: i for i, k in enumerate(sorted(keys))}
    # pure-B enumeration (crf_ner.py:578-587)
    if any(r.kind == "B_pure" for r in rules):
        all_tags = sorted(tag_set - {START_TAG, STOP_TAG}) + [START_TAG, STOP_TAG]
        for prev in all_tags:
            for cur in all_tags:
                if prev == STOP_TAG or cur == START_TAG:
                    continue
                feature_to_idx.setdefault(f"B:{prev}_{cur}", len(feature_to_idx))
    return feature_to_idx, tag_to_idx, idx_to_tag


def evaluate_tagged(tagged_ds, gold_col: str = "gold_tags",
                    pred_col: str = "tags", labels=None) -> dict:
    """Token-level P/R/F1 from a Dataset carrying gold and predicted tag
    lists: per-batch (gold, pred) pair counts → small groupby → the
    sklearn-style report (check.py:38-40 semantics, distributed)."""
    from ..stages.aggregate import sorted_group_aggregate

    def pairs(batch: pa.Table) -> pa.Table:
        from collections import Counter
        c = Counter()
        for g, p in zip(batch.column(gold_col).to_pylist(),
                        batch.column(pred_col).to_pylist()):
            for gt, pt in zip(g, p):
                c[(gt, pt)] += 1
        return pa.table({
            "gold": pa.array([k[0] for k in c], type=pa.string()),
            "pred": pa.array([k[1] for k in c], type=pa.string()),
            "n": pa.array(list(c.values()), type=pa.int64()),
        })

    rows = sorted_group_aggregate(
        tagged_ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["gold", "pred"], [("n", "sum")], precombine=False).take_all()
    y_true, y_pred = [], []
    for r in rows:
        y_true.extend([r["gold"]] * r["n"])
        y_pred.extend([r["pred"]] * r["n"])
    if labels is None:
        labels = sorted({t for t in y_true if t != "O"})
    return classification_report(y_true, y_pred, labels)


def max_seq_len(sentences_ds) -> int:
    """Longest sentence rounded up to the next power of two — the
    reference's transformer prep (transformer_ner.py:361-368), as a
    Dataset aggregate."""
    from ray.data.aggregate import Max

    def lens(batch: pa.Table) -> pa.Table:
        return pa.table({"len": pa.array(
            [len(t) for t in batch.column("tokens").to_pylist()], type=pa.int64())})

    m = sentences_ds.map_batches(lens, batch_format="pyarrow",
                                 zero_copy_batch=True).aggregate(Max("len"))
    longest = m["max(len)"] if isinstance(m, dict) else m
    p = 1
    while p < longest:
        p *= 2
    return p
