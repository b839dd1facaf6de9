"""Distributed training-side aggregations match their serial equivalents."""

import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def conll_ds(ray_session, tiny_corpus_dir):
    import ray.data as rd

    return rd.read_parquet(os.path.join(tiny_corpus_dir, "conll_train.parquet")), \
        pq.read_table(os.path.join(tiny_corpus_dir, "conll_train.parquet"))


def test_hmm_distributed_matches_serial(conll_ds):
    from kgray.kernels import hmm
    from kgray.pipelines.training import train_hmm_distributed

    ds, tbl = conll_ds
    dist = train_hmm_distributed(ds.repartition(5))
    serial = hmm.finalize_model(
        hmm.count_sentences(tbl["tokens"].to_pylist(), tbl["tags"].to_pylist()),
        word_order=sorted(set(w for s in tbl["tokens"].to_pylist() for w in s)),
        tag_order=sorted(set(t for s in tbl["tags"].to_pylist() for t in s)))
    import numpy as np
    np.testing.assert_array_equal(dist.pi, serial.pi)
    np.testing.assert_array_equal(dist.A, serial.A)
    np.testing.assert_array_equal(dist.B, serial.B)
    assert dist.word_to_idx == serial.word_to_idx


def test_crf_features_distributed_matches_serial(conll_ds):
    from kgray.kernels import crf
    from kgray.pipelines.training import build_crf_features_distributed

    ds, tbl = conll_ds
    # limit to a slice for speed
    sw = tbl["tokens"].to_pylist()[:120]
    st = tbl["tags"].to_pylist()[:120]
    import ray.data as rd
    import pyarrow as pa
    small = rd.from_arrow(pa.table({"tokens": sw, "tags": st})).repartition(4)
    f2i_d, t2i_d, _ = build_crf_features_distributed(small)
    f2i_s, t2i_s, _ = crf.build_features(sw, st)
    assert set(f2i_d) == set(f2i_s)          # same feature universe
    assert t2i_d == t2i_s


def test_evaluate_tagged_distributed(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from kgray.pipelines.training import evaluate_tagged
    from kgray.kernels.evaluate import classification_report

    gold = [["O", "B-PER", "I-PER"], ["B-ORG", "O"]]
    pred = [["O", "B-PER", "B-ORG"], ["B-ORG", "B-PER"]]
    ds = rd.from_arrow(pa.table({"gold_tags": gold, "tags": pred}))
    rep = evaluate_tagged(ds, labels=["B-PER", "I-PER", "B-ORG"])
    flat_g = [t for s in gold for t in s]
    flat_p = [t for s in pred for t in s]
    exp = classification_report(flat_g, flat_p, ["B-PER", "I-PER", "B-ORG"])
    assert rep == exp


def test_max_seq_len(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from kgray.pipelines.training import max_seq_len

    ds = rd.from_arrow(pa.table({"tokens": [["a"] * 5, ["b"] * 9, ["c"]]}))
    assert max_seq_len(ds) == 16
