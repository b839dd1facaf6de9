"""End-to-end corpus curation: stage retention invariants + final
packing invariants on the shared sf0.001 testdata, plus planted cases
for each filter on synthetic documents."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_curation_stage_invariants(ray_session):
    from kgray.pipelines.curation import curate_documents

    packed, rep = curate_documents("/root/testdata/sf0.001")
    # monotone retention: every stage only drops
    assert (rep["n_input"] >= rep["n_quality_lang"]
            >= rep["n_deduped"] >= rep["n_decontaminated"] > 0)
    df = packed.to_pandas()
    assert len(df) == rep["n_decontaminated"]
    # packing invariants: per (shard, bin) budget respected for
    # non-oversize docs; bin_pos contiguous from 0
    for (_, _), g in df.groupby(["shard", "bin_id"]):
        g = g.sort_values("bin_pos")
        assert list(g.bin_pos) == list(range(len(g)))
        if (g.n_tokens <= 256).all():
            assert g.n_tokens.sum() <= 256 or len(g) == 1


def test_curation_planted_filters(ray_session, tmp_path):
    from kgray.pipelines.curation import curate_documents

    en = ("the quick brown fox jumps over the lazy dog and runs to the "
          "field in a loop for a while is it not")        # stopword-rich
    de = ("der hund und die katze das haus ist ein tier zu hause mit "
          "allem der und die das ist ein zu mit der und")
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [en,                         # survives
                 en,                         # exact dup -> dropped
                 de,                         # german -> dropped
                 "short text",               # too short -> dropped
                 en + " extra tail words here to differ from doc zero",
                 "x" * 40 + " " + "y" * 40 + " " + ("word " * 30)]})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   f"{tmp_path}/documents.parquet")

    packed, rep = curate_documents(str(tmp_path), eval_permille=0)
    ids = set(packed.to_pandas().doc_id)
    assert rep["n_input"] == 6
    assert 1 not in ids           # dup lost to min-doc_id winner 0
    assert 2 not in ids and 3 not in ids
    assert 0 in ids and 4 in ids


def test_semantic_stage_retention(ray_session):
    """The SemDeDup stage drops exactly the not-kept ids that survived
    the earlier stages, and only that stage differs from the exact-only
    composition."""
    from kgray.pipelines.curation import curate_documents
    from kgray.pipelines.dedup import semantic_dedup

    sf = "/root/testdata/sf0.01"
    _, base = curate_documents(sf)
    packed, rep = curate_documents(sf, semantic=True)
    assert rep["n_input"] == base["n_input"]
    assert rep["n_deduped"] == base["n_deduped"]
    assert rep["n_semantic"] < rep["n_deduped"]          # non-vacuous

    sd = semantic_dedup(sf).to_pandas()
    dropped = set(sd[~sd.kept].vec_id)
    # every packed doc survived the semantic filter
    ids = set(packed.to_pandas().doc_id)
    assert not (ids & dropped)
