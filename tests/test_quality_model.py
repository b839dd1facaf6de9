"""Model-based quality filtering: exact distributed training law
(bit-identical weights for any partitioning) + held-out quality gate
on the imbalanced zh label."""

import numpy as np

SF = "/root/testdata/sf0.01"


def test_training_partitioning_invariant(ray_session):
    """Weights after every epoch are an exact integer reduction —
    training over 2 blocks and over 13 blocks must produce the SAME
    int64 weight vector bit-for-bit."""
    from kgray.pipelines.quality_model import _pages_ds, train_quality_model

    base = _pages_ds(SF)
    w2 = train_quality_model(SF, epochs=6, _docs=base.repartition(2))
    w13 = train_quality_model(SF, epochs=6, _docs=base.repartition(13))
    assert w2.dtype == np.int64
    np.testing.assert_array_equal(w2, w13)
    assert np.abs(w2).sum() > 0                  # it actually trained


def test_heldout_quality_gate(ray_session):
    """Both-class recall >= 0.9 on the md5 held-out split (the label
    is ~4% zh, so accuracy alone would pass an all-en model)."""
    from kgray.pipelines.quality_model import (_pages_ds, _train_ids_mask,
                                               doc_quality_scores)

    df = doc_quality_scores(SF).to_pandas().set_index("url")
    pages = _pages_ds(SF).to_pandas().set_index("url")
    y = (pages.lang == "zh").reindex(df.index)
    held = ~_train_ids_mask(df.index.tolist())
    zh = (y & held).values
    en = (~y & held).values
    assert zh.sum() > 0 and en.sum() > 0
    assert df.pred_zh[zh].mean() >= 0.9          # zh recall
    assert (~df.pred_zh[en]).mean() >= 0.9       # en recall
    assert ((df.score >= 0) & (df.score <= 1)).all()
