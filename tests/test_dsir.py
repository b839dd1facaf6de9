"""DSIR importance resampling: serial-oracle equality of the exact
integer machinery + target-enrichment gate."""

import math

import numpy as np

SF = "/root/testdata/sf0.001"


def test_ratio_table_matches_serial_oracle(ray_session):
    """The distributed count partials + driver log-ratio equal a
    serial recount with the same hashing and smoothing, bit for bit."""
    import pyarrow.compute as pc
    from kgray.pipelines import dsir

    ratio = dsir._log_ratio_table(SF)
    pages = dsir._pages_ds(SF).to_pandas()

    raw = np.zeros(dsir.D, dtype=np.int64)
    tgt = np.zeros(dsir.D, dtype=np.int64)
    import pyarrow as pa
    feats, docidx = dsir._feature_rows(pa.array(pages.text.tolist()))
    is_t = dsir._is_target(pages.url.tolist(), pages.lang.tolist())
    np.add.at(raw, feats, 1)
    np.add.at(tgt, feats[is_t[docidx]], 1)
    nt, nr = int(tgt.sum()), int(raw.sum())
    want = np.array([
        math.floor((math.log(int(tgt[f]) + 1) - math.log(nt + dsir.D)
                    - math.log(int(raw[f]) + 1) + math.log(nr + dsir.D))
                   * dsir._NAT_SCALE)
        for f in range(dsir.D)], dtype=np.int64)
    np.testing.assert_array_equal(ratio, want)
    assert nt > 0                                 # target non-empty


def test_scores_match_serial_dot(ray_session):
    """Every page's score equals the exact integer dot of its feature
    counts with the ratio table."""
    import pyarrow as pa
    from kgray.pipelines import dsir

    ratio = dsir._log_ratio_table(SF)
    got = dsir.dsir_scores(SF).to_pandas().set_index("url")
    pages = dsir._pages_ds(SF).to_pandas()
    feats, docidx = dsir._feature_rows(pa.array(pages.text.tolist()))
    want = np.zeros(len(pages), dtype=np.int64)
    np.add.at(want, docidx, ratio[feats])
    for i, u in enumerate(pages.url):
        assert int(got.loc[u, "dsir_score"]) == int(want[i])


def test_selection_enriches_target(ray_session):
    """The top slice is strongly enriched in the target language AMONG
    PAGES OUTSIDE THE md5 TARGET SAMPLE — i.e. DSIR generalizes, it
    doesn't just re-select the sample it memorized: held-out zh
    fraction in the selection >= 5x the held-out base rate."""
    from kgray.pipelines import dsir
    from kgray.functions.sampling import _md5_bucket

    sel = dsir.dsir_select(SF, keep_permille=100).to_pandas()
    pages = dsir._pages_ds(SF).to_pandas().set_index("url")
    held = pages.index[_md5_bucket(pages.index.tolist(), 1000)
                       >= dsir.TARGET_SAMPLE_PERMILLE]
    base = (pages.lang.reindex(held) == "zh").mean()
    sel_held = [u for u in sel.url if u in set(held)]
    assert len(sel_held) > 0
    got = (pages.lang.reindex(sel_held) == "zh").mean()
    assert got >= 5 * base, (got, base)
    # deterministic order: score desc, url asc
    s = sel.sort_values(["dsir_score", "url"],
                        ascending=[False, True], ignore_index=True)
    assert s.url.tolist() == sel.url.tolist()
