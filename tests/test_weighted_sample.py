"""weighted_doc_sample: A-ES key law and the weight-bias property."""

import hashlib
import math

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"     # 500 docs — k=100 actually selects


def _key(doc_id: int, n_chars: int) -> float:
    hv = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return math.log((hv + 1) / 4294967296.0) / float(n_chars)


def test_weighted_sample_key_law_and_bias(ray_session):
    from kgray.pipelines.text import weighted_doc_sample

    got = weighted_doc_sample(SF, k=100).to_pandas()
    assert list(got["sample_rank"]) == list(range(1, 101))
    # bitwise key law, recomputed independently per selected row
    for _, r in got.iterrows():
        assert r["es_key"] == _key(int(r["doc_id"]), int(r["n_chars"]))
    # the selection is EXACTLY the global top-100 keys
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    docs["k"] = [_key(int(d), int(n))
                 for d, n in zip(docs["doc_id"], docs["n_chars"])]
    exp = set(docs.sort_values(["k", "doc_id"],
                               ascending=[False, True])["doc_id"][:100])
    assert set(got["doc_id"]) == exp
    # weight bias: heavier docs overrepresented vs uniform
    assert got["n_chars"].mean() > docs["n_chars"].mean()
