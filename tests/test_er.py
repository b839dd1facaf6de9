"""Entity resolution: the distributed pipeline vs a serial
block-pair-cluster oracle at sf0.001, plus blocking-recall and
golden-record invariants."""

import collections

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _serial_records():
    from kgray.pipelines.er import _SURROGATE, _variant_name

    t = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    recs = []
    for _, r in t.iterrows():
        digits = r["c_name"][9:]
        block = int(r["c_nationkey"]) * 10_000 + int(digits[5:9])
        cents = int(np.floor(r["c_acctbal"] * 100.0 + 0.5))
        recs.append((int(r["c_custkey"]), r["c_name"], block, cents))
        h = int(hashlib.md5(str(int(r["c_custkey"])).encode()
                            ).hexdigest()[:8], 16) % 1000
        if h < 300:
            recs.append((int(r["c_custkey"]) + _SURROGATE,
                         _variant_name(r["c_name"], h), block, cents))
    return recs


def _serial_pipeline():
    from kgray.pipelines.er import match_rule

    recs = _serial_records()
    by_block = collections.defaultdict(list)
    for rec in recs:
        by_block[rec[2]].append(rec)
    pairs = []
    for rows in by_block.values():
        rows.sort()
        for i in range(len(rows) - 1):
            for j in range(i + 1, len(rows)):
                if match_rule(rows[i][1], rows[j][1],
                              rows[i][3], rows[j][3]):
                    pairs.append((rows[i][0], rows[j][0]))
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    cluster = {}
    for rid, *_ in recs:
        cluster[rid] = find(rid) if rid in parent else rid
    golden = {}
    name_of = {r[0]: r[1] for r in recs}
    for rid, name, block, cents in recs:
        c = cluster[rid]
        g = golden.setdefault(c, {"canonical_id": rid, "n": 0,
                                  "cents": cents})
        g["canonical_id"] = min(g["canonical_id"], rid)
        g["n"] += 1
        g["cents"] = max(g["cents"], cents)
    return pairs, cluster, golden, name_of


def test_match_pairs_vs_serial(ray_session):
    from kgray.pipelines.er import er_match_pairs

    got = er_match_pairs(SF).to_pandas()
    exp_pairs, *_ = _serial_pipeline()
    assert set(zip(got["id_a"], got["id_b"])) == set(exp_pairs)
    # every dirty twin must match its clean source (blocking recall = 1
    # for the key-preserving perturbations)
    from kgray.pipelines.er import _SURROGATE
    twins = {(a, b) for a, b in exp_pairs if b - a == _SURROGATE}
    assert twins and twins <= set(zip(got["id_a"], got["id_b"]))


def test_golden_records_vs_serial(ray_session):
    from kgray.pipelines.er import customer_golden_records

    got = customer_golden_records(SF).to_pandas()
    _, cluster, golden, name_of = _serial_pipeline()
    assert len(got) == len(golden)
    for _, r in got.iterrows():
        g = golden[r["cluster_id"]]
        assert r["canonical_id"] == g["canonical_id"]
        assert r["n_members"] == g["n"]
        assert r["acctbal_cents"] == g["cents"]
        assert r["canonical_name"] == name_of[g["canonical_id"]]
    # total membership covers every record exactly once
    assert got["n_members"].sum() == len(_serial_records())
    # canonical rows are always clean records
    from kgray.pipelines.er import _SURROGATE
    assert (got["canonical_id"] < _SURROGATE).all()
