"""Session-6 operators: Adamic–Adar link prediction, k-hop GNN
neighbor sampling, the XML ingest source, the NB confusion matrix and
the group-aware split — semantic/edge-case pins beyond the SQL gate
(which checks them against DuckDB at sf0.001/sf0.01)."""

import hashlib
import math
import os
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_lineitem(tmp_path, orders):
    """orders: list of part lists -> minimal lineitem parquet dir."""
    ok, pk = [], []
    for i, parts in enumerate(orders):
        for p in parts:
            ok.append(i + 1)
            pk.append(p)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, type=pa.int64()),
        "l_partkey": pa.array(pk, type=pa.int64())}),
        os.path.join(tmp_path, "lineitem.parquet"))
    return str(tmp_path)


def _edges(orders, min_count=2):
    c = Counter()
    for parts in orders:
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                c[(ps[i], ps[j])] += 1
    return {e for e, n in c.items() if n >= min_count}


def test_adamic_adar_matches_bruteforce(ray_session, tmp_path):
    from kgray.pipelines.relational import part_adamic_adar

    # planted graph: hub node 1 touches everything (low AA weight),
    # nodes 2/3 share two rarer neighbors (4, 5) -> top prediction
    orders = ([[1, 2, 4], [2, 4]] * 2 + [[1, 3, 4], [3, 4]] * 2
              + [[2, 5], [3, 5], [2, 5], [3, 5]]
              + [[1, 6], [1, 6], [1, 7], [1, 7], [6, 8], [6, 8]])
    sf = _write_lineitem(tmp_path, orders)

    edges = _edges(orders)
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    aa = {}
    nodes = sorted(nbrs)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if (x, y) in edges:
                continue
            common = [z for z in nbrs[x] & nbrs[y] if len(nbrs[z]) >= 2]
            if common:
                aa[(x, y)] = (
                    sum(math.floor(1e6 / math.log(len(nbrs[z])))
                        for z in common), len(common))

    got = part_adamic_adar(sf, k=50).to_pylist()
    got_map = {(r["part_a"], r["part_b"]): (r["aa_micro"], r["n_common"])
               for r in got}
    assert got_map == aa
    # ranked deterministically: aa_micro desc, then (a, b)
    ranks = [(-r["aa_micro"], r["part_a"], r["part_b"]) for r in got]
    assert ranks == sorted(ranks)
    # predictions never include existing edges
    assert all((r["part_a"], r["part_b"]) not in edges for r in got)


def test_khop_sample_bruteforce_and_invariants(ray_session, tmp_path):
    from kgray.pipelines.relational import part_khop_sample

    rng = np.random.default_rng(11)
    orders = [sorted(rng.choice(np.arange(1, 40), size=4,
                                replace=False).tolist())
              for _ in range(300)]
    sf = _write_lineitem(tmp_path, orders)

    edges = _edges(orders)
    sym = defaultdict(list)
    for a, b in edges:
        sym[a].append(b)
        sym[b].append(a)

    def rk(s, d):
        return int(hashlib.md5(str((s << 32) | d).encode())
                   .hexdigest()[:15], 16)

    def md5b(v, mod):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % mod

    fanout = 3
    seeds = sorted(n for n in sym if md5b(n, 20) == 0)
    assert seeds, "planted graph must yield at least one seed"
    h1 = {s: sorted(sym[s], key=lambda d: (rk(s, d), d))[:fanout]
          for s in seeds}
    frontier = sorted({d for ds_ in h1.values() for d in ds_})
    h2 = {f: sorted(sym[f], key=lambda d: (rk(f, d), d))[:fanout]
          for f in frontier}

    got = part_khop_sample(sf, fanout=fanout).to_pandas()
    g1 = got[got["hop"] == 1]
    g2 = got[got["hop"] == 2]
    assert {(r.src, r.dst) for r in g1.itertuples()} \
        == {(s, d) for s, ds_ in h1.items() for d in ds_}
    assert {(r.src, r.dst) for r in g2.itertuples()} \
        == {(f, d) for f, ds_ in h2.items() for d in ds_}
    # fanout bound per node per hop
    assert g1.groupby("src").size().max() <= fanout
    assert g2.groupby("src").size().max() <= fanout
    # ranks are the md5 edge ranks (pure function of the data)
    for r in got.itertuples():
        assert r.rk == rk(r.src, r.dst)


def test_xml_source_roundtrip_parity(ray_session):
    from kgray.sources.xmlsrc import events_to_xml, read_events_xml

    xml_dir = events_to_xml(SF)
    got = (read_events_xml(xml_dir).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    exp = (pq.read_table(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "event_type",
                                  "value"])
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    got = got[exp.columns.tolist()]
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    # repr round-trip: floats are bit-identical
    assert np.array_equal(got["value"].to_numpy().view(np.int64),
                          exp["value"].to_numpy().view(np.int64))


def test_nb_confusion_totals_and_consistency(ray_session):
    from kgray.pipelines.text import nb_confusion, nb_lang_predictions

    cm = nb_confusion(SF).to_pandas()
    pred = nb_lang_predictions(SF).to_pandas()
    gold = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "text"]).to_pandas()
    gold = gold[gold["text"].str.strip().str.len() > 0]

    # the matrix accounts for every scored (non-empty) document
    assert cm["n_docs"].sum() == len(pred) == len(gold)
    # cell-for-cell equal to a direct pandas cross-tab of the pipeline
    merged = pred.merge(gold[["doc_id", "lang"]], on="doc_id")
    exp = (merged.groupby(["lang", "pred_lang"]).size()
           .rename("n_docs").reset_index())
    g = (cm.sort_values(["lang", "pred_lang"]).reset_index(drop=True))
    e = (exp.sort_values(["lang", "pred_lang"]).reset_index(drop=True))
    assert g[["lang", "pred_lang"]].values.tolist() \
        == e[["lang", "pred_lang"]].values.tolist()
    assert g["n_docs"].tolist() == e["n_docs"].tolist()


def test_source_group_splits_no_group_straddles(ray_session):
    from kgray.pipelines.text import source_group_splits

    df = source_group_splits(SF).to_pandas()
    assert set(df["split"].unique()) <= {"train", "val", "test"}
    # group-leakage law: every source maps to exactly ONE split
    assert (df.groupby("source")["split"].nunique() == 1).all()
    # and the assignment is the md5 rule
    for src, split in df.groupby("source")["split"].first().items():
        b = int(hashlib.md5(str(src).encode()).hexdigest()[:8], 16) % 1000
        exp = "train" if b < 800 else ("val" if b < 900 else "test")
        assert split == exp, src
