"""Session-25 batch: incremental KG merge (split-point-independence
law vs the full recompute), triple recency (support-consistency and
span laws vs the canonical graph), and the lineage-report surface
(conservation + resume idempotence)."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _graph_rows(ds):
    return sorted((r["subj"], r["pred"], r["obj"], r["support"])
                  for r in ds.take_all())


def test_incremental_merge_split_independence(ray_session):
    import __ray_entry__ as entry
    from kgray.pipelines.graph import kg_incremental_merge

    full = _graph_rows(entry.queries()["kg_graph"](SF))
    # default split (delta = last file) and a different split point
    assert _graph_rows(kg_incremental_merge(SF)) == full
    assert _graph_rows(
        kg_incremental_merge(SF, n_delta_files=2)) == full


def test_triple_recency_laws(ray_session):
    import __ray_entry__ as entry
    from kgray.pipelines.graph import kg_triple_recency
    from kgray.pipelines.kg import page_files
    from kgray.sources.derived import corpus_for_sf

    rec = kg_triple_recency(SF).take_all()
    graph = {(r["subj"], r["pred"], r["obj"]): r["support"]
             for r in entry.queries()["kg_graph"](SF).take_all()}
    # same triple set; occurrence count == canonical support
    assert {(r["subj"], r["pred"], r["obj"]) for r in rec} == set(graph)
    for r in rec:
        assert r["n_mentions"] == graph[(r["subj"], r["pred"], r["obj"])]
        assert r["first_seen_us"] <= r["last_seen_us"]
    # spans lie inside the corpus's crawl-timestamp range
    pages = pq.read_table(page_files(corpus_for_sf(SF)),
                          columns=["warc_ts"])
    ts = pages.column("warc_ts").cast("int64")
    lo, hi = min(ts.to_pylist()), max(ts.to_pylist())
    assert all(lo <= r["first_seen_us"] and r["last_seen_us"] <= hi
               for r in rec)


def test_lineage_report_conservation(ray_session):
    from kgray.pipelines.graph import kg_lineage_report
    from kgray.pipelines.kg import page_files
    from kgray.sources.derived import corpus_for_sf

    t = kg_lineage_report(SF)
    rows = t.to_pylist()
    groups = [r for r in rows if r["group_id"] != "__graph__"]
    gr = [r for r in rows if r["group_id"] == "__graph__"]
    assert len(gr) == 1 and gr[0]["status"] == "done"
    # every page file is covered by exactly one group
    n_files = len(page_files(corpus_for_sf(SF)))
    assert sum(r["n_input_files"] for r in groups) == n_files
    # page counts conserve; canonicalization only dedupes
    pages = sum(pq.read_table(f, columns=["url"]).num_rows
                for f in page_files(corpus_for_sf(SF)))
    assert sum(r["rows_in"] for r in groups) == pages
    assert 0 < gr[0]["n_graph_rows"] <= \
        sum(r["triples_out"] for r in groups)
    # resume idempotence: a rerun skips all manifest-complete groups
    again = kg_lineage_report(SF)
    assert again.equals(t)


def test_weighted_sample_favors_heavy_docs(ray_session):
    import pyarrow.parquet as pq

    from kgray.pipelines.text import doc_weighted_sample

    got = doc_weighted_sample(SF, k=50).to_pylist()
    assert len(got) == 50
    assert [r["rank"] for r in got] == list(range(1, 51))
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["n_chars"]).column("n_chars")
    corpus_mean = sum(docs.to_pylist()) / len(docs)
    sample_mean = sum(r["n_chars"] for r in got) / len(got)
    # probability ∝ n_chars+1 ⇒ the sample skews heavy
    assert sample_mean > corpus_mean


def test_ntile_laws(ray_session):
    from kgray.pipelines.relational import order_value_ntile

    rows = order_value_ntile(SF).to_pylist() if hasattr(
        order_value_ntile(SF), "to_pylist") else \
        order_value_ntile(SF).take_all()
    by_pr = {}
    for r in rows:
        by_pr.setdefault(r["o_orderpriority"], []).append(r)
    for pr, ts in by_pr.items():
        ts.sort(key=lambda r: r["tile"])
        assert [r["tile"] for r in ts] == [1, 2, 3, 4]
        counts = [r["n_orders"] for r in ts]
        # NTILE size law: first (n % 4) tiles get one extra row
        assert max(counts) - min(counts) <= 1
        assert sorted(counts, reverse=True) == counts
        # tiles partition the value axis in order
        for a, b in zip(ts, ts[1:]):
            assert a["max_cents"] <= b["min_cents"]


def test_hierarchy_rollup_conservation(ray_session):
    import pyarrow.parquet as pq

    from kgray.pipelines.relational import part_hierarchy_rollup

    rows = {r["anc"]: r for r in part_hierarchy_rollup(SF).take_all()}
    part = pq.read_table(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_retailprice"])
    keys = part.column("p_partkey").to_pylist()
    cents = {k: int(np.floor(p * 100.0 + 0.5)) for k, p in
             zip(keys, part.column("p_retailprice").to_pylist())}
    assert set(rows) == set(keys)          # every node is an ancestor
    # root 0 covers the whole forest
    assert rows[0]["n_nodes"] == len(keys)
    assert rows[0]["subtree_cents"] == sum(cents.values())
    # parent superset law: subtree(parent) ⊇ subtree(child)
    for k in keys:
        if k >= 1:
            p = k // 4
            assert rows[p]["n_nodes"] >= rows[k]["n_nodes"] + \
                (1 if p != k else 0) - 1
            assert rows[p]["subtree_cents"] >= rows[k]["subtree_cents"]
    # leaf law: nodes with no children roll up to themselves
    children = {k // 4 for k in keys if k >= 1}
    for k in keys:
        if k not in children:
            assert rows[k]["n_nodes"] == 1
            assert rows[k]["subtree_cents"] == cents[k]


def test_hierarchy_paths_prefix_law(ray_session):
    from kgray.pipelines.relational import part_hierarchy_paths

    rows = {r["node"]: r for r in part_hierarchy_paths(SF).take_all()}
    for k, r in rows.items():
        parts = r["path"].split("/")
        assert parts[-1] == str(k)
        assert parts[0] == "0" or k == 0
        assert r["depth"] == len(parts) - 1
        # subtree-as-prefix law: a child's path extends its parent's
        if k >= 1:
            assert r["path"].startswith(rows[k // 4]["path"] + "/")


def test_subtree_revenue_equals_rollup(ray_session):
    from kgray.pipelines.relational import (part_hierarchy_rollup,
                                            part_subtree_revenue)

    roll = {r["anc"]: r for r in part_hierarchy_rollup(SF).take_all()}
    sub = part_subtree_revenue(SF, subtree_root=1).to_pylist()[0]
    assert sub["n_nodes"] == roll[1]["n_nodes"]
    assert sub["subtree_cents"] == roll[1]["subtree_cents"]
