"""The flagship pipeline: web pages → knowledge graph.

Lifecycle (SURVEY.md §3.5):

    read_parquet(pages shards)                      [stateless read tasks]
      → map_batches(extract_text)                   [stateless]
      → map_batches(split_sentences)                [stateless explode]
      → map_batches(HMMTagger, concurrency=N)       [actor pool, NumPy params]
      → map_batches(extract_triples)                [stateless pattern rules]
      → map_batches(LinkerActor, concurrency=N)     [actor pool, broadcast aliases]
      → write_parquet(out/triples/group=<gid>/)     [per-group sink]
    …then over all group outputs:
      canonical_graph (salted 2-stage groupby) → sort(subj) → graph parquet

Each completed partition group appends a lineage record (counters,
files, wall time) to the manifest; a rerun skips ``done`` groups
(`resumable`).  Model artifacts are built once on the driver (training
data is small — the reference trains serially too, hmm_ner.py:9-124;
only inference scales out) and loaded per actor.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..kernels import crf as crf_kernel, hmm as hmm_kernel
from ..kernels.linking import EMB_DIM, link_surface
from ..kernels.triples import extract_sentence_triples, sentence_mentions
from ..sources.corpus import load_side_tables
from ..stages.canonical import canonical_graph
from ..stages.extract import extract_text, split_sentences, tokenize_line
from ..stages.kg import LinkerActor, extract_triples
from ..stages.tagger import CRFTagger, HMMTagger, TransformerTagger
from ..state.counters import counting_passthrough, new_counter
from ..state.manifest import Manifest

__all__ = ["build_models", "kg_dataset", "run_kg", "serial_oracle_triples",
           "page_files", "partition_groups", "page_site_counts"]


# --------------------------------------------------------------------------- models


def build_models(corpus_dir: str, model_dir: str, tagger: str = "hmm",
                 crf_epochs: int = 3, crf_lr: float = 0.05,
                 crf_max_sentences: int = 400) -> dict:
    """Train tagging models from the corpus's CoNLL split (driver-side:
    index assignment is insertion-ordered and inherently serial,
    SURVEY.md §7.4) and save artifacts for actor `__init__` loading."""
    os.makedirs(model_dir, exist_ok=True)
    tbl = pq.read_table(os.path.join(corpus_dir, "conll_train.parquet"))
    sents_w = tbl["tokens"].to_pylist()
    sents_t = tbl["tags"].to_pylist()
    zh_path = os.path.join(corpus_dir, "conll_train_zh.parquet")
    zh_w, zh_t = [], []
    if os.path.exists(zh_path):
        zh_tbl = pq.read_table(zh_path)
        zh_w = zh_tbl["tokens"].to_pylist()
        zh_t = zh_tbl["tags"].to_pylist()
    paths = {}
    if tagger in ("hmm", "both"):
        m = hmm_kernel.train_hmm(sents_w, sents_t)
        p = os.path.join(model_dir, "hmm_en")
        m.save(p)
        paths["hmm"] = {"en": p + ".npz"}
        if zh_w:
            mz = hmm_kernel.train_hmm(zh_w, zh_t)
            pz = os.path.join(model_dir, "hmm_zh")
            mz.save(pz)
            paths["hmm"]["zh"] = pz + ".npz"
    if tagger == "transformer":
        from ..kernels import transformer as tfm
        for lang, (sw, st) in {"en": (sents_w, sents_t),
                               **({"zh": (zh_w, zh_t)} if zh_w else {})}.items():
            w2i, t2i = tfm.build_vocab(sw, st)
            m = tfm.init_random(w2i, t2i, max_seq_len=tfm.max_len_pow2(sw))
            p = os.path.join(model_dir, f"transformer_{lang}")
            m.save(p)
            paths.setdefault("transformer", {})[lang] = p + ".npz"
    if tagger in ("crf", "both"):
        mc = crf_kernel.train_crf_sgd(sents_w[:crf_max_sentences],
                                      sents_t[:crf_max_sentences],
                                      epochs=crf_epochs, lr=crf_lr)
        p = os.path.join(model_dir, "crf_en")
        mc.save(p)
        paths["crf"] = {"en": p + ".npz"}
        if zh_w:
            mcz = crf_kernel.train_crf_sgd(zh_w[:crf_max_sentences],
                                           zh_t[:crf_max_sentences],
                                           epochs=crf_epochs, lr=crf_lr)
            pz = os.path.join(model_dir, "crf_zh")
            mcz.save(pz)
            paths["crf"]["zh"] = pz + ".npz"
    marker = os.path.join(model_dir, "models.json")
    if os.path.exists(marker):               # merge with previously-built taggers
        with open(marker) as f:
            merged = json.load(f)
        merged.update(paths)
        paths = merged
    with open(marker, "w") as f:
        json.dump(paths, f)
    return paths


def _model_paths(model_dir: str, tagger: str) -> dict:
    with open(os.path.join(model_dir, "models.json")) as f:
        return json.load(f)[tagger]


# --------------------------------------------------------------------------- dataset builder


def page_files(corpus_dir: str) -> list:
    return sorted(glob.glob(os.path.join(corpus_dir, "pages", "*.parquet")))


def partition_groups(files: list, files_per_group: int = 2) -> list:
    """[(group_id, [files])] — resume granularity."""
    groups = []
    for i in range(0, len(files), files_per_group):
        chunk = files[i:i + files_per_group]
        groups.append((f"g{i // files_per_group:05d}", chunk))
    return groups


def _auto_concurrency(tagger_eighths: int = 6):
    """Size the actor pools to the measured work split (extract/split
    fuse INTO the tagger actors, extract_triples into the linker's):
    tagger ≈ ``tagger_eighths``/8 of the CPUs, linker the rest minus
    one — one CPU always stays unreserved or the stateless read tasks
    starve and the pipeline stalls (A/B-measured round 2: (24,7) beats
    the old (16,8) by ~40% at 32 CPUs; full reservation deadlocks
    at 8).  HMM decode is light → 6/8 (≡ the measured 3/4 split); CRF
    decode does ~6.8× the linker's CPU (ds.stats(), 480k pages) → 7/8."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    tagger = max(1, (tagger_eighths * cpus) // 8)
    linker = max(1, cpus - tagger - 1)
    if tagger + linker >= cpus and tagger > 1:
        tagger = max(1, cpus - linker - 1)
    return tagger, linker


def kg_dataset(files, corpus_dir: str, model_dir: str, tagger: str = "hmm",
               concurrency=None, batch_size: int = 1024, counter=None):
    """Build the lazy Dataset pipeline pages → linked triples.

    ``concurrency``: None → auto-size from cluster CPUs; an int n →
    (tagger n, linker max(1, n//2)); a tuple → used for both pools.
    """
    if concurrency is None:
        tagger_conc, linker_conc = _auto_concurrency(
            7 if tagger in ("crf", "transformer") else 6)
        # Cap the pools by input size: a 240-page corpus gets 2 batches
        # of work, and spinning 24+7 actors for it costs more than the
        # tagging (A/B at sf0.001: 7.2 s auto vs 2.7 s capped).  Row
        # counts come from parquet footers (metadata-only reads); a
        # >16-file input is assumed large and keeps the full pools.
        if len(files) <= 16:
            rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
            tagger_conc = max(2, min(tagger_conc, rows // 128 + 1))
            linker_conc = max(1, min(linker_conc, rows // 512 + 1))
    elif isinstance(concurrency, int):
        tagger_conc, linker_conc = concurrency, max(1, concurrency // 2)
    else:
        tagger_conc = linker_conc = concurrency
    tagger_cls = {"hmm": HMMTagger, "crf": CRFTagger,
                  "transformer": TransformerTagger}[tagger]
    model_paths = _model_paths(model_dir, tagger)

    # fractional-CPU read tasks: the actor pools reserve all but one
    # CPU, and a whole-CPU read would serialize on that single slot —
    # measured 20.8 s of read ramp on a 68 s / 480k-page run.  At 0.25
    # CPU four reads co-schedule per free slot and the pools stay fed.
    ds = rd.read_parquet(files, columns=["url", "html", "lang"],
                         ray_remote_args={"num_cpus": 0.25})
    if counter is not None:
        ds = ds.map_batches(counting_passthrough(counter, "pages"),
                            batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(extract_text, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(split_sentences, batch_format="pyarrow", zero_copy_batch=True)
    if counter is not None:
        ds = ds.map_batches(counting_passthrough(counter, "sentences"),
                            batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(tagger_cls, fn_constructor_kwargs={"model_paths": model_paths},
                        batch_format="pyarrow", batch_size=batch_size,
                        concurrency=tagger_conc, num_cpus=1)
    ds = ds.map_batches(extract_triples, batch_format="pyarrow", zero_copy_batch=True)
    if counter is not None:
        ds = ds.map_batches(counting_passthrough(counter, "triples_raw"),
                            batch_format="pyarrow", zero_copy_batch=True)
    # side tables load per actor from the corpus path (restart-safe;
    # see LinkerActor docstring re ray#53727) — never ray.put refs in
    # actor constructor args
    ds = ds.map_batches(LinkerActor,
                        fn_constructor_kwargs={"corpus_dir": corpus_dir},
                        batch_format="pyarrow", batch_size=4096,
                        concurrency=linker_conc, num_cpus=1)
    return ds


# --------------------------------------------------------------------------- run loop (resume + lineage)


def run_kg(corpus_dir: str, out_dir: str, model_dir: str | None = None,
           tagger: str = "hmm", files_per_group: int = 2,
           concurrency=None, batch_size: int = 1024,
           n_salts: int = 16, stop_after_groups: int | None = None,
           graph_buckets: int = 16) -> dict:
    """Full driver loop: partition groups → triples parquet (+ manifest)
    → salted canonicalization → bucketed sorted graph parquet.

    The graph sink is ``graph/subj_bucket=<b>/`` hash-bucketed on the
    subject (``stable_hash64(subj) % graph_buckets``), subj-sorted
    within each bucket: a consumer looking up one subject reads exactly
    one partition directory, and a failed write reruns per bucket.
    ``stop_after_groups`` simulates a killed run for the resume test.
    Returns run stats.
    """
    os.makedirs(out_dir, exist_ok=True)
    if model_dir is None:
        model_dir = os.path.join(out_dir, "models")
    if not os.path.exists(os.path.join(model_dir, "models.json")):
        build_models(corpus_dir, model_dir, tagger=tagger)

    manifest = Manifest(os.path.join(out_dir, "manifest.jsonl"))
    done = manifest.done_groups()
    groups = partition_groups(page_files(corpus_dir), files_per_group)
    triples_root = os.path.join(out_dir, "triples")

    ran = []
    for gid, files in groups:
        if gid in done:
            continue
        if stop_after_groups is not None and len(ran) >= stop_after_groups:
            break
        counter = new_counter()
        t0 = time.perf_counter()
        group_dir = os.path.join(triples_root, f"group={gid}")
        # a run killed mid-group leaves partial parquet with no manifest
        # record; write_parquet ACCUMULATES files, so clear the stale
        # partials or the rerun double-counts triples
        shutil.rmtree(group_dir, ignore_errors=True)
        ds = kg_dataset(files, corpus_dir, model_dir, tagger=tagger,
                        concurrency=concurrency, batch_size=batch_size,
                        counter=counter)
        ds = ds.map_batches(counting_passthrough(counter, "triples_linked"),
                            batch_format="pyarrow", zero_copy_batch=True)
        ds.write_parquet(group_dir)
        counts = ray.get(counter.get.remote())
        manifest.append({
            "group_id": gid,
            "input_files": [os.path.basename(f) for f in files],
            "rows_in": counts.get("pages", 0),
            "sentences": counts.get("sentences", 0),
            "triples_raw": counts.get("triples_raw", 0),
            "triples_out": counts.get("triples_linked", 0),
            "output_dir": group_dir,
            "wall_sec": round(time.perf_counter() - t0, 3),
            "status": "done",
        })
        ray.kill(counter)
        ran.append(gid)

    remaining = [g for g, _ in groups if g not in manifest.done_groups()]
    stats = {"groups_run": ran, "groups_skipped": sorted(done),
             "groups_remaining": remaining}
    if remaining:
        return stats                      # partial run (resume later)

    # ---- global canonicalization + sorted graph materialization
    # (checkpointed too: a rerun over an unchanged triple set skips it)
    graph_dir = os.path.join(out_dir, "graph")
    group_ids = sorted(g for g, _ in groups)
    graph_done = [r for r in manifest.records()
                  if r.get("group_id") == "__graph__"
                  and r.get("input_groups") == group_ids]
    if graph_done and os.path.isdir(graph_dir):
        stats["graph_dir"] = graph_dir
        stats["graph_skipped"] = True
        stats["n_graph_rows"] = graph_done[-1]["n_graph_rows"]
        return stats
    t0 = time.perf_counter()
    # same stale-partial hazard if a previous run died between graph
    # write and manifest append
    shutil.rmtree(graph_dir, ignore_errors=True)
    linked = rd.read_parquet(triples_root)
    graph = canonical_graph(linked, n_salts=n_salts)

    def add_bucket(batch):
        import numpy as np
        import pyarrow as pa
        from ..functions.hashing import polyhash64_batch
        b = (polyhash64_batch(batch.column("subj"))
             % np.uint64(graph_buckets)).astype(np.int32)
        return batch.append_column("subj_bucket", pa.array(b, type=pa.int32()))

    graph = (graph.map_batches(add_bucket, batch_format="pyarrow",
                               zero_copy_batch=True)
             .sort(["subj_bucket", "subj"]))
    graph.write_parquet(graph_dir, partition_cols=["subj_bucket"])
    stats["graph_dir"] = graph_dir
    stats["graph_wall_sec"] = round(time.perf_counter() - t0, 3)
    stats["n_graph_rows"] = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(graph_dir, "**", "*.parquet"),
                           recursive=True))
    manifest.append({"group_id": "__graph__", "input_groups": group_ids,
                     "n_graph_rows": stats["n_graph_rows"],
                     "wall_sec": stats["graph_wall_sec"], "status": "done"})
    return stats


# --------------------------------------------------------------------------- serial oracle (reference semantics)


def serial_oracle_triples(corpus_dir: str, model_dir: str, tagger: str = "hmm",
                          max_pages: int | None = None) -> dict:
    """Single-process reference-semantics extractor: per-sentence Viterbi
    (the strict hmm_ner.py:165-268-parity kernel), same mention/triple/
    linking functions, plain Python loop — the parity target for the Ray
    pipeline (north rule P/R ≥ 0.95 measures Ray vs THIS).

    Returns {(subj, pred, obj): support}.
    """
    from ..functions.html_text import html_to_text

    model_paths = _model_paths(model_dir, tagger)
    if tagger == "hmm":
        models = {lang: hmm_kernel.HMMModel.load(p) for lang, p in model_paths.items()}
        decode = lambda toks, m: hmm_kernel.viterbi_decode(toks, m)
    else:
        models = {lang: crf_kernel.CRFModel.load(p) for lang, p in model_paths.items()}
        decode = lambda toks, m: crf_kernel.viterbi_decode(toks, m)[0]
    alias_idx, emb_map = load_side_tables(corpus_dir)

    triples: dict = {}
    n_seen = 0
    for f in page_files(corpus_dir):
        tbl = pq.read_table(f, columns=["url", "html", "lang"])
        for url, html_b, lang in zip(tbl["url"].to_pylist(),
                                     tbl["html"].to_pylist(),
                                     tbl["lang"].to_pylist()):
            if max_pages is not None and n_seen >= max_pages:
                return triples
            n_seen += 1
            text = html_to_text(html_b)
            for line in text.split("\n"):
                toks = tokenize_line(line, lang)
                if not toks:
                    continue
                model = models.get(lang)
                tags = decode(toks, model) if model is not None else ["O"] * len(toks)
                scheme = "bmes" if lang == "zh" else "bio"
                mentions = sentence_mentions(toks, tags, scheme)
                raw = extract_sentence_triples(toks, mentions)
                if not raw:
                    continue
                ctx = [t.lower() for t in toks]
                for s_surface, _, pred, o_surface, _ in raw:
                    s_cid, _ = link_surface(s_surface, ctx, alias_idx, emb_map, EMB_DIM)
                    o_cid, _ = link_surface(o_surface, ctx, alias_idx, emb_map, EMB_DIM)
                    key = (s_cid, pred, o_cid)
                    triples[key] = triples.get(key, 0) + 1
    return triples


def page_site_counts(sf_dir: str):
    """URL analytics over the web corpus: site segment parsed from every
    page url with ONE vectorized RE2 kernel, pages counted per site —
    the crawl-manifest summary every web pipeline starts from."""
    import numpy as np
    import pyarrow.compute as pc

    from ..sources.derived import corpus_for_sf
    from ..stages.aggregate import sorted_group_aggregate

    corpus = corpus_for_sf(sf_dir)

    def parse(b):
        import pyarrow as pa
        hit = pc.extract_regex(b.column("url"),
                               r"^https://(?P<host>[^/]+)/(?P<site>[^/]+)/")
        t = pa.table({
            "host": pc.struct_field(hit, "host"),
            "site": pc.struct_field(hit, "site"),
            "n_pages": pa.array(np.ones(b.num_rows, dtype=np.int64))})
        return t.filter(pc.is_valid(t.column("site")))

    ds = rd.read_parquet(page_files(corpus), columns=["url"],
                         ray_remote_args={"num_cpus": 0.25})
    return sorted_group_aggregate(
        ds.map_batches(parse, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["host", "site"], [("n_pages", "sum")])


def crawl_host_shards(sf_dir: str, n_shards: int = 16):
    """Politeness-aware crawl-shard planner over the web corpus: every
    politeness unit lands in exactly one shard (per-host rate limits
    and robots caches then never cross workers — the Common-Crawl
    fetch-layout invariant).  The unit is the first two URL segments
    (host + site prefix) because the synthetic corpus is single-host
    by construction; on a real crawl the same plan keys on the
    registered domain.  Units are dealt to shards by sorted round-robin
    ``shard = (rank_by(pages DESC, host) − 1) mod n_shards`` so the
    heavy hosts spread before the tail pads the loads.

    Plan: one vectorized URL parse + per-host aggregate (host-sized),
    one constant-key ``grouped_ranks`` exchange for the global rank,
    one shard-sized reduce.  Nothing page-sized is shuffled twice, and
    the driver sees only ``n_shards`` rows.  Determinism: rank ties
    are impossible ((pages, host) is unique per host), so the layout
    is a pure function of the corpus — a re-plan after a crashed crawl
    reproduces the same shards and finished shards can be skipped."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..sources.derived import corpus_for_sf
    from ..stages.aggregate import sorted_group_aggregate
    from ..stages.scan import grouped_ranks

    corpus = corpus_for_sf(sf_dir)

    def parse(b):
        hit = pc.extract_regex(
            b.column("url"), r"^https://(?P<host>[^/]+/[^/]+)/")
        t = pa.table({
            "host": pc.struct_field(hit, "host"),
            "n_pages": pa.array(np.ones(b.num_rows, dtype=np.int64))})
        return t.filter(pc.is_valid(t.column("host")))

    hosts = sorted_group_aggregate(
        rd.read_parquet(page_files(corpus), columns=["url"],
                        ray_remote_args={"num_cpus": 0.25})
        .map_batches(parse, batch_format="pyarrow", zero_copy_batch=True),
        ["host"], [("n_pages", "sum")], precombine=True)

    ranked = grouped_ranks(
        hosts.map_batches(lambda b: pa.table({
            "host": b.column("host"), "n_pages": b.column("n_pages"),
            "neg": pc.negate_checked(b.column("n_pages")),
            "one": pa.array(np.zeros(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True),
        key="one", order_cols=["neg", "host"])

    def assign(b: pa.Table) -> pa.Table:
        rn = b.column("row_number").to_numpy(zero_copy_only=False)
        return pa.table({
            "shard": pa.array((rn - 1) % n_shards, type=pa.int64()),
            "n_hosts": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "n_pages": b.column("n_pages"),
            "max_host_pages": b.column("n_pages")})

    return sorted_group_aggregate(
        ranked.map_batches(assign, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["shard"], [("n_hosts", "sum"), ("n_pages", "sum"),
                    ("max_host_pages", "max")]).sort("shard")
