"""Derived pages corpus per scale factor, cached under /tmp.

The driver's sf directories hold the TPC-H-ish tables; the KG pipeline's
``pages`` input (shape fixed by BASELINE.json ``input_hint``) is
synthesized deterministically at a size proportional to the scale
factor and cached so repeated queries()/bench calls don't regenerate.
"""

from __future__ import annotations

import json
import os

from .corpus import GENERATOR_VERSION, generate_corpus

__all__ = ["corpus_for_sf", "models_for_corpus"]

_N_PAGES = {"sf0.001": 240, "sf0.01": 1200, "sf0.1": 48000}
_SEED = 42


def _tag(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base in _N_PAGES else "sf0.01"


def corpus_for_sf(sf_dir: str, cache_root: str = "/tmp/kgray_corpus") -> str:
    """Return (generating if needed) the cached pages corpus for sf_dir."""
    tag = _tag(sf_dir)
    n_pages = _N_PAGES[tag]
    out = os.path.join(cache_root, tag)
    meta_path = os.path.join(out, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if (meta.get("n_pages") == n_pages and meta.get("seed") == _SEED
                and meta.get("version") == GENERATOR_VERSION):
            return out
    generate_corpus(out, n_pages=n_pages, seed=_SEED,
                    pages_per_shard=max(100, n_pages // 8))
    return out


def replicate_corpus(corpus_dir: str, out_dir: str, replicas: int) -> str:
    """Replicate a pages corpus R× with per-replica url prefixes.

    Round-1 scaling shortcut, superseded by the unique
    :func:`scaling_corpus` (replicated content keeps per-page compute
    real but not content diversity); retained for ad-hoc stress runs.
    """
    import glob
    import pyarrow as pa
    import pyarrow.parquet as pq
    import shutil

    base_meta = {}
    base_meta_path = os.path.join(corpus_dir, "meta.json")
    if os.path.exists(base_meta_path):
        with open(base_meta_path) as f:
            base_meta = json.load(f)
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            m = json.load(f)
            if (m.get("replicas") == replicas
                    and m.get("base_version") == base_meta.get("version")):
                return out_dir
    pages_dir = os.path.join(out_dir, "pages")
    shutil.rmtree(pages_dir, ignore_errors=True)
    os.makedirs(pages_dir, exist_ok=True)
    shard = 0
    for f in sorted(glob.glob(os.path.join(corpus_dir, "pages", "*.parquet"))):
        tbl = pq.read_table(f)
        urls = tbl["url"].to_pylist()
        for r in range(replicas):
            new_urls = pa.array([u.replace("https://", f"https://r{r}.", 1)
                                 for u in urls], type=pa.string())
            out = tbl.set_column(tbl.schema.get_field_index("url"), "url", new_urls)
            pq.write_table(out, os.path.join(pages_dir, f"part-{shard:05d}.parquet"))
            shard += 1
    # share side tables + models with the base corpus
    for name in ("aliases.parquet", "entity_embeddings.parquet",
                 "conll_train.parquet", "conll_valid.parquet",
                 "conll_train_zh.parquet", "conll_valid_zh.parquet",
                 "gold_triples.parquet"):
        src = os.path.join(corpus_dir, name)
        dst = os.path.join(out_dir, name)
        if os.path.exists(src):
            shutil.copyfile(src, dst)
    with open(meta_path, "w") as f:
        json.dump({"replicas": replicas, "base": corpus_dir, "n_shards": shard,
                   "base_version": base_meta.get("version")}, f)
    return out_dir


def scaling_corpus(sf_dir: str, n_pages: int = 480_000, seed: int = 77,
                   cache_root: str = "/tmp/kgray_corpus") -> str:
    """Unique compute-dominated corpus for the scaling benchmark.

    480k pages of UNIQUE generated content (~85 s to generate once,
    cached) — round 1 replicated a 12k-page corpus 40×, which kept
    per-page compute real but not content diversity; the north-rule
    efficiency number should come from a corpus whose canonicalization
    keys and vocab scale with the data.  ``sf_dir`` is accepted for
    interface symmetry; the corpus is independent of the sf tables.
    """
    out = os.path.join(cache_root, f"scale_u{n_pages}")
    meta_path = os.path.join(out, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if (meta.get("n_pages") == n_pages and meta.get("seed") == seed
                and meta.get("version") == GENERATOR_VERSION):
            return out
    generate_corpus(out, n_pages=n_pages, seed=seed,
                    pages_per_shard=max(500, n_pages // 64))
    return out


def models_for_corpus(corpus_dir: str, tagger: str = "hmm") -> str:
    """Train-once-and-cache tagging models next to the corpus."""
    from ..pipelines.kg import build_models

    model_dir = os.path.join(corpus_dir, "models")
    marker = os.path.join(model_dir, "models.json")
    need = True
    if os.path.exists(marker):
        with open(marker) as f:
            m = json.load(f)
        need = tagger not in m or m.get("_version") != GENERATOR_VERSION
    if need:
        paths = build_models(corpus_dir, model_dir,
                             tagger="both" if tagger == "both" else tagger)
        paths["_version"] = GENERATOR_VERSION
        with open(marker, "w") as f:
            json.dump(paths, f)
    return model_dir


def pages_dataset(sf_dir: str, columns=("url", "text", "lang")):
    """Dataset over the derived web corpus's pages (the shared reader
    for every pipeline that scores/classifies pages)."""
    import ray.data as rd

    from ..pipelines.kg import page_files

    return rd.read_parquet(page_files(corpus_for_sf(sf_dir)),
                           columns=list(columns))
