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


def corpus_content_tag(corpus_dir: str, files=None, extra: str = "") -> str:
    """Content-identity fingerprint for caches derived from a generated
    corpus: a pure function of the generator inputs (version, seed,
    n_pages) plus the shard basenames in play — NOT file mtimes.  The
    corpus content is fully determined by these, so a /tmp wipe or a
    driver-side regeneration produces the SAME tag for the same data
    (round 3 keyed derived checkpoints on mtime: every regeneration
    rebuilt them cold inside the driver's correctness window)."""
    import glob
    import hashlib

    meta = {}
    meta_path = os.path.join(corpus_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if files is None:
        files = sorted(glob.glob(os.path.join(corpus_dir, "pages",
                                              "*.parquet")))
    names = "|".join(os.path.basename(f) for f in sorted(files))
    if meta:
        key = (f"v{meta.get('version')}|s{meta.get('seed')}"
               f"|n{meta.get('n_pages')}|{names}|{extra}")
    else:
        # no meta.json: content identity is unknowable from generator
        # inputs, and shard basenames alone (standard pages_*.parquet
        # names) would let two distinct meta-less corpora collide on
        # one cache tag — fall back to a size/mtime fingerprint (the
        # pre-r4 keying) instead of hashing None placeholders
        stats = "|".join(
            f"{os.path.basename(f)}:{os.path.getsize(f)}:"
            f"{int(os.path.getmtime(f))}" for f in sorted(files))
        key = f"nometa|{stats}|{extra}"
    return hashlib.md5(key.encode()).hexdigest()[:10]


def _seed_models_from_assets(model_dir: str, tag: str, tagger: str,
                             corpus_dir: str | None = None) -> dict | None:
    """Restore pre-trained model artifacts shipped with the repo.

    ``build_models`` is a deterministic function of the corpus's CoNLL
    splits, which are themselves a pure function of
    ``(tag, seed, GENERATOR_VERSION)`` — so the trained artifacts can be
    shipped as repo assets and restored instead of retrained (the CRF
    SGD train alone costs ~30 s cold, which blew the driver's
    correctness-window budget in round 3).  Assets are keyed by
    ``{tag}_v{GENERATOR_VERSION}``; a version bump invalidates them and
    falls back to training (regenerate with
    ``python scripts/make_warm_assets.py``).
    Returns the ``models.json``-shaped path dict, or None if no asset
    covers the requested tagger(s) at the current version.
    """
    import shutil

    asset_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "models",
        f"{tag}_v{GENERATOR_VERSION}")
    meta_path = os.path.join(asset_dir, "asset.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("version") != GENERATOR_VERSION:
        return None
    # The asset was trained on the corpus generate_corpus() produces
    # for (tag, _SEED, _N_PAGES[tag], GENERATOR_VERSION).  Validate the
    # actual corpus's meta.json against those generator inputs: a
    # corpus regenerated under the same name with an edited seed or
    # n_pages (without a version bump) must fall back to training, not
    # silently receive models trained on different data.
    if corpus_dir is not None:
        cmeta_path = os.path.join(corpus_dir, "meta.json")
        if not os.path.exists(cmeta_path):
            return None
        with open(cmeta_path) as f:
            cmeta = json.load(f)
        if (cmeta.get("seed") != _SEED
                or cmeta.get("n_pages") != _N_PAGES.get(tag)
                or cmeta.get("version") != GENERATOR_VERSION):
            return None
    want = ["hmm", "crf"] if tagger == "both" else [tagger]
    if not all(t in meta.get("paths", {}) for t in want):
        return None
    os.makedirs(model_dir, exist_ok=True)
    out: dict = {}
    for t, langs in meta["paths"].items():
        out[t] = {}
        for lang, rel in langs.items():
            src = os.path.join(asset_dir, rel)
            dst = os.path.join(model_dir, rel)
            shutil.copyfile(src, dst)
            side = rel[:-len(".npz")] + ".json"      # CRF/transformer sidecar
            if os.path.exists(os.path.join(asset_dir, side)):
                shutil.copyfile(os.path.join(asset_dir, side),
                                os.path.join(model_dir, side))
            out[t][lang] = dst
    return out


def models_for_corpus(corpus_dir: str, tagger: str = "hmm") -> str:
    """Train-once-and-cache tagging models next to the corpus (seeded
    from repo assets when available — see _seed_models_from_assets)."""
    from ..pipelines.kg import build_models

    model_dir = os.path.join(corpus_dir, "models")
    marker = os.path.join(model_dir, "models.json")
    need = True
    if os.path.exists(marker):
        with open(marker) as f:
            m = json.load(f)
        need = tagger not in m or m.get("_version") != GENERATOR_VERSION
    if need:
        base = os.path.basename(os.path.normpath(corpus_dir))
        paths = (_seed_models_from_assets(model_dir, base, tagger,
                                          corpus_dir=corpus_dir)
                 if base in _N_PAGES else None)
        if paths is None:
            paths = build_models(corpus_dir, model_dir,
                                 tagger="both" if tagger == "both" else tagger)
        paths["_version"] = GENERATOR_VERSION
        if os.path.exists(marker):           # merge previously-built taggers
            with open(marker) as f:
                merged = json.load(f)
            merged.update(paths)
            paths = merged
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
