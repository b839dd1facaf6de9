"""Derived pages corpus per scale factor, cached under /tmp.

The driver's sf directories hold the TPC-H-ish tables; the KG pipeline's
``pages`` input (shape fixed by BASELINE.json ``input_hint``) is
synthesized deterministically at a size proportional to the scale
factor and cached so repeated queries()/bench calls don't regenerate.
"""

from __future__ import annotations

import json
import os

from .corpus import generate_corpus

__all__ = ["corpus_for_sf", "models_for_corpus"]

_N_PAGES = {"sf0.001": 240, "sf0.01": 1200, "sf0.1": 12000}
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
        if meta.get("n_pages") == n_pages and meta.get("seed") == _SEED:
            return out
    generate_corpus(out, n_pages=n_pages, seed=_SEED,
                    pages_per_shard=max(100, n_pages // 8))
    return out


def models_for_corpus(corpus_dir: str, tagger: str = "hmm") -> str:
    """Train-once-and-cache tagging models next to the corpus."""
    from ..pipelines.kg import build_models

    model_dir = os.path.join(corpus_dir, "models")
    marker = os.path.join(model_dir, "models.json")
    need = True
    if os.path.exists(marker):
        with open(marker) as f:
            need = tagger not in json.load(f)
    if need:
        build_models(corpus_dir, model_dir, tagger="both" if tagger == "both" else tagger)
    return model_dir
