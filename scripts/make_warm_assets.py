"""Build the repo-shipped pre-trained model assets.

``kgray/assets/models/{tag}_v{GENERATOR_VERSION}/`` holds the tagging
model artifacts (HMM / CRF / Transformer-CRF, en+zh) for the small-sf
derived corpora, so a cold machine (wiped /tmp) can seed its model
cache instantly instead of retraining (~30 s for the CRF SGD train —
round 3's driver correctness window timed out on exactly this).

The artifacts are a deterministic function of (tag, seed,
GENERATOR_VERSION): ``generate_corpus`` is seeded, ``train_hmm`` is
counting, ``train_crf_sgd`` is serial SGD over a fixed order, and the
transformer init is seeded Xavier.  Re-run this script whenever
GENERATOR_VERSION bumps:

    python scripts/make_warm_assets.py
"""
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgray.sources.corpus import GENERATOR_VERSION, generate_corpus  # noqa: E402
from kgray.pipelines.kg import build_models                          # noqa: E402
from kgray.sources.derived import _N_PAGES, _SEED                    # noqa: E402

ASSET_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "kgray", "assets", "models")

TAGS = ["sf0.001", "sf0.01"]        # the driver's smoke + correctness scales


def build_tag(tag: str) -> None:
    corpus = os.path.join("/tmp/kgray_corpus", tag)
    meta_path = os.path.join(corpus, "meta.json")
    ok = False
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            m = json.load(f)
        ok = (m.get("n_pages") == _N_PAGES[tag] and m.get("seed") == _SEED
              and m.get("version") == GENERATOR_VERSION)
    if not ok:
        generate_corpus(corpus, n_pages=_N_PAGES[tag], seed=_SEED,
                        pages_per_shard=max(100, _N_PAGES[tag] // 8))

    work = tempfile.mkdtemp(prefix=f"kgray_assets_{tag}_")
    paths: dict = {}
    for tagger in ("hmm", "crf", "transformer"):
        paths.update(build_models(corpus, work, tagger=tagger))

    out = os.path.join(ASSET_ROOT, f"{tag}_v{GENERATOR_VERSION}")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    rel_paths: dict = {}
    for tagger, langs in paths.items():
        rel_paths[tagger] = {}
        for lang, p in langs.items():
            rel = os.path.basename(p)
            shutil.copyfile(p, os.path.join(out, rel))
            side = p[:-len(".npz")] + ".json"
            if os.path.exists(side):
                shutil.copyfile(side, os.path.join(out, os.path.basename(side)))
            rel_paths[tagger][lang] = rel
    with open(os.path.join(out, "asset.json"), "w") as f:
        json.dump({"version": GENERATOR_VERSION, "tag": tag,
                   "paths": rel_paths}, f, indent=1)
    shutil.rmtree(work, ignore_errors=True)
    total = sum(os.path.getsize(os.path.join(out, f))
                for f in os.listdir(out))
    print(f"{tag}: {len(os.listdir(out))} files, {total/1e6:.1f} MB -> {out}")


if __name__ == "__main__":
    for tag in TAGS:
        build_tag(tag)
