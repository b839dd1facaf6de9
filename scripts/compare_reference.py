"""Head-to-head vs the actual reference script on identical data.

Builds the sf0.1 pipeline's English sentence workload (~80k sentences),
trains BOTH the reference ``hmm_ner.py`` CLI and our kernel on the same
CoNLL file, times prediction on the same input, and asserts tag-for-tag
parity of the outputs.

Usage: python scripts/compare_reference.py [corpus_dir]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/hmm_ner.py"


def main():
    from kgray.functions.html_text import html_to_text
    from kgray.kernels import conll, hmm
    from kgray.sources.derived import corpus_for_sf
    from kgray.stages.extract import tokenize_line

    corpus = sys.argv[1] if len(sys.argv) > 1 else corpus_for_sf("/root/testdata/sf0.1")
    sents = []
    for f in sorted(glob.glob(os.path.join(corpus, "pages", "*.parquet"))):
        import pyarrow.parquet as pq
        t = pq.read_table(f, columns=["html", "lang"])
        for h, l in zip(t["html"].to_pylist(), t["lang"].to_pylist()):
            if l != "en":
                continue
            for line in html_to_text(h).split("\n"):
                tk = tokenize_line(line, l)
                if tk:
                    sents.append(tk)
    n = len(sents)
    d = tempfile.mkdtemp(prefix="ref_compare_")
    pred_in = os.path.join(d, "predict_in.txt")
    conll.write_tagged(pred_in, sents, [["O"] * len(s) for s in sents])
    train_txt = os.path.join(corpus, "conll_train.txt")

    # ---- reference CLI
    t0 = time.perf_counter()
    subprocess.run([sys.executable, REF, "train", "--input", train_txt,
                    "--model", os.path.join(d, "m.pkl")],
                   check=True, capture_output=True)
    ref_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    subprocess.run([sys.executable, REF, "predict", "--model", os.path.join(d, "m.pkl"),
                    "--input", pred_in, "--output", os.path.join(d, "ref_out.txt")],
                   check=True, capture_output=True)
    ref_pred = time.perf_counter() - t0

    # ---- our kernel (single core)
    sw, st = conll.read_labeled(train_txt)
    t0 = time.perf_counter()
    model = hmm.train_hmm(sw, st)
    our_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    tags = hmm.viterbi_batch(sents, model)
    our_pred = time.perf_counter() - t0

    # ---- parity
    ref_sents, ref_tags = conll.parse_labeled_text(
        open(os.path.join(d, "ref_out.txt"), encoding="utf-8").read())
    assert ref_sents == sents
    match = sum(a == b for ta, tb in zip(tags, ref_tags) for a, b in zip(ta, tb))
    total = sum(len(t) for t in tags)

    print(json.dumps({
        "sentences": n, "tokens": total,
        "reference_train_sec": round(ref_train, 2),
        "reference_predict_sec": round(ref_pred, 2),
        "reference_sentences_per_sec": round(n / ref_pred, 0),
        "kgray_train_sec": round(our_train, 2),
        "kgray_predict_sec_1core": round(our_pred, 2),
        "kgray_sentences_per_sec_1core": round(n / our_pred, 0),
        "single_core_speedup": round(ref_pred / our_pred, 2),
        "tags_identical": match == total,
        "tag_match": f"{match}/{total}",
    }))


if __name__ == "__main__":
    main()
