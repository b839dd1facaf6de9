"""CLI surface: gen-corpus, train, predict (reference-compatible), eval."""

import json
import subprocess
import sys


def _run(args, cwd="/root/repo"):
    return subprocess.run([sys.executable, "-m", "kgray", *args],
                          capture_output=True, text=True, cwd=cwd)


def test_gen_train_predict_eval(tmp_path):
    corpus = tmp_path / "corpus"
    r = _run(["gen-corpus", "--out", str(corpus), "--pages", "30", "--seed", "3"])
    assert r.returncode == 0, r.stderr
    meta = json.loads(r.stdout.strip().splitlines()[-1])
    assert meta["n_pages"] == 30

    models = tmp_path / "models"
    r = _run(["train", "--corpus", str(corpus), "--models", str(models),
              "--tagger", "hmm"])
    assert r.returncode == 0, r.stderr
    paths = json.loads(r.stdout.strip().splitlines()[-1])
    assert "hmm" in paths

    # predict on the validation split text file (words-only semantics)
    pred = tmp_path / "pred.txt"
    r = _run(["predict", "--model", paths["hmm"]["en"],
              "--input", str(corpus / "conll_valid.txt"),
              "--output", str(pred), "--tagger", "hmm"])
    assert r.returncode == 0, r.stderr
    assert pred.exists() and pred.read_text().strip()

    r = _run(["eval", "--gold", str(corpus / "conll_valid.txt"),
              "--pred", str(pred), "--lang", "en"])
    assert r.returncode == 0, r.stderr
    assert "micro avg" in r.stdout
    # quality sanity: the HMM should be very accurate on in-vocab data
    micro = [l for l in r.stdout.splitlines() if "micro avg" in l][0]
    f1 = float(micro.split("F1=")[1].split()[0])
    assert f1 > 0.85, r.stdout


def test_cli_query_list_and_run(ray_session, capsys):
    from kgray.cli import main

    assert main(["query"]) == 0
    listed = capsys.readouterr().out.split()
    assert "pricing_summary" in listed and len(listed) >= 100

    rc = main(["query", "distinct_segments",
               "--sf-dir", "/root/testdata/sf0.001"])
    assert rc is None or rc == 0
    out = capsys.readouterr().out
    assert "rows x" in out

    assert main(["query", "not_a_query"]) == 1
