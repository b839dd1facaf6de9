"""Span decoding, CoNLL I/O round-trips, and the P/R/F1 report."""

from kgray.kernels import bio, conll, evaluate


def test_bio_decode_basic():
    tags = ["B-PER", "I-PER", "O", "B-ORG", "B-LOC", "I-LOC"]
    assert bio.decode_bio(tags) == [(0, 2, "PER"), (3, 4, "ORG"), (4, 6, "LOC")]


def test_bio_decode_lenient():
    # I- after O starts a new span; I- with type change starts a new span
    assert bio.decode_bio(["O", "I-PER", "I-ORG"]) == [(1, 2, "PER"), (2, 3, "ORG")]
    assert bio.decode_bio(["B-PER", "B-PER"]) == [(0, 1, "PER"), (1, 2, "PER")]
    assert bio.decode_bio([]) == []
    assert bio.decode_bio(["O", "O"]) == []
    assert bio.decode_bio(["I-LOC"]) == [(0, 1, "LOC")]


def test_bmes_decode():
    tags = ["B-NAME", "M-NAME", "E-NAME", "O", "S-LOC", "B-ORG", "E-ORG"]
    assert bio.decode_bmes(tags) == [(0, 3, "NAME"), (4, 5, "LOC"), (5, 7, "ORG")]
    # malformed: M- at start begins a span; unterminated span flushes at end
    assert bio.decode_bmes(["M-EDU", "M-EDU"]) == [(0, 2, "EDU")]
    assert bio.decode_bmes(["E-LOC"]) == [(0, 1, "LOC")]


def test_conll_roundtrip():
    text = "Alice B-PER\nworks O\n\nBob B-PER\n"
    sw, st = conll.parse_labeled_text(text)
    assert sw == [["Alice", "works"], ["Bob"]]
    assert st == [["B-PER", "O"], ["B-PER"]]
    # tag is the LAST field (crf_ner.py:552)
    sw2, st2 = conll.parse_labeled_text("Alice NNP B-PER\n")
    assert sw2 == [["Alice"]] and st2 == [["B-PER"]]
    # words-only reader takes the first field (hmm_ner.py:147)
    assert conll.parse_words_text("Alice B-PER\nran O\n\nBob X\n") == [["Alice", "ran"], ["Bob"]]
    # writer: blank separators + empty-sentence passthrough (hmm_ner.py:151-160)
    out = conll.format_tagged([["a", "b"], [], ["c"]], [["O", "O"], [], ["B-LOC"]])
    assert out == "a O\nb O\n\n\nc B-LOC\n\n"


def test_classification_report_matches_sklearn_semantics():
    y_true = ["O", "B-PER", "B-PER", "I-PER", "B-ORG", "O"]
    y_pred = ["O", "B-PER", "B-ORG", "I-PER", "B-ORG", "B-PER"]
    rep = evaluate.classification_report(y_true, y_pred, ["B-PER", "I-PER", "B-ORG"])
    # B-PER: tp=1, pred=2, true=2 -> P=0.5 R=0.5
    assert rep["B-PER"]["precision"] == 0.5 and rep["B-PER"]["recall"] == 0.5
    # I-PER: perfect
    assert rep["I-PER"]["f1"] == 1.0
    # B-ORG: tp=1, pred=2, true=1
    assert rep["B-ORG"]["precision"] == 0.5 and rep["B-ORG"]["recall"] == 1.0
    assert rep["micro avg"]["support"] == 4  # true-label occurrences within the label set


def test_triple_prf():
    pred = {("a", "p", "b"), ("c", "p", "d")}
    gold = {("a", "p", "b"), ("e", "p", "f")}
    r = evaluate.triple_prf(pred, gold)
    assert r["precision"] == 0.5 and r["recall"] == 0.5
    assert evaluate.triple_prf(set(), set())["f1"] == 0.0
