"""Label sets, smoothing constants and the predicate lexicon.

Tag sets follow the reference's label files (``/root/reference/English/tag.txt:1-17``,
``/root/reference/Chinese/tag.txt:1-17``) and their re-hardcoding in
``/root/reference/check.py:5-17``; report order is load-bearing there
(``check.py:38-40`` uses ``labels=sort_labels[1:]``, i.e. ``O`` excluded).
"""

from __future__ import annotations

# Smoothing used for initial-tag probabilities (reference: hmm_ner.py:7).
SMOOTHING_FACTOR = 1e-10

# CRF boundary tags (reference: crf_ner.py:12-13).
START_TAG = "<START>"
STOP_TAG = "<STOP>"

# English BIO tag set, reference order (check.py:5).
SORTED_LABELS_EN = [
    "O",
    "B-PER", "I-PER",
    "B-ORG", "I-ORG",
    "B-LOC", "I-LOC",
    "B-MISC", "I-MISC",
]

# Chinese BMES tag set, reference order (check.py:7-17).
SORTED_LABELS_ZH = [
    "O",
    "B-NAME", "M-NAME", "E-NAME", "S-NAME",
    "B-CONT", "M-CONT", "E-CONT", "S-CONT",
    "B-EDU", "M-EDU", "E-EDU", "S-EDU",
    "B-TITLE", "M-TITLE", "E-TITLE", "S-TITLE",
    "B-ORG", "M-ORG", "E-ORG", "S-ORG",
    "B-RACE", "M-RACE", "E-RACE", "S-RACE",
    "B-PRO", "M-PRO", "E-PRO", "S-PRO",
    "B-LOC", "M-LOC", "E-LOC", "S-LOC",
]

ENTITY_TYPES_EN = ["PER", "ORG", "LOC", "MISC"]

# Predicate lexicon for pattern-based triple extraction: the token phrase
# that must appear (lowercased, exactly) between two adjacent entity
# mentions, plus the subject/object entity-type constraints.  ``*`` means
# any type.  This is new engine surface (the reference has no relation
# extraction); it is shared verbatim by the Ray pipeline and the serial
# oracle extractor so the triple-parity gate is meaningful.
PREDICATE_LEXICON: list[tuple[tuple[str, ...], str, frozenset[str] | None, frozenset[str] | None]] = [
    (("works", "for"), "works_for", frozenset({"PER"}), frozenset({"ORG"})),
    (("is", "employed", "by"), "works_for", frozenset({"PER"}), frozenset({"ORG"})),
    (("is", "located", "in"), "located_in", None, frozenset({"LOC"})),
    (("is", "based", "in"), "located_in", None, frozenset({"LOC"})),
    (("is", "headquartered", "in"), "located_in", frozenset({"ORG"}), frozenset({"LOC"})),
    (("was", "born", "in"), "born_in", frozenset({"PER"}), frozenset({"LOC"})),
    (("is", "part", "of"), "part_of", None, None),
    (("is", "the", "capital", "of"), "capital_of", frozenset({"LOC"}), frozenset({"LOC"})),
    (("founded",), "founded", frozenset({"PER"}), frozenset({"ORG"})),
    (("acquired",), "acquired", frozenset({"ORG"}), frozenset({"ORG"})),
    (("visited",), "visited", frozenset({"PER"}), frozenset({"LOC"})),
    (("partnered", "with"), "partnered_with", frozenset({"ORG"}), frozenset({"ORG"})),
    # Chinese (char-level) phrases — gap tokens are single characters
    # (BMES/char tokenization, cf. /root/reference/Chinese/train.txt)
    (("就", "职", "于"), "works_for", frozenset({"PER"}), frozenset({"ORG"})),
    (("位", "于"), "located_in", frozenset({"ORG"}), frozenset({"LOC"})),
    (("出", "生", "于"), "born_in", frozenset({"PER"}), frozenset({"LOC"})),
    (("访", "问", "了"), "visited", frozenset({"PER"}), frozenset({"LOC"})),
    (("收", "购", "了"), "acquired", frozenset({"ORG"}), frozenset({"ORG"})),
    (("创", "办", "了"), "founded", frozenset({"PER"}), frozenset({"ORG"})),
]

PREDICATES = sorted({p[1] for p in PREDICATE_LEXICON})
