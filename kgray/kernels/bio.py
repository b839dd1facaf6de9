"""Tag-sequence → entity-span decoding (BIO for English, BMES for Chinese).

The reference never materializes spans — the B-/I- semantics are defined
by its label files (``/root/reference/English/tag.txt:1-17``,
``Chinese/tag.txt``) and implied by its evaluation.  This operator makes
them explicit (SURVEY.md §2 M8).  Decoding rules are deterministic and
shared by the Ray stage and the serial oracle:

BIO: ``B-X`` starts a span; ``I-X`` continues a span of the same type,
else (after ``O``, start-of-sentence, or a different type) it *starts* a
new span (lenient decode).  ``O`` closes any open span.

BMES: ``B-X`` begins, ``M-X`` continues, ``E-X`` ends a multi-char span;
``S-X`` is a single-char span.  Malformed continuations start new spans.
"""

from __future__ import annotations

__all__ = ["decode_bio", "decode_bmes", "decode_spans"]


def decode_bio(tags: list) -> list:
    """Return list of (begin, end, etype) half-open token spans."""
    spans = []
    start = -1
    etype = None
    for i, tag in enumerate(tags):
        if tag == "O" or tag is None:
            if start >= 0:
                spans.append((start, i, etype))
                start, etype = -1, None
            continue
        marker, _, t = tag.partition("-")
        if marker == "B" or start < 0 or t != etype:
            if start >= 0:
                spans.append((start, i, etype))
            start, etype = i, t
        # else: I- continuing same type — extend
    if start >= 0:
        spans.append((start, len(tags), etype))
    return spans


def decode_bmes(tags: list) -> list:
    """BMES span decode (Chinese char-level, tag set per Chinese/tag.txt)."""
    spans = []
    start = -1
    etype = None

    def flush(end):
        nonlocal start, etype
        if start >= 0:
            spans.append((start, end, etype))
        start, etype = -1, None

    for i, tag in enumerate(tags):
        if tag == "O" or tag is None:
            flush(i)
            continue
        marker, _, t = tag.partition("-")
        if marker == "B":
            flush(i)
            start, etype = i, t
        elif marker == "S":
            flush(i)
            spans.append((i, i + 1, t))
        elif marker in ("M", "E"):
            if start < 0 or t != etype:
                flush(i)
                start, etype = i, t
            if marker == "E":
                flush(i + 1)
    flush(len(tags))
    return spans


def decode_spans(tags: list, scheme: str = "bio") -> list:
    return decode_bio(tags) if scheme == "bio" else decode_bmes(tags)
