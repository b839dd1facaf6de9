"""Pattern-based triple extraction over tagged sentences.

New engine surface (the reference stops at tags; SURVEY.md §3.5).  Pure
functions shared by the Ray stage and the serial oracle extractor.

Rule: for each *adjacent* pair of mentions in sentence order, if the
lowercased token gap between them equals a phrase in
``PREDICATE_LEXICON`` and the mention entity types satisfy the phrase's
constraints, emit ``(subj_surface, pred, obj_surface)``.
"""

from __future__ import annotations

from ..constants import PREDICATE_LEXICON
from .bio import decode_spans

__all__ = ["sentence_mentions", "extract_sentence_triples", "PHRASE_INDEX"]

# phrase tuple -> list of (pred, subj_types|None, obj_types|None)
PHRASE_INDEX: dict = {}
for phrase, pred, st, ot in PREDICATE_LEXICON:
    PHRASE_INDEX.setdefault(phrase, []).append((pred, st, ot))

_MAX_GAP = max(len(p) for p in PHRASE_INDEX)


def sentence_mentions(tokens, tags, scheme: str = "bio"):
    """[(begin, end, etype, surface)] for one sentence."""
    joiner = " " if scheme == "bio" else ""
    return [(b, e, t, joiner.join(tokens[b:e]))
            for b, e, t in decode_spans(tags, scheme)]


def extract_sentence_triples(tokens, mentions):
    """[(subj_surface, subj_type, pred, obj_surface, obj_type)] for one
    sentence given its mentions (output of :func:`sentence_mentions`)."""
    out = []
    for m1, m2 in zip(mentions, mentions[1:]):
        b1, e1, t1, s1 = m1
        b2, e2, t2, s2 = m2
        gap = b2 - e1
        if gap <= 0 or gap > _MAX_GAP:
            continue
        phrase = tuple(tok.lower() for tok in tokens[e1:b2])
        for pred, st, ot in PHRASE_INDEX.get(phrase, ()):
            if st is not None and t1 not in st:
                continue
            if ot is not None and t2 not in ot:
                continue
            out.append((s1, t1, pred, s2, t2))
            break                        # one predicate per mention pair
    return out
