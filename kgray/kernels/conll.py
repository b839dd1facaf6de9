"""CoNLL two-column text I/O, matching the reference readers/writers.

Semantics (reference S1-S3):
* blank line flushes the current sentence; a trailing sentence without a
  final blank line is still captured (``hmm_ner.py:22-35``).
* train reads ``(parts[0], parts[-1])`` — the tag is the *last*
  whitespace field (``crf_ner.py:551-552``).
* predict reads ``parts[0]`` only, silently ignoring any tags present
  (``hmm_ner.py:144-147``).
* the writer emits ``"<word> <tag>"`` lines with a blank separator after
  every sentence, and a bare newline for an empty sentence
  (``hmm_ner.py:151-160``).
"""

from __future__ import annotations

__all__ = ["read_labeled", "read_words", "write_tagged",
           "parse_labeled_text", "parse_words_text", "format_tagged"]


def parse_labeled_text(text: str):
    """Parse CoNLL text into (tokens_per_sentence, tags_per_sentence)."""
    sent_words, sent_tags = [], []
    cur_w, cur_t = [], []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            if cur_w:
                sent_words.append(cur_w)
                sent_tags.append(cur_t)
                cur_w, cur_t = [], []
            continue
        parts = line.split()
        cur_w.append(parts[0])
        cur_t.append(parts[-1])          # tag is last field (crf_ner.py:552)
    if cur_w:                            # trailing sentence (hmm_ner.py:34-35)
        sent_words.append(cur_w)
        sent_tags.append(cur_t)
    return sent_words, sent_tags


def parse_words_text(text: str):
    """Parse words-only CoNLL text into sentences of tokens.

    Note: unlike the labeled reader, consecutive blank lines do NOT
    produce empty sentences here either (the reference's readers skip
    them on input, hmm_ner.py:139-143; the *writer* reproduces blanks
    only for sentences already empty in memory, hmm_ner.py:153-155).
    """
    sentences, cur = [], []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            if cur:
                sentences.append(cur)
                cur = []
            continue
        parts = line.split()
        if parts:
            cur.append(parts[0])         # first field only (hmm_ner.py:147)
    if cur:
        sentences.append(cur)
    return sentences


def read_labeled(path: str):
    with open(path, "r", encoding="utf-8") as f:
        return parse_labeled_text(f.read())


def read_words(path: str):
    with open(path, "r", encoding="utf-8") as f:
        return parse_words_text(f.read())


def format_tagged(tokens_per_sentence, tags_per_sentence) -> str:
    """Render sentences back to CoNLL text (hmm_ner.py:151-160)."""
    out = []
    for words, tags in zip(tokens_per_sentence, tags_per_sentence):
        if not words:
            out.append("\n")             # empty-sentence passthrough
            continue
        for w, t in zip(words, tags):
            out.append(f"{w} {t}\n")
        out.append("\n")
    return "".join(out)


def write_tagged(path: str, tokens_per_sentence, tags_per_sentence) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(format_tagged(tokens_per_sentence, tags_per_sentence))
