"""Deterministic HTML → text extraction.

This function IS the engine's reference extractor: the corpus generator
renders HTML around known text lines, and the per-row invariant
(``BASELINE.json`` ``input_hint``) demands the pipeline recover those
lines byte-identically per url.  The NER reference has no HTML surface —
this is new engine surface pinned by the corpus's expected-``text``
column (SURVEY.md §7.4).

Rules (pure, order matters):
1. decode UTF-8 (errors → U+FFFD),
2. drop ``<!-- -->`` comments, then ``<script>/<style>/<nav>/<header>/
   <footer>/<aside>`` elements wholesale (boilerplate),
3. block-level tags open/close become ``\\n``; every other tag becomes
   the empty string,
4. unescape HTML entities,
5. per line: collapse whitespace runs to a single space, strip; drop
   empty lines; join with ``\\n``.
"""

from __future__ import annotations

import html as _html
import re

__all__ = ["html_to_text"]

_COMMENT = re.compile(r"<!--.*?-->", re.S)
_DROP = re.compile(
    r"<(script|style|nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.S | re.I,
)
_UNCLOSED_DROP = re.compile(r"<(?:script|style)\b[^>]*>.*$", re.S | re.I)
_BLOCK = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|title|head|body|html|"
    r"section|article|main|blockquote|pre|figure|figcaption|dl|dt|dd|hr)\b[^>]*/?>",
    re.I,
)
_ANY_TAG = re.compile(r"<[^>]+>")
_WS_RUN = re.compile(r"[ \t\r\f\v\u00a0]+")


def html_to_text(raw: bytes | str) -> str:
    """Extract visible text from HTML bytes; deterministic, stdlib-only."""
    s = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else raw
    s = _COMMENT.sub("", s)
    s = _DROP.sub("", s)
    s = _UNCLOSED_DROP.sub("", s)       # unclosed script/style runs to EOF
    s = _BLOCK.sub("\n", s)
    s = _ANY_TAG.sub("", s)
    s = _html.unescape(s)
    lines = []
    for line in s.split("\n"):
        line = _WS_RUN.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)
