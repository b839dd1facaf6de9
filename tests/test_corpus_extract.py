"""Corpus generator determinism + the byte-identical extraction invariant."""

import os

import pyarrow.parquet as pq

from kgray.functions.html_text import html_to_text
from kgray.sources.corpus import generate_corpus


def test_generator_deterministic(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    ma = generate_corpus(str(a), n_pages=40, seed=11)
    mb = generate_corpus(str(b), n_pages=40, seed=11)
    assert ma == mb
    ta = pq.read_table(os.path.join(a, "pages", "part-00000.parquet"))
    tb = pq.read_table(os.path.join(b, "pages", "part-00000.parquet"))
    assert ta.equals(tb)
    tga = pq.read_table(os.path.join(a, "gold_triples.parquet"))
    tgb = pq.read_table(os.path.join(b, "gold_triples.parquet"))
    assert tga.equals(tgb)


def test_extraction_byte_identical(tiny_corpus_dir):
    """html_to_text(html) == text for every url (BASELINE.json input_hint)."""
    import glob
    n = 0
    for f in sorted(glob.glob(os.path.join(tiny_corpus_dir, "pages", "*.parquet"))):
        tbl = pq.read_table(f, columns=["url", "html", "text"])
        for url, html_b, expected in zip(tbl["url"].to_pylist(),
                                         tbl["html"].to_pylist(),
                                         tbl["text"].to_pylist()):
            got = html_to_text(html_b)
            assert got == expected, f"extraction drift for {url}:\n{got!r}\nvs\n{expected!r}"
            n += 1
    assert n > 0


def test_html_to_text_rules():
    html = (b"<html><!-- c --><head><style>p{}</style><title>My Title</title>"
            b"<script>if (1 < 2) track();</script></head>"
            b"<body><header>banner</header><nav><li>x</li></nav>"
            b"<div><p>hello  <b>world</b> &amp; friends</p><p></p></div>"
            b"<footer>foot</footer></body></html>")
    assert html_to_text(html) == "My Title\nhello world & friends"
    # whitespace collapse, entity unescape, empty-line drop
    assert html_to_text("<p>a  b</p><p> </p><p>c</p>") == "a b\nc"
    assert html_to_text(b"") == ""


def test_gold_triples_exist(tiny_corpus_dir):
    gt = pq.read_table(os.path.join(tiny_corpus_dir, "gold_triples.parquet"))
    assert gt.num_rows > 10
    preds = set(gt["pred"].to_pylist())
    assert "works_for" in preds and "located_in" in preds
    # head-entity skew is planted
    objs = gt.to_pydict()
    from collections import Counter
    support_by_obj = Counter()
    for o, s in zip(objs["obj"], objs["support"]):
        support_by_obj[o] += s
    assert support_by_obj.most_common(1)[0][0] == "Q:united_states"


def test_html_to_text_robustness():
    """Adversarial inputs: deterministic, no crashes, boilerplate gone."""
    cases = {
        b"<p>unclosed <b>bold": "unclosed bold",
        b"<script>while(1){if(a<b){}}": "",              # unclosed script dropped
        b"<SCRIPT SRC='x'>x</SCRIPT><P>Hi</P>": "Hi",     # case-insensitive
        b"<div>a<div>b<div>c": "a\nb\nc",
        b"<p>a &lt; b &amp;&amp; c &gt; d</p>": "a < b && c > d",
        b"<nav><p>menu item</p></nav><p>real</p>": "real",
        b"<!-- <p>commented out</p> --><p>kept</p>": "kept",
        "<p>émojis \U0001f389 und ümlauts</p>".encode(): "émojis \U0001f389 und ümlauts",
    }
    for raw, expected in cases.items():
        assert html_to_text(raw) == expected, raw
    # invalid utf-8 must not crash and must be deterministic
    got = html_to_text(b"\xff\xfe<p>ok</p>")
    assert got == html_to_text(b"\xff\xfe<p>ok</p>")
    assert "ok" in got
