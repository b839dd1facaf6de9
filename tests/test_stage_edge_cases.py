"""Stage-level edge cases: empty/degenerate pages flow through the
pipeline stages without error."""

import pyarrow as pa

from kgray.stages.extract import check_extraction, extract_text, split_sentences
from kgray.stages.kg import decode_mentions, extract_triples


def test_empty_and_degenerate_pages():
    batch = pa.table({
        "url": ["u1", "u2", "u3", "u4"],
        "html": [b"", b"<script>only noise</script>", b"<p>Alice works for Acme .</p>",
                 "<p>中文</p>".encode()],
        "lang": ["en", "en", "en", "zh"],
        "text": ["", "", "Alice works for Acme .", "中文"],
    })
    extracted = extract_text(batch)
    assert extracted.num_rows == 4
    assert extracted.column("text_extracted").to_pylist()[0] == ""

    ok = check_extraction(batch)
    assert ok.column("ok").to_pylist() == [True, True, True, True]

    sentences = split_sentences(extracted)
    # empty pages contribute no sentences; zh page char-tokenizes
    assert sentences.num_rows == 2
    toks = sentences.column("tokens").to_pylist()
    assert ["中", "文"] in toks

    tagged = pa.table({
        "url": sentences.column("url"),
        "sent_id": sentences.column("sent_id"),
        "tokens": sentences.column("tokens"),
        "tags": pa.array([["O"] * len(t) for t in toks], type=pa.list_(pa.string())),
        "lang": sentences.column("lang"),
    })
    mentions = decode_mentions(tagged)
    assert mentions.num_rows == 0            # all-O → no mentions
    triples = extract_triples(tagged)
    assert triples.num_rows == 0


def test_empty_batches_through_stages():
    empty = pa.table({
        "url": pa.array([], type=pa.string()),
        "html": pa.array([], type=pa.binary()),
        "lang": pa.array([], type=pa.string()),
    })
    e = extract_text(empty)
    assert e.num_rows == 0
    s = split_sentences(e)
    assert s.num_rows == 0
    tagged = pa.table({
        "url": pa.array([], type=pa.string()),
        "sent_id": pa.array([], type=pa.int32()),
        "tokens": pa.array([], type=pa.list_(pa.string())),
        "tags": pa.array([], type=pa.list_(pa.string())),
        "lang": pa.array([], type=pa.string()),
    })
    assert decode_mentions(tagged).num_rows == 0
    assert extract_triples(tagged).num_rows == 0
