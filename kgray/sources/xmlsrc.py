"""XML source — the legacy-feed ingest path (stdlib ``xml.etree``;
the "vendor drops nightly XML exports" shape that every enterprise
pipeline eventually meets).

Layout and read discipline match the other file twins (CSV/JSONL/
SQLite): MANY shard files because XML has no splittable structure —
the parallelism unit is the file, one Ray decode task per shard, each
emitting a typed Arrow table so the ingest streams with normal
backpressure.  XML is by far the most expensive of the twins to parse
(tag soup, no column pruning possible) — that cost is the format's,
not the engine's, and the stats query downstream is identical.

For tests/benchmarks a deterministic XML twin of the parquet
``events`` table is derived once per sf directory and cached under
``/tmp`` (shard = event_id % N, rows in event_id order).  Floats are
serialized with ``repr`` (shortest round-trip) so the parsed table is
value-identical to the parquet source and any query over the XML twin
is oracled by the SAME SQL over the parquet view.
"""

from __future__ import annotations

import os
from xml.sax.saxutils import escape

import pyarrow.compute as pc
import pyarrow.parquet as pq

__all__ = ["events_to_xml", "read_events_xml"]

_N_SHARDS = 8
_COLS = ("event_id", "user_id", "event_type", "value")


def events_to_xml(sf_dir: str, root: str = "/tmp/kgray_xml") -> str:
    """Derive (once, cached) sharded XML twins of
    ``{sf_dir}/events.parquet``.  Shard filenames are deterministic and
    rewritten in full, so a crash mid-derive is healed by the rerun
    (same discipline as the CSV/SQLite twins)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(root, tag)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    tbl = pq.read_table(f"{sf_dir}/events.parquet", columns=list(_COLS))
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("event_id",
                                                    "ascending")]))
    rows = tbl.to_pylist()
    shards = [[] for _ in range(_N_SHARDS)]
    for r in rows:
        shards[r["event_id"] % _N_SHARDS].append(r)
    for i, shard in enumerate(shards):
        path = os.path.join(out, f"part-{i:04d}.xml")
        with open(path, "w", encoding="utf-8") as f:
            f.write('<?xml version="1.0" encoding="UTF-8"?>\n<events>\n')
            for r in shard:
                f.write("  <event>"
                        f'<event_id>{r["event_id"]}</event_id>'
                        f'<user_id>{r["user_id"]}</user_id>'
                        f'<event_type>{escape(r["event_type"])}</event_type>'
                        f'<value>{r["value"]!r}</value>'
                        "</event>\n")
            f.write("</events>\n")
    with open(done, "w") as f:
        f.write("ok\n")
    return out


def read_events_xml(xml_dir: str):
    """Stream the shard files as a Dataset — one decode task per .xml
    file; each task parses its shard with stdlib ElementTree and emits
    one typed Arrow table (explicit schema — XML carries no types at
    all, so the source declares them)."""
    import pyarrow as pa
    import ray.data as rd

    paths = sorted(
        os.path.join(xml_dir, f) for f in os.listdir(xml_dir)
        if f.endswith(".xml"))

    def read_one(batch: pa.Table) -> pa.Table:
        import xml.etree.ElementTree as ET

        out = []
        for path in batch.column("path").to_pylist():
            tree = ET.parse(path)
            eids, uids, types, vals = [], [], [], []
            for ev in tree.getroot().iter("event"):
                eids.append(int(ev.findtext("event_id")))
                uids.append(int(ev.findtext("user_id")))
                types.append(ev.findtext("event_type"))
                vals.append(float(ev.findtext("value")))
            out.append(pa.table({
                "event_id": pa.array(eids, type=pa.int64()),
                "user_id": pa.array(uids, type=pa.int64()),
                "event_type": pa.array(types, type=pa.string()),
                "value": pa.array(vals, type=pa.float64())}))
        return pa.concat_tables(out) if out else pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "event_type": pa.array([], type=pa.string()),
            "value": pa.array([], type=pa.float64())})

    return (rd.from_items([{"path": p} for p in paths])
            .repartition(len(paths))
            .map_batches(read_one, batch_format="pyarrow", batch_size=1))
