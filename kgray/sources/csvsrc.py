"""CSV source — the other ubiquitous interchange format next to JSONL
(``sources/jsonl.py``).

``ray.data.read_csv`` shards one read task per file over Arrow's CSV
reader; like JSONL, CSV has no column-projection pushdown (every byte
of a row is parsed), which is the format's cost, not the engine's —
the engine-side ``columns`` prune still cuts what enters the stream.

For tests/benchmarks a deterministic CSV twin of the parquet ``events``
table is derived once per sf directory and cached under ``/tmp``.
Floats are serialized with ``repr`` (shortest round-trip), ints and
strings verbatim, and the event_type values contain no delimiters or
quotes, so the parsed table is value-identical to the parquet source —
any query over the CSV can be oracled by the SAME SQL over the parquet
view (source parity, checked by the driver's value hash).
"""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

__all__ = ["events_to_csv", "read_events_csv"]

_N_SHARDS = 8
_COLS = ("event_id", "user_id", "event_type", "value")


def events_to_csv(sf_dir: str, root: str = "/tmp/kgray_csv") -> str:
    """Derive (once, cached) a sharded CSV twin of
    ``{sf_dir}/events.parquet`` (columns event_id, user_id, event_type,
    value).  Deterministic: shard = event_id % N, rows in event_id
    order."""
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
    header = ",".join(_COLS)
    for i, shard in enumerate(shards):
        with open(os.path.join(out, f"part-{i:04d}.csv"), "w",
                  encoding="utf-8") as f:
            f.write(header + "\n")
            for r in shard:
                f.write(f'{r["event_id"]},{r["user_id"]},'
                        f'{r["event_type"]},{r["value"]!r}\n')
    with open(done, "w") as f:
        f.write("ok\n")
    return out


def read_events_csv(csv_dir: str):
    """Stream the CSV shards as a Dataset (one read task per shard),
    with explicit column types so inference can never drift from the
    parquet schema."""
    import pyarrow as pa
    import ray.data as rd
    from pyarrow import csv as pacsv

    paths = sorted(
        os.path.join(csv_dir, f) for f in os.listdir(csv_dir)
        if f.endswith(".csv"))
    convert = pacsv.ConvertOptions(column_types={
        "event_id": pa.int64(), "user_id": pa.int64(),
        "event_type": pa.string(), "value": pa.float64()})
    return rd.read_csv(paths, convert_options=convert)
