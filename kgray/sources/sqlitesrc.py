"""SQLite source — the embedded-database ingest path (stdlib
``sqlite3``; the common "export the ops database and load it" shape).

Layout matches how SQLite actually scales out: MANY database files
(one per shard), because a single .db file is a byte-serialized B-tree
with no parallel scan — the parallelism unit is the file.  The read is
one Ray task per shard database: each task opens its file locally,
runs one ordered SELECT, and emits a typed Arrow table, so the
ingest streams with the same backpressure as any other source.

For tests/benchmarks a deterministic SQLite twin of the parquet
``events`` table is derived once per sf directory and cached under
``/tmp`` (shard = event_id % N, rows inserted in event_id order —
byte-stable files).  REAL values round-trip exactly (SQLite stores
IEEE doubles), so any query over the SQLite twin is oracled by the
SAME SQL over the parquet view — source parity via the driver's value
hash, like the CSV/JSONL/IPC twins.
"""

from __future__ import annotations

import os
import sqlite3

import pyarrow.compute as pc
import pyarrow.parquet as pq

__all__ = ["events_to_sqlite", "read_events_sqlite"]

_N_SHARDS = 8
_COLS = ("event_id", "user_id", "event_type", "value")


def events_to_sqlite(sf_dir: str, root: str = "/tmp/kgray_sqlite") -> str:
    """Derive (once, cached) sharded SQLite twins of
    ``{sf_dir}/events.parquet``."""
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
        shards[r["event_id"] % _N_SHARDS].append(
            (r["event_id"], r["user_id"], r["event_type"], r["value"]))
    for i, shard in enumerate(shards):
        path = os.path.join(out, f"part-{i:04d}.db")
        if os.path.exists(path):
            os.remove(path)
        con = sqlite3.connect(path)
        con.execute("CREATE TABLE events (event_id INTEGER, "
                    "user_id INTEGER, event_type TEXT, value REAL)")
        con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", shard)
        con.commit()
        con.close()
    with open(done, "w") as f:
        f.write("ok\n")
    return out


def read_events_sqlite(db_dir: str):
    """Stream the shard databases as a Dataset — one read task per .db
    file; each task opens its shard locally and emits one typed Arrow
    table (explicit schema: SQLite's dynamic typing can never drift
    the column types)."""
    import pyarrow as pa
    import ray.data as rd

    paths = sorted(
        os.path.join(db_dir, f) for f in os.listdir(db_dir)
        if f.endswith(".db"))

    def read_one(batch: pa.Table) -> pa.Table:
        import sqlite3 as sq

        out = []
        for path in batch.column("path").to_pylist():
            con = sq.connect(path)
            cur = con.execute("SELECT event_id, user_id, event_type, "
                              "value FROM events ORDER BY event_id")
            rows = cur.fetchall()
            con.close()
            out.append(pa.table({
                "event_id": pa.array([r[0] for r in rows],
                                     type=pa.int64()),
                "user_id": pa.array([r[1] for r in rows],
                                    type=pa.int64()),
                "event_type": pa.array([r[2] for r in rows],
                                       type=pa.string()),
                "value": pa.array([r[3] for r in rows],
                                  type=pa.float64())}))
        return pa.concat_tables(out) if out else pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "event_type": pa.array([], type=pa.string()),
            "value": pa.array([], type=pa.float64())})

    return (rd.from_items([{"path": p} for p in paths])
            .repartition(len(paths))
            .map_batches(read_one, batch_format="pyarrow", batch_size=1))
