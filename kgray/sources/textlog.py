"""Raw text-line log source — the third interchange format next to
JSONL and CSV: unstructured ``read_text`` lines parsed back into
columns with ONE vectorized RE2 kernel (``pc.extract_regex``), the
classic log-ingest shape (syslog / app logs / crawler logs).

A deterministic log-line twin of the parquet ``events`` table is
derived once per sf directory and cached under ``/tmp``.  Floats are
serialized with ``repr`` (shortest round-trip) and Arrow's
string→double cast is a correctly-rounded strtod, so the parsed table
is value-identical to the parquet source — any query over the log
lines can be oracled by the SAME SQL over the parquet view (source
parity, the ``csvsrc.py`` trick).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

__all__ = ["events_to_log", "read_events_log"]

_N_SHARDS = 8
_LINE_RE = (r"^evt id=(?P<event_id>\d+) user=(?P<user_id>\d+) "
            r"type=(?P<event_type>\S+) value=(?P<value>\S+)$")


def events_to_log(sf_dir: str, root: str = "/tmp/kgray_textlog") -> str:
    """Derive (once, cached) sharded ``.log`` files from
    ``{sf_dir}/events.parquet``.  Deterministic: shard = event_id % N,
    rows in event_id order."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(root, tag)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    tbl = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["event_id", "user_id", "event_type",
                                 "value"])
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("event_id",
                                                    "ascending")]))
    rows = tbl.to_pylist()
    shards = [[] for _ in range(_N_SHARDS)]
    for r in rows:
        shards[r["event_id"] % _N_SHARDS].append(r)
    for i, shard in enumerate(shards):
        with open(os.path.join(out, f"part-{i:04d}.log"), "w",
                  encoding="utf-8") as f:
            for r in shard:
                f.write(f'evt id={r["event_id"]} user={r["user_id"]} '
                        f'type={r["event_type"]} value={r["value"]!r}\n')
    with open(done, "w") as f:
        f.write("ok\n")
    return out


def read_events_log(log_dir: str):
    """Stream the log shards with ``read_text`` (one task per file) and
    parse every line back to typed columns with a single vectorized
    RE2 kernel — no per-row Python in the parse."""
    import ray.data as rd

    paths = sorted(
        os.path.join(log_dir, f) for f in os.listdir(log_dir)
        if f.endswith(".log"))
    ds = rd.read_text(paths)

    def parse(batch: pa.Table) -> pa.Table:
        hit = pc.extract_regex(batch.column("text"), _LINE_RE)
        if batch.num_rows == 0:
            return pa.table({
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "value": pa.array([], type=pa.float64())})
        return pa.table({
            "event_id": pc.cast(pc.struct_field(hit, "event_id"),
                                pa.int64()),
            "user_id": pc.cast(pc.struct_field(hit, "user_id"),
                               pa.int64()),
            "event_type": pc.struct_field(hit, "event_type"),
            "value": pc.cast(pc.struct_field(hit, "value"),
                             pa.float64())})

    return ds.map_batches(parse, batch_format="pyarrow",
                          zero_copy_batch=True)
