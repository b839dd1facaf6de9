"""JSONL (newline-delimited JSON) source — the lingua franca of web-
scale text corpora (one JSON object per line, gzip-shardable, appendable).

``ray.data.read_json`` handles sharded ``*.jsonl`` natively (one read
task per file, schema from Arrow's JSON reader), so the engine ingests
JSONL with the same streaming/pruning properties as parquet minus
column projection pushdown — JSONL always parses whole lines, which is
the format's cost, not the engine's.

For tests/benchmarks a deterministic JSONL twin of the parquet
``documents`` table is derived once per sf directory and cached under
``/tmp`` (content equals the parquet bytes, so any query over the
JSONL source can be oracled by the SAME SQL over the parquet view —
source parity, checked by the driver's value hash).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["documents_to_jsonl", "read_documents_jsonl"]

_N_SHARDS = 8


def documents_to_jsonl(sf_dir: str, root: str = "/tmp/kgray_jsonl") -> str:
    """Derive (once, cached) a sharded JSONL twin of
    ``{sf_dir}/documents.parquet``; returns the shard directory.
    Deterministic: shard = doc_id % N, rows in doc_id order, compact
    separators, sorted keys."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(root, tag)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    tbl = pq.read_table(f"{sf_dir}/documents.parquet")
    idx = pa.compute.sort_indices(tbl, sort_keys=[("doc_id", "ascending")])
    tbl = tbl.take(idx)
    rows = tbl.to_pylist()
    shards = [[] for _ in range(_N_SHARDS)]
    for r in rows:
        shards[r["doc_id"] % _N_SHARDS].append(r)
    for i, shard in enumerate(shards):
        with open(os.path.join(out, f"part-{i:04d}.jsonl"), "w",
                  encoding="utf-8") as f:
            for r in shard:
                f.write(json.dumps(r, separators=(",", ":"),
                                   sort_keys=True, ensure_ascii=False))
                f.write("\n")
    with open(done, "w") as f:
        f.write("ok\n")
    return out


def read_documents_jsonl(jsonl_dir: str, columns=None):
    """Stream the JSONL shards as a Dataset (one read task per shard).
    ``columns`` prunes AFTER parse (JSONL has no column pushdown)."""
    import ray.data as rd

    paths = sorted(
        os.path.join(jsonl_dir, f) for f in os.listdir(jsonl_dir)
        if f.endswith(".jsonl"))
    ds = rd.read_json(paths)
    if columns:
        ds = ds.map_batches(
            lambda b, _c=tuple(columns): b.select(list(_c)),
            batch_format="pyarrow", zero_copy_batch=True)
    return ds
