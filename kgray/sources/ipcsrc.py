"""Arrow IPC (Feather v2) source — the zero-copy interchange format
used when corpora move between engines without a parquet round trip
(one ``.arrow`` file per shard, record batches mmap-able).

Ray 2.49 has no ``read_ipc``, so the reader is the engine's own: one
read task per shard (``from_items(paths)`` → ``flat_map`` decode),
which preserves the per-file parallelism and streaming properties of
the other sources.  Column projection happens at decode time —
``RecordBatchFileReader`` reads whole batches (the format's cost, not
the engine's); select early so only the needed columns flow on.

Tests/benchmarks use a deterministic IPC twin of the parquet
``documents`` table, derived once per sf directory and cached under
``/tmp`` with a source fingerprint (mtime+size — the r2 ADVICE cache
rule): content equals the parquet bytes, so any query over the IPC
source is oracled by the SAME SQL over the parquet view (source
parity via the driver's value hash).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.ipc as ipc
import pyarrow.parquet as pq

__all__ = ["documents_to_ipc", "read_documents_ipc"]

_N_SHARDS = 8


def _fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_mtime_ns}:{st.st_size}"


def documents_to_ipc(sf_dir: str, root: str = "/tmp/kgray_ipc") -> str:
    """Derive (once, cached) a sharded Arrow-IPC twin of
    ``{sf_dir}/documents.parquet``; returns the shard directory.
    Deterministic: shard = doc_id % N, rows in doc_id order."""
    import pyarrow.compute as pc

    src = f"{sf_dir}/documents.parquet"
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(root, tag)
    done = os.path.join(out, "_DONE")
    fp = _fingerprint(src)
    if os.path.exists(done) and open(done).read().strip() == fp:
        return out
    import shutil
    import tempfile

    tbl = pq.read_table(src)
    idx = pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")])
    tbl = tbl.take(idx)
    shard = pc.cast(
        pc.subtract(tbl.column("doc_id"),
                    pc.multiply(pc.divide(tbl.column("doc_id"), _N_SHARDS),
                                _N_SHARDS)), pa.int64())
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root)
    for i in range(_N_SHARDS):
        part = tbl.filter(pc.equal(shard, i))
        with ipc.new_file(os.path.join(tmp, f"part-{i:04d}.arrow"),
                          part.schema) as w:
            w.write_table(part)
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(fp + "\n")
    # atomic publish (r2 ADVICE rule: no partial/stale mixes)
    if os.path.exists(out):
        shutil.rmtree(out)
    os.replace(tmp, out)
    return out


def read_documents_ipc(ipc_dir: str, columns=None):
    """Dataset over the IPC shards — one decode task per file
    (``batch_size=1`` over the path list keeps shard = task)."""
    import ray.data as rd

    paths = sorted(
        os.path.join(ipc_dir, f) for f in os.listdir(ipc_dir)
        if f.endswith(".arrow"))
    return rd.from_items([{"path": p} for p in paths]).map_batches(
        _DecodeShards(columns), batch_size=1, batch_format="pyarrow")


class _DecodeShards:
    """Callable decode stage (picklable, one shard per batch)."""

    def __init__(self, columns):
        self.columns = columns

    def __call__(self, b: pa.Table) -> pa.Table:
        tables = []
        for path in b.column("path").to_pylist():
            with ipc.open_file(path) as r:
                t = r.read_all()
            if self.columns is not None:
                t = t.select(self.columns)
            tables.append(t)
        return pa.concat_tables(tables, promote_options="permissive")
