"""ORC source — the columnar format of the Hive/Spark lakehouse
world (one ``.orc`` file per shard, stripe-oriented, written and read
here via ``pyarrow.orc``).

Ray 2.49 has no ``read_orc``, so the reader is the engine's own: one
decode task per shard file (``from_items(paths)`` → ``map_batches``
with ``batch_size=1``), preserving the per-file parallelism and
streaming backpressure of the other sources.  Column projection is
pushed into ``ORCFile.read(columns=...)`` — ORC is columnar, so
unneeded columns never leave the file (unlike the IPC reader, where
projection can only happen after the batch is materialized).

Tests/benchmarks use a deterministic ORC twin of the parquet
``orders`` table, derived once per sf directory and cached under
``/tmp`` with a source fingerprint (mtime+size — the r2 ADVICE cache
rule) and an atomic publish: content equals the parquet bytes, so any
query over the ORC source is oracled by the SAME SQL over the parquet
view (source parity via the driver's value hash, like the
CSV/JSONL/IPC/SQLite twins).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.orc as orc
import pyarrow.parquet as pq

__all__ = ["orders_to_orc", "read_orders_orc"]

_N_SHARDS = 8


def _fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_mtime_ns}:{st.st_size}"


def orders_to_orc(sf_dir: str, root: str = "/tmp/kgray_orc") -> str:
    """Derive (once, cached) a sharded ORC twin of
    ``{sf_dir}/orders.parquet``; returns the shard directory.
    Deterministic: shard = o_orderkey % N, rows in o_orderkey order."""
    import pyarrow.compute as pc

    src = f"{sf_dir}/orders.parquet"
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(root, tag)
    done = os.path.join(out, "_DONE")
    fp = _fingerprint(src)
    if os.path.exists(done) and open(done).read().strip() == fp:
        return out
    import shutil
    import tempfile

    tbl = pq.read_table(src)
    idx = pc.sort_indices(tbl, sort_keys=[("o_orderkey", "ascending")])
    tbl = tbl.take(idx)
    shard = pc.cast(
        pc.subtract(tbl.column("o_orderkey"),
                    pc.multiply(pc.divide(tbl.column("o_orderkey"),
                                          _N_SHARDS), _N_SHARDS)),
        pa.int64())
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root)
    # ORC has no us-precision timestamp — persist the source schema so
    # the reader can conform decoded stripes back to parquet types
    # (otherwise timestamp[us] comes back as timestamp[ns] and the
    # parity oracle breaks).
    pq.write_table(tbl.schema.empty_table(),
                   os.path.join(tmp, "_schema.parquet"))
    for i in range(_N_SHARDS):
        part = tbl.filter(pc.equal(shard, i))
        orc.write_table(part, os.path.join(tmp, f"part-{i:04d}.orc"))
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(fp + "\n")
    # atomic publish (r2 ADVICE rule: no partial/stale mixes)
    if os.path.exists(out):
        shutil.rmtree(out)
    os.replace(tmp, out)
    return out


def read_orders_orc(orc_dir: str, columns=None):
    """Dataset over the ORC shards — one decode task per file;
    projection pushed into the ORC stripe read itself."""
    import ray.data as rd

    paths = sorted(
        os.path.join(orc_dir, f) for f in os.listdir(orc_dir)
        if f.endswith(".orc"))
    schema = pq.read_schema(os.path.join(orc_dir, "_schema.parquet"))
    return rd.from_items([{"path": p} for p in paths]).map_batches(
        _DecodeShards(columns, schema), batch_size=1,
        batch_format="pyarrow")


class _DecodeShards:
    """Callable decode stage (picklable, one shard per batch);
    conforms ORC-decoded types (ns timestamps) back to the declared
    source schema."""

    def __init__(self, columns, schema: pa.Schema):
        self.columns = columns
        self.schema = schema

    def __call__(self, b: pa.Table) -> pa.Table:
        tables = []
        for path in b.column("path").to_pylist():
            f = orc.ORCFile(path)
            t = f.read(columns=self.columns)
            t = t.cast(pa.schema([self.schema.field(n)
                                  for n in t.schema.names]))
            tables.append(t)
        return pa.concat_tables(tables, promote_options="permissive")
