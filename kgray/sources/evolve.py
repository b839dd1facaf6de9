"""Schema-evolution-tolerant parquet source.

Real ingestion directories mix file generations: an early pipeline
wrote events WITHOUT the ``props`` column, a later one added it.  A
naive ``read_parquet`` over the mixed directory either fails or pins
the first file's schema; the evolution-tolerant reader conforms every
epoch to the UNION schema by name — missing columns become typed nulls
(the SQL ``union_by_name`` rule) — so downstream stages see one stable
schema.

Tests/benchmarks use a deterministic evolved twin of the events table
(epoch 0 = rows with ``event_id % 3 == 0``, ``props`` column absent;
epoch 1 = the rest, full schema), cached under ``/tmp`` with the
mtime+size fingerprint and atomically published (the r2 ADVICE cache
rule).  Because the epoch split is a pure function of ``event_id``,
the SQL oracle reproduces the evolved semantics over the ORIGINAL
parquet view (``CASE WHEN event_id % 3 <> 0 THEN props END``) — no
/tmp paths in the oracle.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

__all__ = ["events_to_evolved", "read_events_evolved"]

_SHARDS_PER_EPOCH = 4


def _fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_mtime_ns}:{st.st_size}"


def events_to_evolved(sf_dir: str,
                      root: str = "/tmp/kgray_evolved") -> str:
    """Derive (once, cached) the two-epoch evolved twin of
    ``{sf_dir}/events.parquet``; returns the root directory holding
    ``epoch=0/`` (no ``props``) and ``epoch=1/`` (full schema)."""
    import shutil
    import tempfile

    src = f"{sf_dir}/events.parquet"
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(root, tag)
    done = os.path.join(out, "_DONE")
    fp = _fingerprint(src)
    if os.path.exists(done) and open(done).read().strip() == fp:
        return out

    tbl = pq.read_table(src)
    tbl = tbl.take(pc.sort_indices(tbl.column("event_id")))
    mod3 = pc.subtract(
        tbl.column("event_id"),
        pc.multiply(pc.divide(tbl.column("event_id"), 3), 3))
    is_old = pc.equal(mod3, 0)
    old = tbl.filter(is_old).drop_columns(["props"])
    new = tbl.filter(pc.invert(is_old))
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root)
    for epoch, part in ((0, old), (1, new)):
        d = os.path.join(tmp, f"epoch={epoch}")
        os.makedirs(d)
        n = part.num_rows
        step = -(-n // _SHARDS_PER_EPOCH)
        for i in range(_SHARDS_PER_EPOCH):
            pq.write_table(part.slice(i * step, step),
                           os.path.join(d, f"part-{i:04d}.parquet"))
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(fp + "\n")
    if os.path.exists(out):
        shutil.rmtree(out)
    os.replace(tmp, out)
    return out


def _epoch_dirs(root_dir: str) -> list:
    return sorted(os.path.join(root_dir, d) for d in os.listdir(root_dir)
                  if d.startswith("epoch="))


def _union_schema(dirs: list) -> pa.Schema:
    """Union-by-name of each epoch's file schema (first file per epoch
    — epochs are internally homogeneous by construction)."""
    fields: dict = {}
    order: list = []
    for d in dirs:
        f0 = sorted(p for p in os.listdir(d) if p.endswith(".parquet"))[0]
        s = pq.read_schema(os.path.join(d, f0))
        for name in s.names:
            if name not in fields:
                fields[name] = s.field(name).type
                order.append(name)
    return pa.schema([(n, fields[n]) for n in order])


class _Conform:
    """Null-fill missing columns and order to the target schema —
    picklable map_batches stage, vectorized (one pa.nulls per missing
    column per batch)."""

    def __init__(self, schema: pa.Schema):
        self.names = list(schema.names)
        self.types = {n: schema.field(n).type for n in schema.names}

    def __call__(self, b: pa.Table) -> pa.Table:
        cols = {}
        for n in self.names:
            if n in b.schema.names:
                cols[n] = b.column(n)
            else:
                cols[n] = pa.nulls(b.num_rows, type=self.types[n])
        return pa.table(cols)


def read_events_evolved(root_dir: str, columns=None):
    """Dataset over the mixed-schema directory, conformed to the union
    schema.  ``columns`` prunes at the parquet read per epoch (a column
    absent from an epoch is simply not requested there)."""
    import ray.data as rd

    dirs = _epoch_dirs(root_dir)
    schema = _union_schema(dirs)
    names = list(schema.names) if columns is None else list(columns)
    target = pa.schema([(n, schema.field(n).type) for n in names])
    parts = []
    for d in dirs:
        f0 = sorted(p for p in os.listdir(d) if p.endswith(".parquet"))[0]
        have = set(pq.read_schema(os.path.join(d, f0)).names)
        want = [n for n in names if n in have]
        parts.append(rd.read_parquet(d, columns=want)
                     .map_batches(_Conform(target), batch_format="pyarrow",
                                  zero_copy_batch=True))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds
