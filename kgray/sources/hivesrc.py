"""Hive-partitioned parquet source — the directory-encoded partition
layout (``event_type=<v>/part-*.parquet``) every lakehouse engine
writes, with **partition pruning at the directory level**: a query
filtered on the partition column never opens (or even lists) files of
other partitions.  This is the third pruning layout next to the
range/zone-map layout and the z-order layout (`stages/layout.py`) —
those prune on *file statistics*, this one prunes on the *path*.

The partition column is not stored in the data files (hive
convention); the reader re-attaches it as a constant per partition
directory, so the decoded table is value-identical to the flat
parquet source.  ``pruned_files`` exposes the prune decision for
tests, mirroring ``layout.files_overlapping``.

Tests/benchmarks use a deterministic hive twin of the parquet
``events`` table, derived once per sf directory and cached under
``/tmp`` with a source fingerprint + atomic publish (the r2 ADVICE
cache rule).  Any query over the hive source is oracled by the SAME
SQL over the flat parquet view (source parity via the driver's value
hash).

At 100 TB: partitioning by a low-cardinality column (event type, day,
language) is the first prune every warehouse query relies on — the
scan cost of a one-partition query is O(partition), not O(corpus),
and the layout is exactly what `write_parquet(partition_cols=...)`
emits on a real cluster.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["events_to_hive", "read_events_hive", "pruned_files"]

_FILES_PER_PART = 4
_PART_COL = "event_type"


def _fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_mtime_ns}:{st.st_size}"


def events_to_hive(sf_dir: str, root: str = "/tmp/kgray_hive") -> str:
    """Derive (once, cached) a hive-partitioned twin of
    ``{sf_dir}/events.parquet``: ``event_type=<v>/part-<k>.parquet``,
    partition column dropped from the files (hive convention), rows
    sharded by ``event_id % k`` in event_id order — byte-stable."""
    import pyarrow.compute as pc

    src = f"{sf_dir}/events.parquet"
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(root, tag)
    done = os.path.join(out, "_DONE")
    fp = _fingerprint(src)
    if os.path.exists(done) and open(done).read().strip() == fp:
        return out
    import shutil
    import tempfile

    tbl = pq.read_table(src)
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("event_id", "ascending")]))
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root)
    for v in pc.unique(tbl.column(_PART_COL)).to_pylist():
        part = tbl.filter(pc.equal(tbl.column(_PART_COL), v))
        part = part.drop_columns([_PART_COL])
        pdir = os.path.join(tmp, f"{_PART_COL}={v}")
        os.makedirs(pdir)
        shard = pc.cast(
            pc.subtract(part.column("event_id"),
                        pc.multiply(pc.divide(part.column("event_id"),
                                              _FILES_PER_PART),
                                    _FILES_PER_PART)), pa.int64())
        for k in range(_FILES_PER_PART):
            pq.write_table(part.filter(pc.equal(shard, k)),
                           os.path.join(pdir, f"part-{k:04d}.parquet"))
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(fp + "\n")
    if os.path.exists(out):
        shutil.rmtree(out)
    os.replace(tmp, out)
    return out


def pruned_files(root: str, values=None) -> tuple[list[str], int]:
    """(kept file paths, total file count) for a partition-column
    predicate ``event_type IN values`` (None = no predicate) — the
    prune decision, exposed for tests."""
    kept, total = [], 0
    for d in sorted(os.listdir(root)):
        if not d.startswith(f"{_PART_COL}="):
            continue
        val = d.split("=", 1)[1]
        files = sorted(os.path.join(root, d, f)
                       for f in os.listdir(os.path.join(root, d))
                       if f.endswith(".parquet"))
        total += len(files)
        if values is None or val in set(values):
            kept.extend(files)
    return kept, total


def read_events_hive(root: str, values=None, columns=None):
    """Dataset over the hive layout, pruned to the given partition
    values.  Ray's hive partitioning inference re-attaches the
    partition column from the directory name (projection-aware:
    include/omit ``event_type`` in ``columns`` like any other column);
    the prune itself happens HERE, before any file is listed."""
    import ray.data as rd

    dss = []
    for d in sorted(os.listdir(root)):
        if not d.startswith(f"{_PART_COL}="):
            continue
        val = d.split("=", 1)[1]
        if values is not None and val not in set(values):
            continue  # the prune: this directory is never listed/read
        dss.append(rd.read_parquet(os.path.join(root, d), columns=columns))
    if not dss:
        raise ValueError(f"no partitions match {values!r} under {root}")
    return dss[0] if len(dss) == 1 else dss[0].union(*dss[1:])
