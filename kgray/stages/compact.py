"""Small-file compaction (the lakehouse OPTIMIZE maintenance op) for a
hive-partitioned parquet sink.

A streaming writer at scale leaves each partition directory with one
file per producing task — hundreds of small files whose per-file footer
and open() costs dominate later scans.  Compaction rewrites every
partition into ``ceil(rows / target_rows)`` uniformly-sized files,
preserving the partition-internal sort order, WITHOUT any cross-
partition exchange: each partition is an independent unit of work, so
the natural plan is one Ray task per directory (a deliberate raw-task
use — this is per-directory file maintenance, not a data transform the
Dataset API should express).

Publish discipline: new files are written to a ``<part>.__compact__``
sibling and swapped in only after the whole partition is rewritten;
a ``_COMPACTED`` marker makes a half-swapped partition detectable.
Losslessness is pinned by the ``kg_graph_compacted`` gate query, whose
oracle is the kg_graph fixture itself.
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray

__all__ = ["compact_partitioned"]


@ray.remote
def _compact_one(part_dir: str, sort_keys: list, target_rows: int) -> tuple:
    files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    if len(files) <= 1:
        return (part_dir, len(files), len(files))
    tbl = pa.concat_tables([pq.read_table(f) for f in files],
                           promote_options="permissive")
    if sort_keys:
        tbl = tbl.sort_by([(k, "ascending") for k in sort_keys])
    n_out = max(1, -(-tbl.num_rows // target_rows))
    tmp = part_dir + ".__compact__"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    per = -(-tbl.num_rows // n_out)
    for k in range(n_out):
        pq.write_table(tbl.slice(k * per, per),
                       os.path.join(tmp, f"compact-{k:04d}.parquet"))
    with open(os.path.join(tmp, "_COMPACTED"), "w") as f:
        f.write(f"{len(files)} -> {n_out}\n")
    shutil.rmtree(part_dir)
    os.replace(tmp, part_dir)
    return (part_dir, len(files), n_out)


def compact_partitioned(root: str, sort_keys: list | None = None,
                        target_rows: int = 1 << 20) -> list:
    """Compact every ``<key>=<value>`` partition directory under
    ``root`` in parallel (one task per partition).  Returns
    ``[(partition_dir, files_before, files_after), ...]``."""
    parts = sorted(d for d in glob.glob(os.path.join(root, "*=*"))
                   if os.path.isdir(d))
    return ray.get([_compact_one.remote(p, sort_keys or [], target_rows)
                    for p in parts])
