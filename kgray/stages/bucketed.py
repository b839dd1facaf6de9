"""Hash-bucketed co-located layouts and the shuffle-free bucket join.

The core 100-TB discipline this engine documents everywhere — "pick ONE
partitioning key and reuse it across stages" — made concrete: both
tables are written ONCE as ``bucket=<b>/`` partitioned parquet on the
same key and bucket count, and from then on every join on that key is
embarrassingly parallel.  Bucket ``b`` of the left joins bucket ``b``
of the right inside a single task with NO exchange — the only shuffle
the plan ever pays is the initial partitioned write (a map-side
scatter, not a sort), and it is amortized over every downstream join.

Co-location also makes per-key aggregates ADDITIVE across buckets:
``COUNT(DISTINCT key)`` — normally a full shuffle — is exact as a plain
sum of per-bucket local distinct counts, because a key occurs in
exactly one bucket.

At cluster scale the bucketed layout lives on shared storage and
``n_buckets`` is sized so one bucket pair fits a worker's heap
(buckets/node ≥ a few × cores for balance); the per-bucket task reads
only its two bucket directories — I/O is pruned by layout, not by
filter evaluation.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

__all__ = ["write_bucketed", "bucketed_join"]


def write_bucketed(ds, key: str, out_dir: str, n_buckets: int = 32):
    """Write ``ds`` as ``out_dir/bucket=<b>/`` parquet, bucketed on the
    int64 ``key`` column (``key % n_buckets``).  Atomic: writes to a
    temp dir and renames, so a concurrent/killed run never leaves a
    half-layout behind (parquet writes ACCUMULATE — never rewrite a
    live layout in place)."""
    if os.path.isdir(out_dir):
        return out_dir

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b.column(key).to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array((k % n_buckets).astype("int32")))

    tmp = tempfile.mkdtemp(dir=os.path.dirname(out_dir.rstrip("/")),
                           prefix=".bucketed_tmp_")
    try:
        ds.map_batches(add_bucket, batch_format="pyarrow",
                       zero_copy_batch=True) \
          .write_parquet(tmp, partition_cols=["bucket"])
        os.rename(tmp, out_dir)
    except FileExistsError:                      # concurrent builder won
        shutil.rmtree(tmp, ignore_errors=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return out_dir


def bucketed_join(left_dir: str, right_dir: str, on: str,
                  n_buckets: int, per_bucket=None):
    """Join two co-bucketed layouts bucket-by-bucket with zero shuffle.

    Returns a Dataset of the (optionally ``per_bucket``-transformed)
    inner-join rows.  ``per_bucket(joined: pa.Table) -> pa.Table`` runs
    inside each bucket task — the natural place for a map-side partial
    aggregate so only combiner-sized rows ever leave the task."""
    def join_bucket(batch: pa.Table):
        # generator UDF: empty buckets yield nothing, so no
        # empty/mismatched-schema blocks ever enter the stream
        for b in batch.column("id").to_pylist():
            ld = os.path.join(left_dir, f"bucket={b}")
            rdd = os.path.join(right_dir, f"bucket={b}")
            if not (os.path.isdir(ld) and os.path.isdir(rdd)):
                continue                          # bucket empty on a side
            left = pq.read_table(ld)
            right = pq.read_table(rdd)
            j = left.join(right, keys=on, join_type="inner",
                          use_threads=False)
            if per_bucket is not None:
                j = per_bucket(j)
            if j.num_rows:
                yield j

    ids = rd.range(n_buckets).repartition(n_buckets)
    return ids.map_batches(join_bucket, batch_format="pyarrow")
