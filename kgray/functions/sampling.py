"""Deterministic sampling operators.

Random sampling is useless for a resumable 100-TB pipeline — a retry
produces a different sample and breaks lineage.  These operators hash a
stable key instead: the sample is a pure function of the data, identical
across runs, partitions, retries and engines (md5 here == md5 in SQL,
verified bitwise), and composable (the same row is in/out of the sample
everywhere it appears).

``hash_sample``  — Bernoulli p = rate/1000 per distinct key.
``group_sample`` — per-group fixed-size sample: the k rows with the
smallest key hash (a deterministic reservoir), via the grouped_topk
exchange.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["hash_sample", "group_sample", "mixture_sample", "split_assign"]


def _md5_bucket(vals: list, mod: int) -> np.ndarray:
    """First 8 hex chars of md5(str(v)) as int, mod ``mod`` — matches
    DuckDB ``CAST(('0x' || substr(md5(CAST(v AS VARCHAR)),1,8)) AS
    BIGINT) % mod`` bitwise."""
    out = np.empty(len(vals), dtype=np.int64)
    for i, v in enumerate(vals):
        out[i] = int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:8], 16)
    return out % mod


def hash_sample(ds, key_col: str, rate_permille: int):
    """Keep rows whose md5(key) bucket (of 1000) < ``rate_permille`` —
    a deterministic ~rate/1000 Bernoulli sample, stable across runs and
    engines.  Streams; no shuffle."""
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        b = _md5_bucket(batch.column(key_col).to_pylist(), 1000)
        return batch.filter(pa.array(b < rate_permille))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def group_sample(ds, group: str, key_col: str, k: int,
                 hash_name: str = "__h"):
    """Per-``group`` deterministic k-row sample: the k rows with the
    smallest md5(key) (ties impossible for distinct keys; broken by the
    key itself otherwise).  One grouped_topk exchange; output carries a
    1-based ``sample_rank``."""
    from ..stages.topk import grouped_topk

    def add_hash(batch: pa.Table) -> pa.Table:
        h = _md5_bucket(batch.column(key_col).to_pylist(), 1 << 62)
        return batch.append_column(hash_name, pa.array(h, type=pa.int64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            zero_copy_batch=True)
    top = grouped_topk(hashed, group=group, order_col=hash_name,
                       tiebreak=key_col, k=k, descending=False)
    return top.map_batches(
        lambda b: b.drop_columns([hash_name]).rename_columns(
            [n if n != "rank" else "sample_rank"
             for n in b.schema.names if n != hash_name]),
        batch_format="pyarrow")


def mixture_sample(ds, group_col: str, key_col: str, rates: dict,
                   default_permille: int = 1000):
    """Per-group deterministic Bernoulli mixture: keep a row iff its
    md5(key) bucket (of 1000) < the rate assigned to its ``group_col``
    value (``rates`` maps group → permille; unlisted groups get
    ``default_permille``).  This is the data-mixing primitive of a
    training corpus — down-weight over-represented domains to target
    proportions — with the same properties as :func:`hash_sample`: a
    pure function of the data, identical across runs/retries/engines,
    and a pure streaming filter (no shuffle; composes with any
    downstream stage).  Up-weighting (> 1000) is out of scope: a
    deterministic hash can't replicate rows (repeat the pipeline with
    an epoch-salted key for that).
    """
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        b = _md5_bucket(batch.column(key_col).to_pylist(), 1000)
        groups = batch.column(group_col).to_pylist()
        lim = np.array([rates.get(g, default_permille) for g in groups],
                       dtype=np.int64)
        return batch.filter(pa.array(b < lim))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def split_assign(ds, key_col: str, bounds=(900, 950),
                 names=("train", "val", "test"),
                 split_col: str = "split"):
    """Deterministic train/val/test assignment: md5(key) bucket of
    1000 → ``names[0]`` below ``bounds[0]``, ``names[1]`` below
    ``bounds[1]``, else ``names[2]``.  The split is a pure function of
    the key — stable across runs, partitions, retries and engines
    (bitwise vs the SQL CASE oracle), so a row can never migrate
    between splits when the corpus grows or the job is resumed, and
    train/eval leakage cannot be introduced by a reshuffle.  Pure
    streaming append; no shuffle.
    """
    if not (len(bounds) + 1 == len(names) and
            all(bounds[i] < bounds[i + 1] for i in range(len(bounds) - 1))):
        raise ValueError("bounds must be ascending with len(names)-1 entries")

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                split_col, pa.array([], type=pa.string()))
        b = _md5_bucket(batch.column(key_col).to_pylist(), 1000)
        out = np.full(len(b), names[-1], dtype=object)
        for bound, name in zip(reversed(bounds), reversed(names[:-1])):
            out[b < bound] = name
        return batch.append_column(
            split_col, pa.array(out.tolist(), type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
