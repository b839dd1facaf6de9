"""Range-partitioned (sorted) parquet layout + stats-pruned reads —
the zone-map half of the storage story (the hash half is
``stages/bucketed.py``).

Writing a table SORTED on a column makes every parquet file's footer
min/max stats a tight, non-overlapping range — after that, a band
filter prunes at FILE granularity before any byte of data is read.
``read_range`` passes the band to ``read_parquet(filter=...)`` (row
groups prune too) after selecting only the overlapping files from the
footers; ``files_overlapping`` exposes the prune decision so tests and
operators can assert real skipping, not just correct answers.
"""

from __future__ import annotations

import glob
import os

import pyarrow.dataset as pds
import pyarrow.parquet as pq

__all__ = ["write_range_layout", "files_overlapping", "read_range",
           "write_zorder_layout", "files_overlapping_rect", "read_zrect"]


def write_range_layout(ds, col: str, out_dir: str):
    """Sort ``ds`` on ``col`` and write one file per block: footer
    min/max of ``col`` become non-overlapping zone maps."""
    os.makedirs(out_dir, exist_ok=True)
    ds.sort(col).write_parquet(out_dir)
    return out_dir


def _file_range(path: str, col: str):
    md = pq.read_metadata(path)
    idx = md.schema.to_arrow_schema().get_field_index(col)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None                     # no stats → cannot prune
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return lo, hi


def files_overlapping(out_dir: str, col: str, lo, hi):
    """(kept_files, total_files): footer-stats prune decision for the
    closed band [lo, hi]."""
    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    kept = []
    for f in files:
        r = _file_range(f, col)
        if r is None or (r[1] >= lo and r[0] <= hi):
            kept.append(f)
    return kept, files


def read_range(out_dir: str, col: str, lo, hi):
    """Dataset over only the files whose zone map overlaps [lo, hi],
    with the residual row filter pushed into the scan."""
    import ray.data as rd

    kept, _ = files_overlapping(out_dir, col, lo, hi)
    if not kept:
        raise FileNotFoundError(f"no files overlap [{lo}, {hi}]")
    return rd.read_parquet(kept, filter=((pds.field(col) >= lo)
                                         & (pds.field(col) <= hi)))


# ---------------------------------------------------------------- z-order

def _spread16(x):
    """Space the low 16 bits of each int64 out to even bit positions
    (classic morton magic-number spreading, vectorized)."""
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def zorder_key(arrs, los, his, bits: int = 16):
    """Morton key for 2 int64 dimensions: each value maps to a bucket
    by an exact integer right-shift of (value − lo) — the shift is the
    smallest that fits the dimension's span into ``bits`` bits, so
    nearby values share buckets and the interleave clusters BOTH
    dimensions.  Pure integer ops — deterministic for any batching."""
    import numpy as np

    assert len(arrs) == 2 and bits <= 16
    keys = []
    for a, lo, hi in zip(arrs, los, his):
        span = max(int(hi) - int(lo), 1)
        shift = max(0, span.bit_length() - bits)
        keys.append((a.astype(np.int64) - np.int64(lo)) >> np.int64(shift))
    return _spread16(keys[0]) | (_spread16(keys[1]) << 1)


def write_zorder_layout(ds, cols, out_dir: str, bits: int = 16):
    """Sort ``ds`` by the morton interleave of two int64 ``cols`` and
    write one file per block: every file's footer min/max become tight
    zone maps on BOTH columns at once, so a rectangle query prunes at
    file granularity in each dimension — a single-column sort can only
    ever prune its own column.

    Two passes over the input: global (min, max) per dimension (block
    partials folded on the driver), then key + sort + write.  The
    z-key column ``_zkey`` stays in the files (harmless; callers
    project it away)."""
    import numpy as np
    import pyarrow as pa

    cols = list(cols)

    def minmax(b):
        if b.num_rows == 0:
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in [f"{c}_{s}" for c in cols
                                       for s in ("lo", "hi")]})
        out = {}
        for c in cols:
            v = b.column(c).to_numpy(zero_copy_only=False)
            out[f"{c}_lo"] = pa.array([int(v.min())], type=pa.int64())
            out[f"{c}_hi"] = pa.array([int(v.max())], type=pa.int64())
        return pa.table(out)

    parts = ds.map_batches(minmax, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    los = [min(r[f"{c}_lo"] for r in parts) for c in cols]
    his = [max(r[f"{c}_hi"] for r in parts) for c in cols]

    def add_key(b):
        if b.num_rows == 0:
            return b.append_column("_zkey", pa.array([], type=pa.int64()))
        arrs = [b.column(c).to_numpy(zero_copy_only=False) for c in cols]
        return b.append_column(
            "_zkey", pa.array(zorder_key(arrs, los, his, bits),
                              type=pa.int64()))

    os.makedirs(out_dir, exist_ok=True)
    (ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
       .sort("_zkey").write_parquet(out_dir))
    return out_dir


def files_overlapping_rect(out_dir: str, ranges: dict):
    """(kept_files, total_files) for the conjunctive rectangle
    ``{col: (lo, hi)}`` — a file survives only if its footer zone map
    overlaps EVERY dimension's band."""
    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    kept = []
    for f in files:
        ok = True
        for col, (lo, hi) in ranges.items():
            r = _file_range(f, col)
            if r is not None and (r[1] < lo or r[0] > hi):
                ok = False
                break
        if ok:
            kept.append(f)
    return kept, files


def read_zrect(out_dir: str, ranges: dict):
    """Dataset over only the files whose zone maps overlap the
    rectangle, with the conjunctive residual filter pushed into the
    scan."""
    import ray.data as rd

    kept, _ = files_overlapping_rect(out_dir, ranges)
    if not kept:
        raise FileNotFoundError(f"no files overlap {ranges}")
    expr = None
    for col, (lo, hi) in ranges.items():
        e = (pds.field(col) >= lo) & (pds.field(col) <= hi)
        expr = e if expr is None else expr & e
    return rd.read_parquet(kept, filter=expr)


# ---------------------------------------------------------------------------
# Bloom-sidecar layout: file skipping for POINT lookups on a high-
# cardinality key that the file order does NOT cluster (zone maps are
# useless there — every file's min/max spans the keyspace).  One bloom
# bitset per parquet file, built by one Ray task per FILE (file-count-
# sized maintenance pass, the ``stages/compact.py`` discipline), stored
# as an ``<file>.bloom.npz`` sidecar.  Hashing is the repo's
# deterministic polyhash64 with double hashing (h1 + i·h2), so the
# sidecars are a pure function of the data.

def _bloom_positions(keys, m: int, n_hashes: int) -> "np.ndarray":
    """(len(keys), n_hashes) bit positions for string keys."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import POLY_M2, polyhash64_batch

    arr = pa.array([str(k) for k in keys], type=pa.string())
    h1 = polyhash64_batch(arr)
    h2 = polyhash64_batch(arr, mult=POLY_M2)
    # h2 forced odd so the double-hash stride never degenerates mod 2^j
    h2 = h2 | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m)).astype(np.int64)


def _bloom_build(path: str, col: str, bits_per_key: int,
                 n_hashes: int) -> None:
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    vals = pc.unique(pq.read_table(path, columns=[col]).column(col))
    n = max(1, len(vals))
    m = 1 << max(6, int(np.ceil(np.log2(n * bits_per_key))))
    bits = np.zeros(m // 64, dtype=np.uint64)
    if len(vals):
        pos = _bloom_positions(vals.to_pylist(), m, n_hashes).ravel()
        np.bitwise_or.at(bits, pos // 64,
                         np.uint64(1) << (pos % 64).astype(np.uint64))
    np.savez(path + ".bloom.npz", bits=bits,
             m=np.array([m], dtype=np.int64),
             k=np.array([n_hashes], dtype=np.int64))


def write_bloom_layout(ds, col: str, out_dir: str,
                       bits_per_key: int = 16, n_hashes: int = 4) -> str:
    """Write ``ds`` (one file per block) and build a bloom sidecar on
    ``col`` per file — one Ray task per file, never a row-sized
    driver pass."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir)
    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    build = ray.remote(num_cpus=0.5)(_bloom_build)
    ray.get([build.remote(f, col, bits_per_key, n_hashes) for f in files])
    return out_dir


def bloom_files_for_keys(out_dir: str, keys) -> tuple:
    """(candidate_files, all_files): files whose bloom sidecar may
    contain ANY of ``keys`` — the prune decision, exposed so tests can
    assert real skipping (false positives possible, false negatives
    never)."""
    import numpy as np

    all_files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    keep = []
    for f in all_files:
        with np.load(f + ".bloom.npz") as z:
            bits, m, k = z["bits"], int(z["m"][0]), int(z["k"][0])
        pos = _bloom_positions(keys, m, k)
        hit = ((bits[pos // 64] >> (pos % 64).astype(np.uint64))
               & np.uint64(1)).all(axis=1)
        if bool(hit.any()):
            keep.append(f)
    return keep, all_files
