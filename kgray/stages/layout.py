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
