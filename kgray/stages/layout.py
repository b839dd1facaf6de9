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

__all__ = ["write_range_layout", "files_overlapping", "read_range"]


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
