"""Zero-copy conversion of Arrow ``list<numeric>`` columns to NumPy
matrices.

Every similarity-search / clustering / semantic-dedup stage starts by
turning an embedding column into an ``(n, dim)`` float or int matrix.
``np.array(col.to_pylist())`` does that through n·dim Python objects —
50-100x slower than a memcpy and 3x the memory.  For fixed-width rows
(the only shape those stages accept) the Arrow layout already *is* the
matrix: one contiguous values buffer + monotone offsets.  This helper
reshapes that buffer directly; the copy (when one happens at all) is a
single vectorized cast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["list_col_matrix", "col_vector", "matrix_to_list_col"]


def matrix_to_list_col(M: np.ndarray, value_type=None) -> pa.ListArray:
    """``(n, width)`` ndarray → ``list<value_type>`` array in one
    buffer handoff (the write-side twin of :func:`list_col_matrix`)."""
    n, w = M.shape
    values = pa.array(M.reshape(-1), type=value_type)
    offsets = pa.array(np.arange(0, (n + 1) * w, w, dtype=np.int32),
                       type=pa.int32())
    return pa.ListArray.from_arrays(offsets, values)


def col_vector(col, dtype=None) -> np.ndarray:
    """Flat (non-list) column → 1-D ndarray without a Python round trip."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = col.to_numpy(zero_copy_only=False)
    if dtype is not None and out.dtype != dtype:
        out = out.astype(dtype)
    return out


def list_col_matrix(col, dtype=np.float64) -> np.ndarray:
    """``list<numeric>`` column (equal-length rows, no nulls) →
    ``(n_rows, width)`` ndarray.

    Zero-copy when the values buffer already has the requested dtype;
    otherwise one vectorized cast.  Raises ``ValueError`` on ragged
    rows or null entries — the callers' contracts (fixed-dim embedding
    / quantized-vector columns) make those data errors, not cases to
    paper over.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count:
        raise ValueError("list_col_matrix: null list entries")
    # flatten() respects slices and trims to the logical view
    values = col.flatten()
    offsets = np.asarray(col.offsets)
    widths = np.diff(offsets)
    if not (widths == widths[0]).all():
        raise ValueError(
            f"list_col_matrix: ragged rows (widths {widths.min()}..{widths.max()})")
    width = int(widths[0])
    flat = values.to_numpy(zero_copy_only=False)
    if flat.dtype != dtype:
        flat = flat.astype(dtype)
    if flat.shape[0] != n * width:          # flatten() already trimmed; guard anyway
        raise ValueError("list_col_matrix: values/offsets mismatch")
    return flat.reshape(n, width)
