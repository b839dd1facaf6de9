"""list_col_matrix: zero-copy Arrow list-column → matrix conversion
(the embedding hot-path primitive)."""

import numpy as np
import pyarrow as pa
import pytest

from kgray.functions.veccol import col_vector, list_col_matrix


def test_matches_pylist_roundtrip():
    rng = np.random.default_rng(3)
    X = rng.standard_normal((257, 16))
    col = pa.array([list(map(float, r)) for r in X], type=pa.list_(pa.float64()))
    got = list_col_matrix(col)
    want = np.array(col.to_pylist(), dtype=np.float64)
    assert got.shape == (257, 16)
    np.testing.assert_array_equal(got, want)


def test_chunked_sliced_and_cast():
    rows = [[i, i + 1, i + 2] for i in range(40)]
    a = pa.chunked_array([
        pa.array(rows[:13], type=pa.list_(pa.int64())),
        pa.array(rows[13:], type=pa.list_(pa.int64())),
    ])
    got = list_col_matrix(a, dtype=np.int64)
    np.testing.assert_array_equal(got, np.asarray(rows, dtype=np.int64))
    # slice of a plain array keeps the logical view
    arr = pa.array(rows, type=pa.list_(pa.int64())).slice(5, 20)
    got = list_col_matrix(arr, dtype=np.float64)
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, np.asarray(rows[5:25], dtype=np.float64))


def test_table_column_and_vector():
    t = pa.table({
        "vec_id": pa.array([7, 8, 9], type=pa.int64()),
        "embedding": pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                              type=pa.list_(pa.float64()))})
    M = list_col_matrix(t.column("embedding"))
    np.testing.assert_array_equal(M, [[1, 2], [3, 4], [5, 6]])
    v = col_vector(t.column("vec_id"), np.int64)
    np.testing.assert_array_equal(v, [7, 8, 9])


def test_ragged_and_null_raise():
    with pytest.raises(ValueError):
        list_col_matrix(pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float64())))
    with pytest.raises(ValueError):
        list_col_matrix(pa.array([[1.0, 2.0], None], type=pa.list_(pa.float64())))


def test_empty():
    got = list_col_matrix(pa.array([], type=pa.list_(pa.float64())))
    assert got.shape == (0, 0)
