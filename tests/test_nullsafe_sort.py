"""nullsafe_sort (r3): Ray 2.49's range-partitioned sort feeds raw key
values to np.searchsorted when binning rows to boundaries
(ray/data/_internal/util.py:find_partition_index); null keys become NaN
(numeric — rows silently bin into TWO partitions: duplicated output) or
None (strings — TypeError).  Every sorted-run stage therefore sorts
through _runs.nullsafe_sort.  These tests pin the wrapper's semantics
and the multiset-preservation that the raw sort violates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(t, parts):
    import ray.data as rd
    return rd.from_arrow(t).repartition(parts)


def test_numeric_multicol_null_keys_no_duplication(ray_session):
    """The exact shape that duplicates rows under the raw sort: nulls in
    two int key columns + more partitions than distinct keys."""
    from kgray.stages._runs import nullsafe_sort
    t = pa.table({
        "k1": pa.array([1, 1, None, 2, None, 1, 2, None], type=pa.int64()),
        "k2": pa.array([10, None, 10, 20, None, 10, 20, 10], type=pa.int64()),
        "v": pa.array(list(range(8)), type=pa.int64())})
    for parts in (2, 8, 16):
        df = nullsafe_sort(_ds(t, parts), ["k1", "k2"]).to_pandas()
        assert sorted(df.v.tolist()) == list(range(8)), parts
        # nulls-last ordering per key column
        k1 = df.k1.tolist()
        nn = [x for x in k1 if not pd.isna(x)]
        assert k1[:len(nn)] == sorted(nn)


def test_string_null_keys_no_crash(ray_session):
    """The raw sort raises TypeError ('<' between None and str) when a
    boundary sample hits a null string key."""
    from kgray.stages._runs import nullsafe_sort
    vals = (["b", None, "a", "c"] * 40)
    t = pa.table({"a": pa.array(vals, type=pa.string()),
                  "v": pa.array(list(range(160)), type=pa.int64())})
    df = nullsafe_sort(_ds(t, 8), ["a"]).to_pandas()
    assert sorted(df.v.tolist()) == list(range(160))
    nn = df.a.dropna().tolist()
    assert nn == sorted(nn) and len(nn) == 120
    assert df.a.tolist()[120:] == [None] * 40     # nulls last, one run


def test_descending_with_nulls_sorted_and_nulls_last(ray_session):
    from kgray.stages._runs import nullsafe_sort
    t = pa.table({"a": pa.array([5, None, 1, 9, 3] * 40, type=pa.int64()),
                  "v": pa.array(list(range(200)), type=pa.int64())})
    df = nullsafe_sort(_ds(t, 8), ["a"], descending=True).to_pandas()
    assert sorted(df.v.tolist()) == list(range(200))
    nn = df.a.dropna().tolist()
    assert nn == sorted(nn, reverse=True)
    assert df.a.isna().tolist()[len(nn):] == [True] * 40


def test_values_and_types_roundtrip(ray_session):
    """decode restores nulls and leaves non-key columns untouched at
    their declared types."""
    from kgray.stages._runs import nullsafe_sort
    t = pa.table({
        "s": pa.array(["x", None, "", "y"], type=pa.string()),
        "i": pa.array([3, 1, None, 2], type=pa.int64()),
        "payload": pa.array([1.5, 2.5, 3.5, 4.5], type=pa.float64())})
    out = nullsafe_sort(_ds(t, 2), ["s", "i"])
    got = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    assert out.schema().base_schema.names == ["s", "i", "payload"]
    rows = sorted(got.to_pylist(), key=lambda r: str(r))
    exp = sorted(t.to_pylist(), key=lambda r: str(r))
    assert rows == exp                      # multiset identical, nulls back


def test_raw_ray_sort_bug_still_present(ray_session):
    """Canary: if Ray fixes find_partition_index, this starts failing —
    then nullsafe_sort can be retired (see NOTES.md r3)."""
    t = pa.table({
        "k1": pa.array([1, 1, None, 2, None, 1, 2, None], type=pa.int64()),
        "k2": pa.array([10, None, 10, 20, None, 10, 20, 10], type=pa.int64()),
        "v": pa.array(list(range(8)), type=pa.int64())})
    df = _ds(t, 8).sort(["k1", "k2"]).to_pandas()
    assert sorted(df.v.tolist()) != list(range(8)), \
        "Ray sort null-key bug seems fixed — consider retiring nullsafe_sort"
