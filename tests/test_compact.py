"""stages/compact.py: partition-parallel small-file compaction —
losslessness, file-count reduction, preserved sort, marker."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _fragmented_layout(root, n_parts=3, files_per=6, rows_per=40):
    rng = np.random.default_rng(11)
    truth = {}
    for p in range(n_parts):
        d = os.path.join(root, f"bucket={p}")
        os.makedirs(d)
        rows = []
        for f in range(files_per):
            k = rng.integers(0, 10_000, rows_per)
            t = pa.table({"k": pa.array(np.sort(k), type=pa.int64()),
                          "v": pa.array(rng.integers(0, 100, rows_per),
                                        type=pa.int64())})
            pq.write_table(t, os.path.join(d, f"part-{f}.parquet"))
            rows.extend(zip(t["k"].to_pylist(), t["v"].to_pylist()))
        truth[p] = sorted(rows)
    return truth


def test_compact_partitioned_lossless(ray_session, tmp_path):
    from kgray.stages.compact import compact_partitioned

    root = str(tmp_path / "sink")
    os.makedirs(root)
    truth = _fragmented_layout(root)
    report = compact_partitioned(root, sort_keys=["k"], target_rows=500)
    assert len(report) == 3
    for part_dir, before, after in report:
        assert before == 6 and after == 1
        files = glob.glob(os.path.join(part_dir, "*.parquet"))
        assert len(files) == 1
        assert os.path.exists(os.path.join(part_dir, "_COMPACTED"))
        t = pq.read_table(files[0])
        got = list(zip(t["k"].to_pylist(), t["v"].to_pylist()))
        p = int(part_dir.rsplit("=", 1)[1])
        assert sorted(got) == truth[p]
        ks = t["k"].to_pylist()
        assert ks == sorted(ks)                 # sort preserved


def test_compact_partitioned_splits_to_target(ray_session, tmp_path):
    """target_rows below the partition size yields multiple uniform
    files; single-file partitions are left untouched."""
    from kgray.stages.compact import compact_partitioned

    root = str(tmp_path / "sink2")
    os.makedirs(root)
    _fragmented_layout(root, n_parts=1, files_per=4, rows_per=50)
    lone = os.path.join(root, "bucket=9")
    os.makedirs(lone)
    pq.write_table(pa.table({"k": pa.array([1], type=pa.int64()),
                             "v": pa.array([2], type=pa.int64())}),
                   os.path.join(lone, "only.parquet"))
    report = dict((d, (b, a)) for d, b, a in
                  compact_partitioned(root, sort_keys=["k"],
                                      target_rows=80))
    assert report[os.path.join(root, "bucket=0")] == (4, 3)   # 200/80
    assert report[lone] == (1, 1)
    assert os.path.exists(os.path.join(lone, "only.parquet"))
