"""Z-order layout: morton key properties, two-dimensional file
pruning (asserted, not assumed), and the contrast case — a
single-column range layout cannot prune the orthogonal dimension."""

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgray.stages.layout import (files_overlapping, files_overlapping_rect,
                                 read_zrect, write_range_layout,
                                 write_zorder_layout, zorder_key)


def test_zorder_key_locality_and_determinism():
    # interleave of exact shifted buckets: adjacent values in either
    # dim flip low-order bits only
    x = np.arange(0, 1 << 16, 257, dtype=np.int64)
    y = np.zeros_like(x)
    k = zorder_key([x, y], [0, 0], [(1 << 16) - 1, (1 << 16) - 1])
    assert (np.diff(k) > 0).all()            # monotone when y fixed
    # batching-independence: same rows, different split points
    x2 = np.concatenate([x[:10], x[10:]])
    k2 = np.concatenate([
        zorder_key([x[:10], y[:10]], [0, 0],
                   [(1 << 16) - 1, (1 << 16) - 1]),
        zorder_key([x[10:], y[10:]], [0, 0],
                   [(1 << 16) - 1, (1 << 16) - 1])])
    assert (k == k2).all() and (x == x2).all()
    # wide spans (µs timestamps) stay exact via the integer shift
    t = np.array([0, 10**14, 2 * 10**14], dtype=np.int64)
    kt = zorder_key([t, np.zeros(3, dtype=np.int64)],
                    [0, 0], [2 * 10**14, 1])
    assert kt[0] < kt[1] < kt[2]


def _grid_df(n_side=200, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "a": rng.integers(0, n_side, n_side * n_side).astype(np.int64),
        "b": rng.integers(0, n_side, n_side * n_side).astype(np.int64),
        "v": np.arange(n_side * n_side, dtype=np.int64)})


def test_zorder_prunes_both_dims(ray_session, tmp_path):
    df = _grid_df()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(32)
    zdir = str(tmp_path / "z")
    write_zorder_layout(ds, ["a", "b"], zdir)
    # a central rectangle covering ~1/16 of the plane
    rect = {"a": (50, 99), "b": (50, 99)}
    kept, total = files_overlapping_rect(zdir, rect)
    assert len(total) >= 8, "layout must span multiple files"
    assert len(kept) < len(total) / 2, (len(kept), len(total))
    # the pruned read returns exactly the rectangle rows
    got = read_zrect(zdir, rect).to_pandas()
    exp = df[(df.a.between(50, 99)) & (df.b.between(50, 99))]
    assert sorted(got.v.tolist()) == sorted(exp.v.tolist())

    # contrast: a range layout on `a` alone cannot prune a `b` band
    rdir = str(tmp_path / "r")
    write_range_layout(rd.from_arrow(pa.Table.from_pandas(df))
                       .repartition(32), "a", rdir)
    kept_b, total_b = files_overlapping(rdir, "b", 50, 99)
    assert len(kept_b) == len(total_b), "a-sorted files all overlap in b"
    # ...while the same single-dim layout does prune its own column
    kept_a, _ = files_overlapping(rdir, "a", 50, 99)
    assert len(kept_a) < len(total_b)


def test_events_rect_pipeline_prunes(ray_session):
    """The registered query builds its cached layout and the rectangle
    scan provably skips files at sf0.01."""
    from kgray.pipelines.relational import events_user_time_rect

    out = events_user_time_rect("/root/testdata/sf0.01")
    assert out.num_rows == 1 and int(out.column("n_events")[0].as_py()) > 0

    import hashlib
    st = os.stat("/root/testdata/sf0.01/events.parquet")
    tag = hashlib.md5(
        f"{os.path.abspath('/root/testdata/sf0.01')}|{st.st_size}|"
        f"{st.st_mtime_ns}".encode()).hexdigest()[:10]
    zdir = f"/tmp/kgray_zorder/events_{tag}"
    lo_us = int(pd.Timestamp("2024-01-10").value // 1000)
    hi_us = int(pd.Timestamp("2024-01-17").value // 1000) - 1
    kept, total = files_overlapping_rect(
        zdir, {"user_id": (30, 59), "ts_us": (lo_us, hi_us)})
    assert len(total) >= 8 and len(kept) < len(total), (len(kept),
                                                        len(total))
