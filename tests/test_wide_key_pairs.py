"""Wide-key repack for the copurchase pair exchange (r3 VERDICT #7):
the ``a·2³² + b`` packing is exact only below 2³¹ part ids; above the
bound the plan must auto-switch to the 2×64-bit composite key and
produce identical counts."""

import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_lineitem(tmp_path, orders):
    ok, pk = [], []
    for o, parts in orders.items():
        for p in parts:
            ok.append(o)
            pk.append(p)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, type=pa.int64()),
        "l_partkey": pa.array(pk, type=pa.int64())}),
        tmp_path / "lineitem.parquet")


def _brute(orders):
    from collections import Counter
    c = Counter()
    for parts in orders.values():
        run = sorted(parts)
        for a, b in itertools.combinations(run, 2):
            if a != b:
                c[(a, b)] += 1
    return dict(c)


def _got(ds):
    import ray
    from kgray.pipelines.relational import _unpack_pair

    out = {}
    for t in ray.get(ds.map_batches(_unpack_pair, batch_format="pyarrow")
                     .to_arrow_refs()):
        if t.num_rows == 0 or "part_a" not in t.schema.names:
            continue
        for a, b, n in zip(t.column("part_a").to_pylist(),
                           t.column("part_b").to_pylist(),
                           t.column("n_copurchase").to_pylist()):
            out[(a, b)] = out.get((a, b), 0) + n
    return out


def test_packed_path_at_2pow24_keyspace(ray_session, tmp_path):
    """2²⁴-sized part ids stay on the packed single-int64 plan (guard
    passes) and match brute force; forcing wide=True gives the same
    counts (plan equality)."""
    from kgray.pipelines.relational import _copurchase_pair_counts

    rng = np.random.default_rng(5)
    base = 1 << 24
    orders = {o: [int(base + v) for v in rng.integers(0, 1 << 24, size=4)]
              for o in range(60)}
    _write_lineitem(tmp_path, orders)
    packed = _got(_copurchase_pair_counts(str(tmp_path)))
    wide = _got(_copurchase_pair_counts(str(tmp_path), wide=True))
    brute = _brute(orders)
    assert packed == brute
    assert wide == brute


def test_wide_plan_auto_selected_beyond_2pow31(ray_session, tmp_path):
    """Part ids ≥ 2³¹ (here ~2³³) auto-select the 2×64-bit composite
    plan from the parquet footer stats and match brute force — the
    packed plan would overflow signed int64."""
    from kgray.pipelines.relational import _copurchase_pair_counts

    rng = np.random.default_rng(7)
    base = 1 << 33
    orders = {o: [int(base + v) for v in rng.integers(0, 1 << 20, size=5)]
              for o in range(40)}
    _write_lineitem(tmp_path, orders)
    got = _got(_copurchase_pair_counts(str(tmp_path)))
    assert got == _brute(orders)
    assert all(a >= base and b >= base for a, b in got)


def test_packed_guard_raises_on_forced_narrow(ray_session, tmp_path):
    """Forcing wide=False on an over-bound keyspace fails loudly, never
    silently wrong."""
    import pytest
    import ray
    from kgray.pipelines.relational import _copurchase_pair_counts

    orders = {1: [1 << 32, (1 << 32) + 3, 7]}
    _write_lineitem(tmp_path, orders)
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        _copurchase_pair_counts(str(tmp_path), wide=False).take_all()
