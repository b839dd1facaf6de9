"""Distributed large×large equi-join without broadcasting either side.

Same co-location trick as ``stages/aggregate.py``: union both sides
with a side tag, range-partition **sort** on the join key (equal keys
become contiguous), then join per sorted block with a vectorized pandas
merge.  Keys equal to a block's first/last key may continue in a
neighboring block, so their rows are routed to one small driver-side
merge instead (edge rows ≤ 2 keys × blocks).

Skew: all rows of one key land in one sort partition — salt hot keys
upstream if a single key's rows exceed a block (same rule as the salted
canonicalization).

For dimension-sized sides prefer the broadcast pattern
(``ray.put`` + dict lookup in ``map_batches``) used throughout
``pipelines/relational.py`` — this operator is for the fact×fact case.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["sorted_merge_join"]


def sorted_merge_join(left, right, on, how: str = "inner"):
    """Inner/left equi-join of two Datasets on column ``on``.

    Column sets of left/right must be disjoint apart from ``on``.
    Returns a Dataset with left columns then right columns (minus the
    duplicate key).
    """
    import ray
    import ray.data as rd

    assert how in ("inner", "left")
    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    r_cols = [c for c in r_schema.names if c != on]
    overlap = (set(l_cols) - {on}) & set(r_cols)
    assert not overlap, f"overlapping non-key columns: {overlap}"
    out_cols = l_cols + r_cols
    types = {}
    for n, t in zip(l_schema.names, l_schema.types):
        types[n] = t
    for n, t in zip(r_schema.names, r_schema.types):
        types.setdefault(n, t)

    def tag(side_val):
        def fn(batch: pa.Table) -> pa.Table:
            cols = {}
            for c in out_cols:
                if c in batch.schema.names:
                    cols[c] = batch.column(c)
                else:
                    cols[c] = pa.nulls(batch.num_rows, type=types[c])
            cols["__side"] = pa.array([side_val] * batch.num_rows, type=pa.int8())
            return pa.table(cols)
        return fn

    import ray as _ray
    n_part = max(8, int(_ray.cluster_resources().get("CPU", 8)) // 2)
    unioned = (left.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True)
               .union(right.map_batches(tag(1), batch_format="pyarrow",
                                        zero_copy_batch=True))
               .repartition(n_part))     # bound sort-partition fixed costs

    def block_join(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(batch)
        key = batch.column(on)
        edge = pc.or_(pc.equal(key, key[0]), pc.equal(key, key[-1]))
        interior = batch.filter(pc.invert(edge))
        joined = _pd_join(interior, on, l_cols, r_cols, how)
        joined = joined.append_column("__edge",
                                      pa.array([False] * joined.num_rows, type=pa.bool_()))
        edges = batch.filter(edge).append_column(
            "__edge", pa.array([True] * batch.filter(edge).num_rows, type=pa.bool_()))
        # carry raw edge rows through (they still have __side)
        return pa.concat_tables([joined, edges], promote_options="permissive")

    def _empty(batch):
        return batch.append_column("__edge", pa.array([], type=pa.bool_()))

    blocks = (unioned.sort(on)
              .map_batches(block_join, batch_format="pyarrow")
              .materialize())

    interior = blocks.map_batches(
        lambda b: b.filter(pc.invert(b.column("__edge")))
                   .select(out_cols),
        batch_format="pyarrow")

    edge_refs = blocks.map_batches(
        lambda b: b.filter(b.column("__edge")),
        batch_format="pyarrow").to_arrow_refs()
    edge_tables = [t for t in ray.get(edge_refs) if t.num_rows]
    if not edge_tables:
        return interior
    edge_all = pa.concat_tables(edge_tables, promote_options="permissive")
    merged = _pd_join(edge_all, on, l_cols, r_cols, how)
    return interior.union(rd.from_arrow(merged.select(out_cols)))


def _pd_join(t: pa.Table, on: str, l_cols, r_cols, how: str) -> pa.Table:
    # split sides in Arrow BEFORE pandas so the null padding of the
    # other side never touches a column (ints would degrade to float64
    # and lose exactness past 2^53)
    side = t.column("__side")
    ldf = t.filter(pc.equal(side, 0)).select(l_cols).to_pandas()
    rdf = t.filter(pc.equal(side, 1)).select([on] + r_cols).to_pandas()
    out = ldf.merge(rdf, on=on, how=how)
    return pa.Table.from_pandas(out[l_cols + r_cols], preserve_index=False)
