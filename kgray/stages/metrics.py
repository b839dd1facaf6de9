"""Exact distributed evaluation metrics.

:func:`exact_auc` — ROC AUC with proper tie handling (the Mann-Whitney
U statistic), computed exactly in integer arithmetic:

    AUC = (Σ_{positives} avgrank − P(P+1)/2) / (P·N)

where ``avgrank`` of a tied score group is the midrank.  Everything up
to the final division is int64:

1. one aggregate reduces rows → per-score groups (score, n, n_pos) —
   the only row-sized exchange;
2. one sort + prefix pass over the GROUP table gives each score its
   ``below`` (rows with smaller score): per-block cumsums + a
   block-count-sized offset merge on the driver (never row-sized);
3. midranks doubled to stay integral: 2·avgrank = 2·below + n + 1, so
   2·Σranks is an exact int64 sum and AUC is ONE IEEE division —
   bitwise-reproducible across partitionings and mirrorable in SQL.

Why it matters at 100 TB: AUC is THE acceptance metric for the
model-based quality filters (quality_model.py, DSIR), and the naive
"sort all rows, assign ranks" plan ships the full corpus through an
exchange — this plan ships one row per DISTINCT score.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["exact_auc"]


def exact_auc(ds, score_col: str, label_col: str):
    """One-row Dataset (auc: float64, n_pos, n_neg: int64) over
    ``ds``; ``label_col`` must be 0/1 int, ``score_col`` any orderable
    numeric (higher = more positive).  Null scores/labels are
    rejected (nulls have no rank order)."""
    import ray
    import ray.data as rd

    from .aggregate import sorted_group_aggregate

    def to_groups(b: pa.Table) -> pa.Table:
        s, l = b.column(score_col), b.column(label_col)
        if pc.any(pc.is_null(s)).as_py() or pc.any(pc.is_null(l)).as_py():
            raise ValueError("exact_auc: null score or label")
        return pa.table({"score": s,
                         "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                         "n_pos": pc.cast(l, pa.int64())})

    groups = sorted_group_aggregate(
        ds.map_batches(to_groups, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["score"], [("n", "sum"), ("n_pos", "sum")])

    # global prefix over the (distinct-score-sized) group table: sort,
    # then per-block remote partials — the driver handles ONLY
    # block-count-sized scalars (blocks themselves never collect; at
    # continuous-score scale distinct ≈ rows, so that matters)
    srt = groups.sort("score").materialize()
    refs = srt.to_arrow_refs()

    @ray.remote
    def block_total(t: pa.Table) -> int:
        # Ray emits schema-LESS empty blocks after a sort — guard both
        if t.num_rows == 0 or "n" not in t.schema.names:
            return 0
        return int(pc.sum(t.column("n")).as_py() or 0)

    @ray.remote
    def block_partial(t: pa.Table, off: int):
        """(2·Σ_pos avgrank, Σ n_pos, Σ n) for one sorted block whose
        first row has ``off`` rows below it globally."""
        if t.num_rows == 0 or "n" not in t.schema.names:
            return 0, 0, 0
        n = t.column("n").to_numpy(zero_copy_only=False)
        npos = t.column("n_pos").to_numpy(zero_copy_only=False)
        below = off + np.cumsum(n) - n
        return (int((npos * (2 * below + n + 1)).sum()),
                int(npos.sum()), int(n.sum()))

    block_n = ray.get([block_total.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(block_n)[:-1]]).astype(np.int64)
    parts = ray.get([block_partial.remote(r, int(off))
                     for r, off in zip(refs, offsets)])
    num2 = sum(p[0] for p in parts)       # 2·Σ_{positives} avgrank
    P = sum(p[1] for p in parts)
    total = sum(p[2] for p in parts)
    N = total - P
    if P == 0 or N == 0:
        raise ValueError("exact_auc: need both classes present")
    auc = float(num2 - P * (P + 1)) / float(2 * P * N)
    return rd.from_arrow(pa.table({
        "auc": pa.array([auc], type=pa.float64()),
        "n_pos": pa.array([P], type=pa.int64()),
        "n_neg": pa.array([N], type=pa.int64())}))
