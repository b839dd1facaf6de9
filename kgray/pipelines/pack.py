"""Sequence packing: assign documents to fixed-token-budget bins — the
training-data step that turns a deduplicated corpus into dense context
windows (greedy sequential first-fit, the standard packing used for LM
pretraining batches).

Semantics: documents are processed in a globally deterministic order
(``shard = doc_id % n_shards``, then ``doc_id`` within the shard); a
bin accumulates consecutive documents while the token total stays
within ``budget``; the first document that would overflow starts the
next bin.  A single document longer than ``budget`` gets a bin of its
own (callers split long documents upstream if that matters).  Greedy
packing is inherently sequential WITHIN a shard — there is no
associative carry (a bin boundary depends on every earlier token count
in the shard) — so the unit of parallelism is the shard:

1. one vectorized pass computes ``(doc_id, shard, n_tokens)`` — 24
   bytes per document, the ONLY thing the exchange ever moves (never
   text);
2. ``groupby(shard).map_groups`` co-locates each shard (Ray's native
   sort-based shuffle) and packs it with a vectorized kernel that
   loops over BINS, not rows: each bin boundary is one ``searchsorted``
   into the shard's token-count prefix sums;
3. output streams as ``(doc_id, shard, n_tokens, bin_id, bin_pos)``
   with ``bin_id`` globally unique (``shard * 2^40 + local bin``).

Scale note: per-shard work is O(docs-in-shard); raise ``n_shards`` so
each shard fits one task comfortably (the 100-TB setting wants
thousands of shards; the packing quality loss from sharding is
negligible because bins don't cross documents anyway).  Deterministic
(pure function of doc_id + token counts) ⇒ fixture oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["pack_documents", "pack_tokens_kernel"]

_BIN_SHIFT = 40  # shard * 2^40 + local bin ordinal -> globally unique


def pack_tokens_kernel(tok: np.ndarray, budget: int) -> np.ndarray:
    """Greedy sequential first-fit over an ordered token-count vector:
    returns the 0-based bin ordinal per document.  Loops over bins
    (each boundary = one searchsorted into the prefix sums)."""
    n = len(tok)
    bins = np.empty(n, dtype=np.int64)
    cum = np.cumsum(tok)
    i = 0
    b = 0
    while i < n:
        base = cum[i - 1] if i else 0
        j = int(np.searchsorted(cum, base + budget, side="right"))
        if j <= i:          # single document exceeds the budget
            j = i + 1
        bins[i:j] = b
        b += 1
        i = j
    return bins


def pack_documents(sf_dir_or_ds, budget: int = 256, n_shards: int = 8):
    """Pack the ``documents`` table into ``budget``-token bins.
    Returns ``(doc_id, shard, n_tokens, bin_id, bin_pos)`` — one row
    per document; ``bin_pos`` is the document's 0-based position within
    its bin.  Token counts are whitespace-split counts (the repo's
    token-stat convention), computed vectorized."""
    if isinstance(sf_dir_or_ds, str):
        ds = rd.read_parquet(f"{sf_dir_or_ds}/documents.parquet",
                             columns=["doc_id", "text"])
    else:
        ds = sf_dir_or_ds

    def counts(batch: pa.Table) -> pa.Table:
        nonempty = pc.list_value_length(pc.ascii_split_whitespace(
            batch.column("text")))
        doc_id = batch.column("doc_id")
        return pa.table({
            "doc_id": doc_id,
            "shard": pc.cast(
                pc.subtract(doc_id, pc.multiply(
                    pc.divide(doc_id, pa.scalar(n_shards, type=pa.int64())),
                    pa.scalar(n_shards, type=pa.int64()))), pa.int64()),
            "n_tokens": pc.cast(nonempty, pa.int64())})

    narrow = ds.map_batches(counts, batch_format="pyarrow",
                            zero_copy_batch=True)

    def pack_group(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        g = group.take(order)
        tok = g.column("n_tokens").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        shard = int(g.column("shard")[0].as_py())
        local = pack_tokens_kernel(tok, budget)
        starts = np.flatnonzero(np.r_[True, np.diff(local) != 0])
        reps = np.diff(np.append(starts, len(local)))
        pos = np.arange(len(local), dtype=np.int64) - np.repeat(starts, reps)
        return pa.table({
            "doc_id": g.column("doc_id"),
            "shard": g.column("shard"),
            "n_tokens": g.column("n_tokens"),
            "bin_id": pa.array((shard << _BIN_SHIFT) + local,
                               type=pa.int64()),
            "bin_pos": pa.array(pos, type=pa.int64())})

    return narrow.groupby("shard").map_groups(pack_group,
                                              batch_format="pyarrow")
