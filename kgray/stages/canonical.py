"""Canonicalization / dedup of linked triples: salted two-stage groupby.

The north rule demands explicit skew mitigation for head entities
("United States" is the object of a large share of all triples).  A
naive ``groupby((subj, pred, obj))`` sends every occurrence of a hot key
to one reducer; here:

1. **batch combine** — inside ``map_batches``, occurrences are
   pre-aggregated per (key, salt) where ``salt = hash(url) % S`` — at
   most S partial rows per key per batch leave the map side,
2. **salted shuffle** — ``groupby([subj, pred, obj, salt])`` merges
   partials; a hot key's load is spread over S reducers,
3. **final shuffle** — ``groupby([subj, pred, obj])`` merges the ≤ S
   partial rows per key into the graph row.

``support`` (occurrence count) is exact; ``sample_urls`` keeps up to K
lexicographically-smallest supporting urls (deterministic).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.hashing import salt_of

__all__ = ["combine_triples_batch", "canonical_graph", "GRAPH_SCHEMA",
           "entity_stats"]

GRAPH_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("support", pa.int64()),
    ("sample_urls", pa.list_(pa.string())),
])


def combine_triples_batch(batch: pa.Table, n_salts: int = 16, k_urls: int = 5) -> pa.Table:
    """Map-side combiner: one partial row per (triple, salt) per batch."""
    acc: dict = {}
    for url, s, p, o in zip(batch.column("url").to_pylist(),
                            batch.column("subj").to_pylist(),
                            batch.column("pred").to_pylist(),
                            batch.column("obj").to_pylist()):
        key = (s, p, o, salt_of(url, n_salts))
        hit = acc.get(key)
        if hit is None:
            acc[key] = [1, {url}]
        else:
            hit[0] += 1
            if len(hit[1]) < k_urls:
                hit[1].add(url)
    return pa.table({
        "subj": pa.array([k[0] for k in acc], type=pa.string()),
        "pred": pa.array([k[1] for k in acc], type=pa.string()),
        "obj": pa.array([k[2] for k in acc], type=pa.string()),
        "salt": pa.array([k[3] for k in acc], type=pa.int32()),
        "support": pa.array([v[0] for v in acc.values()], type=pa.int64()),
        "sample_urls": pa.array([sorted(v[1]) for v in acc.values()],
                                type=pa.list_(pa.string())),
    })


def _merge_partials(df: pd.DataFrame, k_urls: int = 5) -> pd.DataFrame:
    urls = sorted({u for lst in df["sample_urls"] for u in lst})[:k_urls]
    return pd.DataFrame({
        "subj": [df["subj"].iloc[0]],
        "pred": [df["pred"].iloc[0]],
        "obj": [df["obj"].iloc[0]],
        "support": [int(df["support"].sum())],
        "sample_urls": [urls],
    })


def canonical_graph(linked_ds, n_salts: int = 16, k_urls: int = 5):
    """linked triples Dataset → deduped graph Dataset (unsorted)."""
    partial = linked_ds.map_batches(
        lambda b: combine_triples_batch(b, n_salts, k_urls),
        batch_format="pyarrow")
    stage1 = partial.groupby(["subj", "pred", "obj", "salt"]).map_groups(
        lambda df: _merge_partials(df, k_urls), batch_format="pandas")
    # _merge_partials drops the salt column, so stage1 rows are ≤ S
    # partials per triple; the final groupby merges them.
    final = stage1.groupby(["subj", "pred", "obj"]).map_groups(
        lambda df: _merge_partials(df, k_urls), batch_format="pandas")
    return final


def entity_stats(linked_ds, n_salts: int = 16):
    """Per-canonical-entity mention counts (subject + object roles) via
    map-side combine + small groupby — the 'entities' logical table."""
    def combine(batch: pa.Table) -> pa.Table:
        acc: dict = {}
        for s, o in zip(batch.column("subj").to_pylist(),
                        batch.column("obj").to_pylist()):
            for ent, col in ((s, 0), (o, 1)):
                row = acc.setdefault(ent, [0, 0])
                row[col] += 1
        return pa.table({
            "canonical_id": pa.array(list(acc.keys()), type=pa.string()),
            "as_subj": pa.array([v[0] for v in acc.values()], type=pa.int64()),
            "as_obj": pa.array([v[1] for v in acc.values()], type=pa.int64()),
        })

    from ray.data.aggregate import Sum
    return (linked_ds.map_batches(combine, batch_format="pyarrow")
            .groupby("canonical_id")
            .aggregate(Sum("as_subj", alias_name="as_subj"),
                       Sum("as_obj", alias_name="as_obj")))
