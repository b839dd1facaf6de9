"""Similarity search over an embedding column (``list<float>``).

* :func:`ann_topk_bruteforce` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul and
  emits its batch-local top-k per query; a final small groupby merges.
  No pairwise shuffle; scales linearly in corpus size.
* :func:`ann_ivf_topk` — IVF-style scale path: deterministic k-means
  coarse centroids (driver-side, seeded, few iters over a sample), rows
  partitioned by nearest centroid, queries probe only ``n_probe``
  partitions.  Recall vs brute force is asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

__all__ = ["load_embeddings", "ann_topk_bruteforce", "ann_ivf_topk"]


# Scale notes: the sf_dir-based query selection below reads the
# embedding table on the driver for convenience at test scale; in
# production the query matrix is an input (it is broadcast via ray.put
# either way).  Likewise the brute-force scorer broadcasts the *query*
# matrix, never the corpus — corpus rows stream through map_batches.


def load_embeddings(sf_dir: str):
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    E = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    return ids, E


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def _query_matrix(sf_dir: str, n_queries: int):
    ids, E = load_embeddings(sf_dir)
    order = np.argsort(ids)
    q_ids = ids[order[:n_queries]]
    Q = _normalize(E[order[:n_queries]])
    return q_ids, Q


def ann_topk_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 5):
    """(query_id, rank, neighbor_id): exact top-k by cosine (self
    excluded; ties broken by ascending neighbor id)."""
    q_ids, Q = _query_matrix(sf_dir, n_queries)
    q_ref = ray.put((q_ids, Q))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, Qm = ray.get(q_ref)
        bids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        B = _normalize(np.array(batch.column("embedding").to_pylist(), dtype=np.float64))
        C = Qm @ B.T                                   # [nq, batch]
        out_q, out_n, out_c = [], [], []
        kk = min(k + 1, C.shape[1])                    # +1 in case self is here
        for qi in range(C.shape[0]):
            scores = C[qi]
            # deterministic order: score desc, id asc
            idx = np.lexsort((bids, -scores))[:kk]
            for j in idx:
                if bids[j] == qids[qi]:
                    continue
                out_q.append(int(qids[qi]))
                out_n.append(int(bids[j]))
                out_c.append(float(scores[j]))
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "neighbor_id": pa.array(out_n, type=pa.int64()),
                         "cos": pa.array(out_c, type=pa.float64())})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        return pd.DataFrame({"query_id": df["query_id"],
                             "rank": np.arange(1, len(df) + 1, dtype=np.int64),
                             "neighbor_id": df["neighbor_id"]})

    return (rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
            .map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("query_id")
            .map_groups(merge, batch_format="pandas"))


def _kmeans(E: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 7):
    """Tiny deterministic k-means on normalized vectors (driver-side)."""
    rng = np.random.default_rng(seed)
    En = _normalize(E)
    C = En[rng.choice(len(En), size=n_clusters, replace=False)]
    for _ in range(iters):
        assign = np.argmax(En @ C.T, axis=1)
        for c in range(n_clusters):
            members = En[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


def ann_ivf_topk(sf_dir: str, k: int = 10, n_queries: int = 5,
                 n_clusters: int = 16, n_probe: int = 4):
    """IVF top-k: search only the ``n_probe`` nearest coarse partitions.

    The partition step is the 100 TB design: rows carry a ``cluster``
    column (one matmul per batch against broadcast centroids), queries
    touch only matching partitions — here expressed as a filter inside
    the same scan to stay single-pass.
    """
    ids, E = load_embeddings(sf_dir)
    C = _kmeans(E, n_clusters)
    q_ids, Q = _query_matrix(sf_dir, n_queries)
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]          # [nq, n_probe]
    wanted = {}                                                    # cluster -> [query rows]
    for qi in range(len(q_ids)):
        for c in probes[qi]:
            wanted.setdefault(int(c), []).append(qi)
    ref = ray.put((q_ids, Q, C, wanted))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, Qm, Cm, want = ray.get(ref)
        bids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        B = _normalize(np.array(batch.column("embedding").to_pylist(), dtype=np.float64))
        assign = np.argmax(B @ Cm.T, axis=1)
        out_q, out_n, out_c = [], [], []
        for c, q_rows in want.items():
            mask = assign == c
            if not mask.any():
                continue
            sub_ids = bids[mask]
            sub = B[mask]
            scores = Qm[q_rows] @ sub.T                            # [nq_sub, m]
            kk = min(k + 1, scores.shape[1])
            for row, qi in enumerate(q_rows):
                idx = np.lexsort((sub_ids, -scores[row]))[:kk]
                for j in idx:
                    if sub_ids[j] == qids[qi]:
                        continue
                    out_q.append(int(qids[qi]))
                    out_n.append(int(sub_ids[j]))
                    out_c.append(float(scores[row, j]))
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "neighbor_id": pa.array(out_n, type=pa.int64()),
                         "cos": pa.array(out_c, type=pa.float64())})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        return pd.DataFrame({"query_id": df["query_id"],
                             "rank": np.arange(1, len(df) + 1, dtype=np.int64),
                             "neighbor_id": df["neighbor_id"]})

    return (rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
            .map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("query_id")
            .map_groups(merge, batch_format="pandas"))
