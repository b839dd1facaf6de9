"""Deduplication operators: exact, MinHash+LSH, SimHash, shingle-Jaccard,
embedding-cosine near-dup.

Scale notes (the 100 TB story):
* exact dedup: map-side partial per content hash, then one small
  groupby — rows leaving the map side ≈ distinct hashes per batch.
* MinHash-LSH: signatures per batch (vectorized universal hashing) →
  explode to (band, band_hash) rows → ``groupby`` buckets → candidate
  pairs → exact-Jaccard verify.  Only bucketed candidates are verified;
  the all-pairs verify exists separately as the small-scale oracle path.
* SimHash: 64-bit signature per doc; Hamming-≤d candidates via the
  pigeonhole chunk trick (d+1 chunks, groupby on chunk value).
* embedding near-dup: block-wise cosine against a broadcast normalized
  matrix (numpy matmul per batch, no pairwise shuffle).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions.hashing import stable_hash64

__all__ = ["exact_dedup", "shingle_set", "jaccard_pairs_bruteforce",
           "minhash_signatures", "minhash_lsh_pairs", "simhash64",
           "simhash_signatures", "simhash_pairs", "embedding_neardup_pairs",
           "embedding_lsh_pairs"]

_WS = re.compile(r"\s+")
_MERSENNE = (1 << 61) - 1


def _tokens(text: str) -> list:
    t = text.strip()
    return _WS.split(t) if t else []


# --------------------------------------------------------------------------- exact


def exact_dedup(sf_dir: str):
    """text_hash, keep_doc_id (min), n_copies — hash-partitioned exact
    dedup with map-side combine."""
    def partial(batch: pa.Table) -> pa.Table:
        acc: dict = {}
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            hit = acc.get(h)
            if hit is None:
                acc[h] = [did, 1]
            else:
                hit[0] = min(hit[0], did)
                hit[1] += 1
        return pa.table({
            "text_hash": pa.array(list(acc.keys()), type=pa.string()),
            "keep_doc_id": pa.array([v[0] for v in acc.values()], type=pa.int64()),
            "n_copies": pa.array([v[1] for v in acc.values()], type=pa.int64()),
        })

    from ..stages.aggregate import sorted_group_aggregate
    combined = (rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
                .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    return sorted_group_aggregate(combined, "text_hash",
                                  [("keep_doc_id", "min"), ("n_copies", "sum")])


# --------------------------------------------------------------------------- shingles / jaccard


def shingle_set(tokens: list, k: int = 3) -> set:
    """k-token shingles; docs shorter than k shingle to nothing (the
    SQL oracle filters those too)."""
    return {" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)}


def jaccard_pairs_bruteforce(sf_dir: str, threshold: float = 0.5, k: int = 3):
    """All-pairs exact shingle-Jaccard ≥ threshold → (doc_a, doc_b).

    O(n²) verify — the small-scale oracle path (SQL-checkable); the
    scale path is :func:`minhash_lsh_pairs`.  Shingle sets are collected
    distributed (per-batch), only the pair loop runs on the driver.
    """
    def to_shingles(batch: pa.Table) -> pa.Table:
        ids, sh = [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            toks = _tokens(t)
            if len(toks) < k:
                continue
            ids.append(did)
            sh.append(sorted(shingle_set(toks, k)))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "shingles": pa.array(sh, type=pa.list_(pa.string()))})

    shingles_ds = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"])
                   .map_batches(to_shingles, batch_format="pyarrow",
                                zero_copy_batch=True)
                   .materialize())
    # broadcast the full shingle table once; each task pairs its batch's
    # docs against every doc with a greater id (each pair computed once)
    all_rows = sorted((r["doc_id"], frozenset(r["shingles"]))
                      for r in shingles_ds.take_all())
    all_ref = ray.put(all_rows)

    def pair_batch(batch: pa.Table) -> pa.Table:
        docs = ray.get(all_ref)
        by_id = dict(docs)
        out_a, out_b = [], []
        for did in batch.column("doc_id").to_pylist():
            sa = by_id[did]
            for ib, sb in docs:
                if ib <= did:
                    continue
                inter = len(sa & sb)
                if inter and inter / (len(sa) + len(sb) - inter) >= threshold:
                    out_a.append(did)
                    out_b.append(ib)
        return pa.table({"doc_a": pa.array(out_a, type=pa.int64()),
                         "doc_b": pa.array(out_b, type=pa.int64())})

    pairs = shingles_ds.map_batches(pair_batch, batch_format="pyarrow").take_all()
    pairs = sorted((r["doc_a"], r["doc_b"]) for r in pairs)
    return pa.table({"doc_a": pa.array([a for a, _ in pairs], type=pa.int64()),
                     "doc_b": pa.array([b for _, b in pairs], type=pa.int64())})


def _bucket_candidates(ds, bucket_cols: list, id_col: str) -> set:
    """Candidate id pairs from LSH-style buckets without per-group UDFs.

    Almost every bucket is a singleton, so: (1) count bucket sizes with
    the built-in vectorized Count aggregator, (2) broadcast the (tiny)
    set of bucket keys with ≥ 2 members, (3) vectorized-filter the
    bucket rows to those keys, (4) pair up ids per key on the driver —
    the candidate set is small by construction.
    """
    from ray.data.aggregate import Count

    counts = ds.groupby(bucket_cols).aggregate(Count(alias_name="n"))
    multi = counts.map_batches(
        lambda b: b.filter(pa.compute.greater(b.column("n"), 1)),
        batch_format="pyarrow").take_all()
    if not multi:
        return set()
    hot = {tuple(r[c] for c in bucket_cols) for r in multi}
    hot_ref = ray.put(hot)

    def keep_hot(batch: pa.Table) -> pa.Table:
        hot_keys = ray.get(hot_ref)
        cols = [batch.column(c).to_pylist() for c in bucket_cols]
        mask = [tuple(vals) in hot_keys for vals in zip(*cols)]
        return batch.filter(pa.array(mask, type=pa.bool_()))

    rows = ds.map_batches(keep_hot, batch_format="pyarrow").take_all()
    buckets: dict = {}
    for r in rows:
        buckets.setdefault(tuple(r[c] for c in bucket_cols), []).append(r[id_col])
    pairs = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs


# --------------------------------------------------------------------------- minhash + lsh


def _perm_params(num_perm: int, seed: int = 1234):
    """31-bit a/b against 32-bit shingle hashes: a*x+b < 2^63 — the
    universal-hash product stays in int64 (no overflow, fully
    vectorized)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.int64)
    b = rng.integers(0, 1 << 31, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signatures(tokens_shingles: set, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minhash values via (a*x+b) mod p universal hashing."""
    if not tokens_shingles:
        return np.full(a.shape[0], _MERSENNE, dtype=np.int64)
    x = np.array([stable_hash64(s) & 0xFFFFFFFF for s in tokens_shingles],
                 dtype=np.int64)
    vals = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
    return np.min(vals, axis=1)


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5, k: int = 3,
                      num_perm: int = 128, bands: int = 32):
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    Pipeline: signatures per batch → explode (band, band_hash, doc_id)
    → groupby bucket → candidate pairs per bucket → dedup pairs →
    exact verify.  Verification fetches shingle sets from a broadcast
    map (fine while distinct candidate docs ≪ corpus; at true scale this
    becomes a hash join of candidates against the shingle table).
    """
    a, b = _perm_params(num_perm)
    rows_per_band = num_perm // bands

    def to_bands(batch: pa.Table) -> pa.Table:
        band_ids, band_hashes, dids = [], [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            toks = _tokens(t)
            if len(toks) < k:
                continue
            sig = minhash_signatures(shingle_set(toks, k), a, b)
            for bi in range(bands):
                chunk = sig[bi * rows_per_band:(bi + 1) * rows_per_band]
                band_ids.append(bi)
                band_hashes.append(stable_hash64(",".join(map(str, chunk))) & 0x7FFFFFFFFFFFFFFF)
                dids.append(did)
        return pa.table({"band": pa.array(band_ids, type=pa.int32()),
                         "band_hash": pa.array(band_hashes, type=pa.int64()),
                         "doc_id": pa.array(dids, type=pa.int64())})

    docs_ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # materialize: the (band, band_hash, doc_id) table is tiny relative to
    # the corpus and _bucket_candidates consumes it twice
    bands_ds = docs_ds.map_batches(to_bands, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
    cand_rows = _bucket_candidates(bands_ds, ["band", "band_hash"], "doc_id")
    if not cand_rows:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64())})

    need = {a for a, _ in cand_rows} | {b for _, b in cand_rows}
    need_ref = ray.put(need)

    def candidate_shingles(batch: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        ids, sh = [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            if did in wanted:
                ids.append(did)
                sh.append(sorted(shingle_set(_tokens(t), k)))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "shingles": pa.array(sh, type=pa.list_(pa.string()))})

    # only candidate docs' shingles reach the driver (candidates are
    # small by construction; at extreme scale swap for a hash join)
    sh_map = {r["doc_id"]: set(r["shingles"])
              for r in rd.read_parquet(f"{sf_dir}/documents.parquet",
                                       columns=["doc_id", "text"])
                        .map_batches(candidate_shingles, batch_format="pyarrow",
                                     zero_copy_batch=True).take_all()}
    out_a, out_b = [], []
    for r in sorted(cand_rows):
        sa, sb = sh_map.get(r[0]), sh_map.get(r[1])
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter and inter / (len(sa) + len(sb) - inter) >= threshold:
            out_a.append(r[0])
            out_b.append(r[1])
    return pa.table({"doc_a": pa.array(out_a, type=pa.int64()),
                     "doc_b": pa.array(out_b, type=pa.int64())})


# --------------------------------------------------------------------------- simhash


def simhash64(tokens: list) -> int:
    """64-bit SimHash over token hashes (unweighted)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = stable_hash64(t)
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8),
                             bitorder="little").astype(np.int64)
        acc += 2 * bits - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= (1 << i)
    return out


def simhash_signatures(sf_dir: str):
    """doc_id, simhash (as int64 two's complement)."""
    def fn(batch: pa.Table) -> pa.Table:
        sigs = []
        for t in batch.column("text").to_pylist():
            s = simhash64(_tokens(t))
            sigs.append(s - (1 << 64) if s >= (1 << 63) else s)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(sigs, type=pa.int64())})
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]) \
             .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs with Hamming distance ≤ d via the pigeonhole
    trick: split the 64-bit signature into d+1 chunks — any pair within
    distance ≤ d must share at least one chunk exactly — groupby chunk
    value yields candidates, then exact Hamming verify."""
    n_chunks = min(max_hamming + 1, 16)
    bounds = [round(i * 64 / n_chunks) for i in range(n_chunks + 1)]
    # compute signatures ONCE (doc_id + int64) and reuse for the
    # chunk-bucket pipeline; only *candidate* signatures are collected
    # to the driver after bucketing
    sigs_ds = simhash_signatures(sf_dir).materialize()

    def chunks_of(batch: pa.Table) -> pa.Table:
        cidx, cval, dids = [], [], []
        for did, s in zip(batch.column("doc_id").to_pylist(),
                          batch.column("simhash").to_pylist()):
            u = s & ((1 << 64) - 1)
            for ci in range(n_chunks):
                lo, hi = bounds[ci], bounds[ci + 1]
                cidx.append(ci)
                cval.append((u >> lo) & ((1 << (hi - lo)) - 1))
                dids.append(did)
        return pa.table({"chunk": pa.array(cidx, type=pa.int32()),
                         "val": pa.array(cval, type=pa.int32()),
                         "doc_id": pa.array(dids, type=pa.int64())})

    chunks_ds = sigs_ds.map_batches(chunks_of, batch_format="pyarrow").materialize()
    cand_rows = _bucket_candidates(chunks_ds, ["chunk", "val"], "doc_id")
    need = {a for a, _ in cand_rows} | {b for _, b in cand_rows}
    need_ref = ray.put(need)

    def candidate_sigs(batch: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        mask = [d in wanted for d in batch.column("doc_id").to_pylist()]
        return batch.filter(pa.array(mask, type=pa.bool_()))

    sig_map = {r["doc_id"]: r["simhash"] & ((1 << 64) - 1)
               for r in sigs_ds.map_batches(candidate_sigs, batch_format="pyarrow",
                                            zero_copy_batch=True).take_all()}
    out_a, out_b, dists = [], [], []
    for r in sorted(cand_rows):
        d = int(bin(sig_map[r[0]] ^ sig_map[r[1]]).count("1"))
        if d <= max_hamming:
            out_a.append(r[0])
            out_b.append(r[1])
            dists.append(d)
    return pa.table({"doc_a": pa.array(out_a, type=pa.int64()),
                     "doc_b": pa.array(out_b, type=pa.int64()),
                     "hamming": pa.array(dists, type=pa.int64())})


# --------------------------------------------------------------------------- embedding cosine near-dup


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.4):
    """(vec_a, vec_b) with cosine ≥ threshold — block-wise matmul
    against a broadcast normalized matrix (no pairwise shuffle)."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    E = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(E, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    En = E / norms
    mat_ref = ray.put((ids, En))

    def fn(batch: pa.Table) -> pa.Table:
        all_ids, allE = ray.get(mat_ref)
        bids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        B = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        bn = np.linalg.norm(B, axis=1, keepdims=True)
        bn[bn == 0] = 1.0
        B = B / bn
        C = B @ allE.T                                  # [batch, n]
        out_a, out_b = [], []
        for r in range(C.shape[0]):
            hits = np.where(C[r] >= threshold)[0]
            for h in hits:
                if bids[r] < all_ids[h]:                # each pair once
                    out_a.append(int(bids[r]))
                    out_b.append(int(all_ids[h]))
        return pa.table({"vec_a": pa.array(out_a, type=pa.int64()),
                         "vec_b": pa.array(out_b, type=pa.int64())})

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
             .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------- embedding LSH (random hyperplanes)


def _hyperplanes(dim: int, n_bits: int, seed: int = 99) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, n_bits))


def embedding_lsh_pairs(embeddings_ds_or_sf, threshold: float = 0.9,
                        n_bits: int = 128, band_bits: int = 8,
                        dim: int | None = None):
    """Random-hyperplane LSH near-dup pairs over an embedding column —
    the cosine analogue of MinHash-LSH (the scale path next to the
    brute-force matmul of :func:`embedding_neardup_pairs`).

    sign(v·H) gives an n_bits signature whose per-bit agreement
    probability is 1 − θ/π; banding (band_bits per band) buckets
    candidates, which are then verified with exact cosine (only
    candidate vectors are fetched).  Tuned for tight thresholds
    (cos ≥ 0.9) — the regime where "near-duplicate" is meaningful.
    """
    if isinstance(embeddings_ds_or_sf, str):
        ds = rd.read_parquet(f"{embeddings_ds_or_sf}/embeddings.parquet",
                             columns=["vec_id", "embedding"]).materialize()
    else:
        ds = embeddings_ds_or_sf.materialize()
    if dim is None:
        first = ds.take(1)[0]
        dim = len(first["embedding"])
    H = _hyperplanes(dim, n_bits)
    H_ref = ray.put(H)
    n_bands = n_bits // band_bits

    def to_bands(batch: pa.Table) -> pa.Table:
        Hm = ray.get(H_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        E = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        bits = (E @ Hm) > 0                                   # [n, n_bits]
        weights = (1 << np.arange(band_bits, dtype=np.int64))
        band_ids, vals, dids = [], [], []
        for bi in range(n_bands):
            chunk = bits[:, bi * band_bits:(bi + 1) * band_bits]
            v = chunk @ weights                               # [n]
            band_ids.extend([bi] * len(ids))
            vals.extend(int(x) for x in v)
            dids.extend(int(i) for i in ids)
        return pa.table({"band": pa.array(band_ids, type=pa.int32()),
                         "val": pa.array(vals, type=pa.int64()),
                         "vec_id": pa.array(dids, type=pa.int64())})

    bands_ds = ds.map_batches(to_bands, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    cand = _bucket_candidates(bands_ds, ["band", "val"], "vec_id")
    if not cand:
        return pa.table({"vec_a": pa.array([], type=pa.int64()),
                         "vec_b": pa.array([], type=pa.int64())})
    need = {a for a, _ in cand} | {b for _, b in cand}
    need_ref = ray.put(need)

    def candidate_vecs(batch: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        mask = [v in wanted for v in batch.column("vec_id").to_pylist()]
        return batch.filter(pa.array(mask, type=pa.bool_()))

    rows = ds.map_batches(candidate_vecs, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    vec = {}
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        n = np.linalg.norm(v)
        vec[r["vec_id"]] = v / n if n > 0 else v
    out_a, out_b = [], []
    for a, b in sorted(cand):
        if float(vec[a] @ vec[b]) >= threshold:
            out_a.append(a)
            out_b.append(b)
    return pa.table({"vec_a": pa.array(out_a, type=pa.int64()),
                     "vec_b": pa.array(out_b, type=pa.int64())})
