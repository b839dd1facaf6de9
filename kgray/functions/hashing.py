"""Stable (process-independent) hashing utilities.

Python's builtin ``hash`` is salted per process, so every key used for
partitioning, salting, dedup or embedding seeds goes through these
md5/blake2-based helpers instead — identical on every worker, every run.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["stable_hash64", "stable_hash_bytes", "salt_of", "hash_embedding",
           "shingles", "char_ngrams"]


def stable_hash64(s: str) -> int:
    """64-bit stable hash of a string."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def stable_hash_bytes(b: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")


def salt_of(s: str, n_salts: int) -> int:
    """Deterministic salt bucket for skew mitigation (hash(url) % S)."""
    return stable_hash64(s) % n_salts


def hash_embedding(key: str, dim: int = 32) -> np.ndarray:
    """Deterministic pseudo-random unit vector derived from a string key.

    Used for the synthetic entity-embedding table and for context
    embeddings (average of token vectors) — a deterministic stand-in for
    a learned embedding model; the plumbing (broadcast matrix, cosine
    scoring) is the real thing.
    """
    seed = stable_hash64(key) % (2**32)
    v = np.random.default_rng(seed).standard_normal(dim)
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def shingles(tokens: list, k: int = 3) -> set:
    """Token k-shingles (for MinHash / Jaccard)."""
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)}


def char_ngrams(text: str, n: int = 5) -> set:
    if len(text) < n:
        return {text} if text else set()
    return {text[i:i + n] for i in range(len(text) - n + 1)}
