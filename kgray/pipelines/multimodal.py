"""Multimodal (binary-column) stages: the Ray-side plumbing for
image/audio payloads carried as opaque ``binary`` columns with typed
metadata.

The actual codecs (Pillow/ffmpeg) are not in this environment, so the
decode step is STUBBED: :class:`BinaryFeaturizer` computes a
deterministic fake feature (byte histogram) unless a real decoder is
injected, and :func:`decode_image` raises ``NotImplementedError`` with
a clear message.  Everything around the stub — schema, actor-pool
signature, batch sizing for large binary rows, output layout — is real
and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = ["decode_image", "byte_histogram", "BinaryFeaturizer",
           "binary_features"]

N_BUCKETS = 16


def decode_image(payload: bytes):
    """Real image decoding requires an image codec (e.g. Pillow), which
    is not available in this environment."""
    raise NotImplementedError(
        "image decoding needs an image codec (Pillow/libjpeg); not "
        "available in this sandbox — inject `decoder=` into "
        "BinaryFeaturizer for the real path")


def byte_histogram(payload: bytes, n_buckets: int = N_BUCKETS) -> np.ndarray:
    """Deterministic stand-in feature: histogram of bytes over
    256/n_buckets-wide buckets."""
    if not payload:
        return np.zeros(n_buckets, dtype=np.int64)
    arr = np.frombuffer(payload, dtype=np.uint8)
    return np.bincount(arr >> 4, minlength=n_buckets).astype(np.int64)


class BinaryFeaturizer:
    """Actor-pool stage over a binary column.

    ``__init__`` is where a real model/codec would load (once per
    actor); ``__call__`` featurizes one Arrow batch.  Use small
    ``batch_size`` for large payloads so batch × concurrency fits in
    worker heap.
    """

    def __init__(self, column: str = "html", decoder=None):
        self.column = column
        self.decoder = decoder or byte_histogram    # stub by default

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, sizes = [], []
        for payload in batch.column(self.column).to_pylist():
            b = payload if payload is not None else b""
            feats.append(self.decoder(b).tolist())
            sizes.append(len(b))
        return pa.table({
            "url": batch.column("url"),
            "n_bytes": pa.array(sizes, type=pa.int64()),
            "features": pa.array(feats, type=pa.list_(pa.int64())),
        })


def binary_features(pages, concurrency: int | None = None, batch_size: int = 256,
                    column: str = "html"):
    """binary-column rows → per-url feature rows via the featurizer pool.

    ``pages``: parquet path(s) or an existing Dataset.  Size
    ``batch_size`` to the payloads: batch_size × payload × concurrency
    must fit the workers' heap (e.g. 16 for 10 MB images).
    """
    if concurrency is None:
        from .kg import _auto_concurrency
        concurrency = _auto_concurrency()[0]        # ≈ half the CPUs
    ds = pages if hasattr(pages, "map_batches") else \
        rd.read_parquet(pages, columns=["url", column])
    return ds.map_batches(BinaryFeaturizer, fn_constructor_kwargs={"column": column},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)
