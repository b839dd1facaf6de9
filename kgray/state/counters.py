"""Per-run lineage counters.

A single ``num_cpus=0`` counter actor receives fire-and-forget
increments from every stage (one tiny message per batch, not per row) —
the distributed replacement for the reference's in-process running
totals (``crf_ner.py:607-637``).  Counter values land in the checkpoint
manifest's lineage records.
"""

from __future__ import annotations

from collections import defaultdict

import ray

__all__ = ["CounterActor", "new_counter", "counting_passthrough"]


@ray.remote(num_cpus=0)
class CounterActor:
    def __init__(self):
        self.counts = defaultdict(int)

    def add(self, key: str, n: int) -> None:
        self.counts[key] += n

    def get(self) -> dict:
        return dict(self.counts)

    def reset(self) -> None:
        self.counts.clear()


def new_counter():
    return CounterActor.remote()


def counting_passthrough(counter, key: str):
    """A zero-copy map_batches stage that counts rows and passes the
    Arrow batch through unchanged.

    The increment is ray.get-waited before the batch is returned: Ray
    gives no cross-caller ordering, so a fire-and-forget add could
    still be in flight when the driver (after write_parquet) reads the
    totals — under-reporting lineage counts.  The wait makes pipeline
    completion imply all adds are applied (one ~µs actor call per
    batch, not per row)."""
    def fn(batch):
        ray.get(counter.add.remote(key, batch.num_rows))
        return batch
    return fn
