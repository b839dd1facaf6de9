"""Checkpoint manifest: per-partition-group lineage records (JSONL).

One record per *completed* partition group (FIXTURES.md F6): input
files, per-stage counters, output directory, wall time.  A killed run
resumes by skipping groups already recorded — at-least-once semantics
with output isolation per group (each group writes only under its own
``group=<id>/`` directory, so partial runs never interleave).
"""

from __future__ import annotations

import json
import os

__all__ = ["Manifest"]


class Manifest:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def records(self) -> list:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def done_groups(self) -> set:
        return {r["group_id"] for r in self.records() if r.get("status") == "done"}

    def append(self, record: dict) -> None:
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())
