"""Stream-shaped workloads over the ``events`` log table.

Ray Data has no event-time windows/watermarks; the batch expression of
a session window (SURVEY.md §2.9 analogue) is: treat events as an
ordered partitioned log — sort by (user_id, ts) — then sessionize each
user's contiguous run.  Users whose runs touch a block boundary are
routed to one small driver-side merge (same edge pattern as
``stages/aggregate.py``), everything else is vectorized pandas per
block.  Exact, with a DuckDB window-function oracle.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["user_sessions"]

_GAP_US = 30 * 60 * 1_000_000          # 30-minute session gap


def _sessionize(df: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """df(user_id, ts_us) sorted by (user_id, ts_us) → per-user stats."""
    if df.empty:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "n_events": pd.Series([], dtype="int64"),
                             "n_sessions": pd.Series([], dtype="int64")})
    g = df.groupby("user_id", sort=True)
    n_events = g.size()
    new_session = (df.groupby("user_id")["ts_us"].diff() > gap_us)
    n_sessions = new_session.groupby(df["user_id"]).sum() + 1
    return pd.DataFrame({"user_id": n_events.index.astype("int64"),
                         "n_events": n_events.values.astype("int64"),
                         "n_sessions": n_sessions.values.astype("int64")})


def user_sessions(sf_dir: str, gap_us: int = _GAP_US):
    """(user_id, n_events, n_sessions) with a 30-min inactivity gap."""
    import ray


    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
        })

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    ds = (rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
          .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
          .repartition(n_part)
          .sort(["user_id", "ts_us"]))

    def block_sessions(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64()),
                             "n_sessions": pa.array([], type=pa.int64()),
                             "ts_us": pa.array([], type=pa.int64()),
                             "__edge": pa.array([], type=pa.bool_())})
        uid = batch.column("user_id")
        edge = pc.or_(pc.equal(uid, uid[0]), pc.equal(uid, uid[-1]))
        interior = batch.filter(pc.invert(edge)).to_pandas()
        stats = _sessionize(interior, gap_us)
        out = pa.table({
            "user_id": pa.array(stats["user_id"], type=pa.int64()),
            "n_events": pa.array(stats["n_events"], type=pa.int64()),
            "n_sessions": pa.array(stats["n_sessions"], type=pa.int64()),
            "ts_us": pa.nulls(len(stats), type=pa.int64()),
            "__edge": pa.array([False] * len(stats), type=pa.bool_()),
        })
        e = batch.filter(edge)
        edges = pa.table({
            "user_id": e.column("user_id"),
            "n_events": pa.nulls(e.num_rows, type=pa.int64()),
            "n_sessions": pa.nulls(e.num_rows, type=pa.int64()),
            "ts_us": e.column("ts_us"),
            "__edge": pa.array([True] * e.num_rows, type=pa.bool_()),
        })
        return pa.concat_tables([out, edges])

    blocks = ds.map_batches(block_sessions, batch_format="pyarrow").materialize()
    interior = blocks.map_batches(
        lambda b: b.filter(pc.invert(b.column("__edge")))
                   .select(["user_id", "n_events", "n_sessions"]),
        batch_format="pyarrow")
    edge_refs = blocks.map_batches(
        lambda b: b.filter(b.column("__edge")).select(["user_id", "ts_us"]),
        batch_format="pyarrow").to_arrow_refs()
    edge_tables = [t for t in ray.get(edge_refs) if t.num_rows]
    if not edge_tables:
        return interior
    edf = pa.concat_tables(edge_tables).to_pandas().sort_values(["user_id", "ts_us"])
    stats = _sessionize(edf, gap_us)
    return interior.union(rd.from_arrow(pa.Table.from_pandas(stats, preserve_index=False)))
