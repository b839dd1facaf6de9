"""Stream-shaped workloads over the ``events`` log table.

Ray Data has no event-time windows/watermarks; the batch expression of
a session window (SURVEY.md §2.9 analogue) is: treat events as an
ordered partitioned log — sort by (user_id, ts) — then sessionize each
user's contiguous run.  Sessionization is a MERGEABLE summary: per
boundary user a block ships one (n_events, n_sessions, first_ts,
last_ts) partial, and adjacent partials fold with
``sessions = s1 + s2 - (gap_between <= gap_us)``.  So hot users at a
block boundary cost O(1) shipped rows, never raw event rows, and the
interior result streams.  Exact, with a DuckDB window-function oracle.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages._runs import edge_interior_exchange
from ..stages._runs import edge_mask as _edge_mask

__all__ = ["user_sessions"]

_GAP_US = 30 * 60 * 1_000_000          # 30-minute session gap


def _session_stats(df: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """df(user_id, ts_us) sorted by (user_id, ts_us) → per-user
    (n_events, n_sessions, first_ts, last_ts)."""
    g = df.groupby("user_id", sort=True)
    n_events = g.size()
    new_session = (df.groupby("user_id")["ts_us"].diff() > gap_us)
    n_sessions = new_session.groupby(df["user_id"]).sum() + 1
    return pd.DataFrame({
        "user_id": n_events.index.astype("int64"),
        "n_events": n_events.values.astype("int64"),
        "n_sessions": n_sessions.values.astype("int64"),
        "first_ts": g["ts_us"].min().values.astype("int64"),
        "last_ts": g["ts_us"].max().values.astype("int64"),
    })


def _merge_partials(df: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """Fold per-block partials (sorted by user_id, first_ts) into final
    per-user stats.  Adjacent partials of one user cover disjoint,
    ordered ts ranges (they come from a global sort), so the only
    correction is the session bridge across each block boundary."""
    df = df.sort_values(["user_id", "first_ts"], kind="mergesort")
    same_user = df["user_id"].eq(df["user_id"].shift())
    bridge_gap = df["first_ts"] - df["last_ts"].shift()
    bridged = (same_user & (bridge_gap <= gap_us)).astype("int64")
    g = df.groupby("user_id", sort=True)
    out = pd.DataFrame({
        "user_id": g.size().index.astype("int64"),
        "n_events": g["n_events"].sum().values.astype("int64"),
        "n_sessions": (g["n_sessions"].sum()
                       - bridged.groupby(df["user_id"]).sum()).values.astype("int64"),
    })
    return out


def user_sessions(sf_dir: str, gap_us: int = _GAP_US):
    """(user_id, n_events, n_sessions) with a 30-min inactivity gap."""
    import ray

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
        })

    n_part = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    # materialize: the exchange consumes the sorted blocks twice, and a
    # re-executed sort may split blocks differently between the passes
    srt = (rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
           .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
           .repartition(n_part)
           .sort(["user_id", "ts_us"])
           .materialize())

    _OUT = ["user_id", "n_events", "n_sessions"]
    _PARTIAL = ["user_id", "n_events", "n_sessions", "first_ts", "last_ts"]

    def _empty(cols) -> pa.Table:
        return pa.table({c: pa.array([], type=pa.int64()) for c in cols})

    def edge_partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(_PARTIAL)
        e = batch.filter(_edge_mask(batch.column("user_id")))
        if e.num_rows == 0:
            return _empty(_PARTIAL)
        stats = _session_stats(e.to_pandas(), gap_us)
        return pa.Table.from_pandas(stats, preserve_index=False)

    def interior(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(_OUT)
        i = batch.filter(pc.invert(_edge_mask(batch.column("user_id"))))
        if i.num_rows == 0:
            return _empty(_OUT)
        stats = _session_stats(i.to_pandas(), gap_us)
        return pa.Table.from_pandas(stats[_OUT], preserve_index=False)

    def merge(edge_tables) -> pa.Table:
        merged = _merge_partials(
            pa.concat_tables(edge_tables).to_pandas(), gap_us)
        return pa.Table.from_pandas(merged, preserve_index=False)

    return edge_interior_exchange(srt, edge_partials, interior, merge)
