"""Fault-injection: a WORKER PROCESS dying mid-stream must not change
the pipeline's output — Ray re-executes the lost task from lineage and
the stage UDFs are pure functions of (batch, frozen state), so the
retry is safe (SURVEY §4: idempotent stage UDFs are the designed retry
contract).  The injection SIGKILLs the worker (a system failure — the
class Ray's lineage retry covers; a Python exception would surface as
a user error by design) exactly once, via a marker file.  Both a
stateless task stage and a stateful actor-pool stage are killed; each
faulted run must equal the clean run bitwise.

All UDFs are defined INSIDE the tests: module-level functions in a
test file pickle by reference and a RESTARTED worker cannot import the
test module (closures/local classes pickle by value)."""

import os
import signal
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _rows(ds):
    return sorted(tuple(sorted(r.items())) for r in ds.take_all())


def test_task_worker_death_is_invisible(ray_session):
    from kgray.stages.aggregate import sorted_group_aggregate

    marker = os.path.join(tempfile.mkdtemp(prefix="kgray_fault_"),
                          "die_once")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "cents": pc.cast(pc.round(pc.multiply(
                batch.column("value"), pa.scalar(100.0))), pa.int64()),
            "one": pa.array([1] * batch.num_rows, type=pa.int64())})

    def killer(batch: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
                f.flush()
                os.fsync(f.fileno())
            os.kill(os.getpid(), signal.SIGKILL)
        return project(batch)

    def agg(fn):
        ds = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "value"])
        return sorted_group_aggregate(
            ds.map_batches(fn, batch_format="pyarrow"),
            ["user_id"], [("cents", "sum"), ("one", "sum")],
            precombine=True)

    want = _rows(agg(project))
    got = _rows(agg(killer))
    assert os.path.exists(marker), "injection never fired"
    assert got == want


def test_actor_worker_death_is_invisible(ray_session):
    from kgray.stages.aggregate import sorted_group_aggregate

    marker = os.path.join(tempfile.mkdtemp(prefix="kgray_fault_"),
                          "actor_die_once")

    class KillOnceActor:
        """Stateful stage whose first actor SIGKILLs itself once."""

        def __init__(self, marker_path: str):
            self.marker = marker_path

        def __call__(self, batch: pa.Table) -> pa.Table:
            if not os.path.exists(self.marker):
                with open(self.marker, "w") as f:
                    f.write("x")
                    f.flush()
                    os.fsync(f.fileno())
                os.kill(os.getpid(), signal.SIGKILL)
            return pa.table({
                "user_id": batch.column("user_id"),
                "n": pa.array([1] * batch.num_rows, type=pa.int64())})

    def agg(ds):
        return _rows(sorted_group_aggregate(
            ds, ["user_id"], [("n", "sum")], precombine=True))

    def scan():
        return rd.read_parquet(f"{SF}/events.parquet",
                               columns=["user_id"])

    want = agg(scan().map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "n": pa.array([1] * b.num_rows, type=pa.int64())}),
        batch_format="pyarrow"))
    got = agg(scan().map_batches(
        KillOnceActor,
        fn_constructor_kwargs={"marker_path": marker},
        batch_format="pyarrow", batch_size=512,
        concurrency=2, num_cpus=1, max_restarts=4,
        max_task_retries=-1))
    assert os.path.exists(marker), "injection never fired"
    assert got == want
