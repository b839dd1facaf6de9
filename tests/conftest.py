import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_RAY_ARGS = dict(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")


def _init_ray():
    import ray

    ray.init(**_RAY_ARGS)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session at a time for the whole pytest run (driver
    contract); see ``_ray_recycle`` for the periodic stability
    restart."""
    import ray

    if not ray.is_initialized():
        _init_ray()
    yield
    import ray

    ray.shutdown()


_MODULES_SEEN = {"n": 0}
_RECYCLE_EVERY = 12


@pytest.fixture(scope="module", autouse=True)
def _ray_recycle():
    """Ray 2.49 intermittently dies on internal CHECKs
    (reference_count.cc:581 / task_manager.cc:930) in single local
    sessions that execute many hundreds of Datasets (NOTES.md #63) —
    it killed one full-suite run at ~24%.  Recycling the local cluster
    every few test MODULES keeps each session well inside the observed
    crash horizon.  Module boundaries only: module-scoped fixtures may
    hold Datasets, which must not outlive their session."""
    import ray

    _MODULES_SEEN["n"] += 1
    if _MODULES_SEEN["n"] % _RECYCLE_EVERY == 0 and ray.is_initialized():
        ray.shutdown()
        _init_ray()
    yield


@pytest.fixture(scope="session")
def tiny_corpus_dir(tmp_path_factory):
    """Small deterministic synthetic corpus shared across tests."""
    from kgray.sources.corpus import generate_corpus

    out = tmp_path_factory.mktemp("corpus")
    generate_corpus(str(out), n_pages=120, seed=7, pages_per_shard=30)
    return str(out)
