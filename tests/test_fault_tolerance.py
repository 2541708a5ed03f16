"""Worker-loss fault tolerance: a Ray Data job must survive the death of a
worker PROCESS mid-task (the cluster reality: OOM-kills, spot preemption,
node loss) and still produce complete, correct output via Ray's task retry
/ actor restart — with the crashed attempt's partial work never double-
counted.  This is the intra-job complement to the SIGKILL-the-driver resume
e2e (`test_kill_resume_e2e.py`): together they cover both failure domains
the north rule's multi-node deployment cares about.

The crash is real (``os._exit`` — no exception propagates, the worker
process dies as if OOM-killed); a filesystem sentinel makes it happen
exactly once so the retried attempt succeeds.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def _crash_once_fn(sentinel: str):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        if 0 in ids:
            # claim the sentinel atomically, then die hard (no cleanup,
            # no exception — a real process loss)
            try:
                fd = os.open(sentinel, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                os._exit(1)
            except FileExistsError:
                pass  # retried attempt: sentinel already claimed, do the work
        return pa.table({"id": batch["id"], "doubled": pa.compute.multiply(batch["id"], 2)})

    return fn


@pytest.mark.slow
def test_map_task_survives_worker_crash(tmp_path, ray_session):
    import ray.data as rd

    sentinel = str(tmp_path / "crashed_task")
    ds = rd.range(10_000, override_num_blocks=8).map_batches(
        _crash_once_fn(sentinel), batch_format="pyarrow"
    )
    rows = ds.take_all()
    assert os.path.exists(sentinel), "the crash path never ran — test is vacuous"
    assert len(rows) == 10_000
    got = sorted(r["id"] for r in rows)
    assert got == list(range(10_000))
    assert all(r["doubled"] == 2 * r["id"] for r in rows)


@pytest.mark.slow
def test_actor_pool_survives_actor_crash(tmp_path, ray_session):
    """Actor-pool stage whose first-ever __call__ on the id==0 batch kills
    its own worker process; the pool must replace the actor and re-run the
    batch on a healthy one.

    The actor class is deliberately defined INSIDE the test: a module-level
    class in tests/ pickles BY REFERENCE to a module Ray workers cannot
    import (tests/ is only on pytest's sys.path), the constructor then fails
    on every restart, and ``max_restarts=-1`` turns that into an infinite
    restart loop — the job hangs instead of erroring (observed: 57
    ModuleNotFoundError restarts before the kill).  A local class makes
    cloudpickle serialize it by value, which is also what library users get
    when their stage classes live in an importable package."""
    import ray.data as rd

    sentinel = str(tmp_path / "crashed_actor")

    class CrashOnceActor:
        # NB: no reference to any test-module global (e.g. _crash_once_fn) —
        # those would pickle by reference into the unimportable module too.
        def __init__(self, path: str):
            self._path = path

        def __call__(self, batch):
            import os as _os

            import pyarrow as _pa
            import pyarrow.compute as _pc

            if 0 in batch["id"].to_pylist():
                try:
                    fd = _os.open(self._path, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
                    _os.close(fd)
                    _os._exit(1)
                except FileExistsError:
                    pass
            return _pa.table(
                {"id": batch["id"], "doubled": _pc.multiply(batch["id"], 2)}
            )

    ds = rd.range(10_000, override_num_blocks=8).map_batches(
        CrashOnceActor,
        fn_constructor_args=(sentinel,),
        concurrency=2,
        batch_format="pyarrow",
        max_restarts=-1,
        max_task_retries=-1,
    )
    rows = ds.take_all()
    assert os.path.exists(sentinel), "the crash path never ran — test is vacuous"
    assert len(rows) == 10_000
    assert sorted(r["id"] for r in rows) == list(range(10_000))
