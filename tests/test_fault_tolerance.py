"""Fault-tolerance: a worker PROCESS dying mid-task must not fail the
job — Ray retries the task on a fresh worker (system-failure retry) and
the pipeline completes with full, correct output."""

import os

import pyarrow as pa

import ray.data


def test_worker_crash_is_retried(ray_session, tmp_path):
    flag = str(tmp_path / "crashed_once")
    rows = [{"i": i} for i in range(100)]

    def crash_once(batch: pa.Table) -> pa.Table:
        # first task to see i==0 hard-kills its worker process AFTER
        # dropping a flag; the retried attempt passes through
        if 0 in batch.column("i").to_pylist() and not os.path.exists(flag):
            open(flag, "w").close()
            os._exit(1)  # simulates OOM-kill / node loss, not a UDF bug
        return batch

    ds = ray.data.from_items(rows).repartition(10)
    out = ds.map_batches(crash_once, batch_format="pyarrow").take_all()
    assert os.path.exists(flag)  # the crash really happened
    assert sorted(r["i"] for r in out) == list(range(100))  # nothing lost
