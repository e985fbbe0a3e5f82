"""Straggler handling (speculative execution): investigated, honestly pinned.

The reference's lease-stale path (``src/mr/coordinator.rs:72-131``)
reassigns a SLOW worker's task, not just a dead one. Spark's analog is
speculative execution (``spark.speculation``): when a task runs past
``speculation.multiplier``x the stage median, the scheduler launches a
second attempt and takes the first finisher.

WHAT THIS TEST PINS: speculation cannot be *demonstrated end-to-end* in
this environment, and that is a property of Spark's scheduler, not of
this engine's code. ``TaskSetManager.dequeueSpeculativeTask`` refuses to
launch a speculative copy on a host that already has a running attempt
of the same task (the whole point is to dodge a slow MACHINE), and
``local[N]`` / ``local-cluster[...]`` are single-host — so a speculative
copy has nowhere legal to go. The probe below enables maximally
aggressive speculation, plants one 6-second straggler task, and shows
(a) the job completes with correct results with speculation ENABLED (the
conf is production-safe), and (b) wall time >= the straggler sleep — the
scheduler did NOT rescue the stage, exactly as the same-host exclusion
predicts. On a real multi-host cluster the identical conf launches the
copy; nothing in this engine's operators interferes (they are all
deterministic dataflow, safe to re-execute — the property speculation
requires and task-retry, tests/test_fault_tolerance.py, already
demonstrates end-to-end).

Runs in a subprocess: speculation confs are read at SparkContext
creation, and the suite's shared session must not be torn down.
"""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap

_PROBE = textwrap.dedent(
    """
    import json, sys, time
    from pyspark.sql import SparkSession

    SLEEP_SEC = 6
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("speculation-probe")
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "100ms")
        .config("spark.speculation.multiplier", "1.1")
        .config("spark.speculation.quantile", "0.4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def slow_p0(it):
        from pyspark import TaskContext
        ctx = TaskContext.get()
        if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            time.sleep(SLEEP_SEC)
        return it

    t0 = time.time()
    n = spark.sparkContext.parallelize(range(800), 8).mapPartitions(slow_p0).count()
    print(json.dumps({"n": n, "wall": time.time() - t0, "sleep": SLEEP_SEC}))
    spark.stop()
    """
)


def test_speculation_single_host_behavior():
    out = subprocess.run(
        [sys.executable, "-c", _PROBE], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    # (a) correctness is unaffected by enabling speculation
    assert result["n"] == 800
    # (b) the same-host exclusion held: no speculative copy rescued the
    # straggler, so the stage waited for the full sleep. If a future
    # Spark version lifts the restriction in local mode, this assertion
    # fails LOUDLY and the test should be upgraded to assert the rescue
    # (wall << sleep) instead.
    assert result["wall"] >= result["sleep"]
