"""Live task-level progress reporting for long batch jobs.

The reference engine renders three indicatif spinners while converting
(/root/reference/src/main.rs:63-86: statements read / rows parsed / rows
written).  The Spark-native analogue has two layers:

* per-query row counts via ``df.observe`` (already wired into
  ``convert_dump`` — exact, no re-read of the output), and
* THIS module: live in-flight progress from the driver's
  ``StatusTracker`` — completed/total tasks per active stage, polled by
  a daemon thread and rendered to stderr while jobs run.

``StatusTracker`` is driver-side public API (no listener-bus callback
server, which PySpark only supports for streaming), so this works on any
deployment the engine targets, local or cluster.
"""

from __future__ import annotations

import sys
import threading
import time

from pyspark.sql import SparkSession


class ProgressReporter:
    """Context manager: while active, a daemon thread renders the live
    task progress of every running Spark job to ``out``.

    >>> with ProgressReporter(spark, "ingest"):
    ...     df.write.parquet(path)

    Lines look like ``[ingest] job 3 stage 7: 12/32 tasks``; a final
    summary line reports jobs seen and wall time.  Zero overhead on the
    executors — the poll reads driver-held stage state only."""

    def __init__(
        self,
        spark: SparkSession,
        label: str,
        interval: float = 0.5,
        out=None,
    ) -> None:
        self._sc = spark.sparkContext
        self._label = label
        self._interval = interval
        self._out = out if out is not None else sys.stderr
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._jobs_seen: set[int] = set()
        self._t0 = 0.0

    def _poll_once(self) -> None:
        tracker = self._sc.statusTracker()
        for jid in tracker.getActiveJobsIds():
            self._jobs_seen.add(jid)
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                stage = tracker.getStageInfo(sid)
                if stage is None or stage.numTasks == 0:
                    continue
                if stage.numCompletedTasks >= stage.numTasks:
                    continue
                print(
                    f"[{self._label}] job {jid} stage {sid}: "
                    f"{stage.numCompletedTasks}/{stage.numTasks} tasks",
                    file=self._out,
                )

    def _run(self) -> None:
        while not self._stop.wait(self._interval):
            try:
                self._poll_once()
            except Exception:  # py4j races on teardown — never kill the job
                return

    def __enter__(self) -> "ProgressReporter":
        self._t0 = time.perf_counter()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        dt = time.perf_counter() - self._t0
        print(
            f"[{self._label}] done: {len(self._jobs_seen)} job(s) in {dt:.1f}s",
            file=self._out,
        )
