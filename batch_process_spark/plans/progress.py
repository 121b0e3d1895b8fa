"""Run-progress introspection (SURVEY §3.2: the reference streams
per-step progress to its GUI via Qt signals; Spark-side the engine's
job/stage/task counters come from the status tracker — no pre-walk of
the tree needed, unlike the reference's double traversal).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class ProgressSnapshot:
    active_jobs: int
    active_stages: int
    completed_tasks: int
    active_tasks: int
    total_tasks: int

    @property
    def fraction(self) -> float:
        return self.completed_tasks / self.total_tasks if self.total_tasks else 1.0


def snapshot(spark: SparkSession) -> ProgressSnapshot:
    """Point-in-time progress across all active jobs."""
    tracker = spark.sparkContext.statusTracker()
    job_ids = tracker.getActiveJobsIds()
    stage_ids = tracker.getActiveStageIds()
    completed = active = total = 0
    for sid in stage_ids:
        info = tracker.getStageInfo(sid)
        if info:
            completed += info.numCompletedTasks
            active += info.numActiveTasks
            total += info.numTasks
    return ProgressSnapshot(
        active_jobs=len(job_ids),
        active_stages=len(stage_ids),
        completed_tasks=completed,
        active_tasks=active,
        total_tasks=total,
    )


class ProgressReporter:
    """Poll progress from a background thread while an action runs —
    the distributed stand-in for the reference's per-step callbacks
    (``engine.py:485-537``). Usage::

        with ProgressReporter(spark, interval=1.0) as p:
            df.write.parquet(out)
        print(p.samples)  # list of ProgressSnapshot
    """

    def __init__(self, spark: SparkSession, interval: float = 1.0):
        self.spark = spark
        self.interval = interval
        self.samples: list[ProgressSnapshot] = []
        self._stop = None
        self._thread = None

    def __enter__(self):
        import threading

        self._stop = threading.Event()

        def loop():
            while not self._stop.wait(self.interval):
                try:
                    self.samples.append(snapshot(self.spark))
                except Exception:
                    pass

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5)
        return False


class JobGroup:
    """Cancellable scope for Spark actions — the distributed equivalent
    of the reference's Qt interruption flag polled between steps
    (``engine.py:82-85``). Actions started inside the scope belong to
    the group; ``cancel()`` (from any thread) aborts them::

        jg = JobGroup(spark, "pipeline-run-42")
        with jg:
            df.write.parquet(out)   # cancellable from another thread
    """

    def __init__(self, spark: SparkSession, group_id: str, description: str = ""):
        self.spark = spark
        self.group_id = group_id
        self.description = description

    def __enter__(self):
        self.spark.sparkContext.setJobGroup(
            self.group_id, self.description, interruptOnCancel=True
        )
        return self

    def __exit__(self, *exc):
        self.spark.sparkContext.setJobGroup("", "")
        return False

    def cancel(self) -> None:
        self.spark.sparkContext.cancelJobGroup(self.group_id)
