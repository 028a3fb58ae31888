"""Job control: cancel / pause / progress for long-running match jobs.

Reference surface (`src/run_service/mod.rs:128-289`): `CancelToken`,
`PauseToken`, `JobHandle` (state/elapsed/cancel/pause/resume/join) and
a `JobRegistry` keyed by job id.

Spark-first re-expression: a job is a SPARK JOB GROUP.  Cancel maps
to `SparkContext.cancelJobGroup` (tears down all running stages of the
group, cluster-wide); progress comes from the `statusTracker` job/stage
APIs; pause is cooperative exactly like the reference's `PauseToken`
(Spark cannot suspend a running stage — neither can the reference
suspend a rayon loop mid-batch; both check the token BETWEEN work
units, here between chunks/levels of a driver loop such as
``run_cascade`` or ``run_resumable``).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

__all__ = ["JobHandle", "JobRegistry"]


@dataclass
class JobHandle:
    """One controllable job == one Spark job group."""

    spark: SparkSession
    job_id: str
    description: str = ""
    started_at: float = field(default_factory=time.time)
    _cancelled: bool = field(default=False, repr=False)
    _paused: threading.Event = field(default_factory=threading.Event, repr=False)

    def __post_init__(self) -> None:
        # all actions issued by this thread after this point belong to
        # the group and are cancellable as a unit.  setJobGroup is
        # THREAD-LOCAL: the handle must be created on the same thread
        # that executes the job's Spark actions, or cancel/progress
        # will scope to the wrong work — use attach() from a worker
        # thread.
        self.attach()
        self._paused.set()  # set == running

    def attach(self) -> None:
        """(Re)bind the CURRENT thread's actions to this job group —
        call at the top of any worker thread running this job's
        actions (job-group assignment is a thread-local)."""
        self.spark.sparkContext.setJobGroup(
            self.job_id, self.description or self.job_id, interruptOnCancel=True
        )

    # --- cancel (run_service CancelToken + JobHandle.cancel) -------------

    def cancel(self) -> None:
        self._cancelled = True
        self._paused.set()  # a paused job must observe the cancel
        self.spark.sparkContext.cancelJobGroup(self.job_id)

    @property
    def is_cancelled(self) -> bool:
        return self._cancelled

    # --- pause (cooperative, like PauseToken) -----------------------------

    def request_pause(self) -> None:
        self._paused.clear()

    def request_resume(self) -> None:
        self._paused.set()

    @property
    def is_paused(self) -> bool:
        return not self._paused.is_set()

    def checkpoint(self) -> None:
        """Call between work units (levels, chunks, partitions-groups).
        Blocks while paused; raises if cancelled — the reference's
        `token.is_cancelled()` loop check (mod.rs:214-230)."""
        self._paused.wait()
        if self._cancelled:
            raise InterruptedError(f"job {self.job_id} cancelled")

    # --- progress (statusTracker twin of run_service progress DTOs) ------

    def elapsed(self) -> float:
        return time.time() - self.started_at

    def progress(self) -> dict:
        """Live stage progress for THIS group only: the group's active
        jobs' stages -> task fraction + naive ETA (the reference's
        per-chunk ETA, mod.rs progress callbacks).  Stages are resolved
        via getJobIdsForGroup(job_id) -> job infos -> stage ids, so
        concurrent jobs from other handles/sessions never pollute the
        counts."""
        st = self.spark.sparkContext.statusTracker()
        stage_ids: set[int] = set()
        for jid in st.getJobIdsForGroup(self.job_id):
            jinfo = st.getJobInfo(jid)
            if jinfo is not None and jinfo.status == "RUNNING":
                stage_ids.update(jinfo.stageIds)
        active = [sid for sid in st.getActiveStageIds() if sid in stage_ids]
        total = done = 0
        for sid in active:
            info = st.getStageInfo(sid)
            if info is None:
                continue
            total += info.numTasks
            done += info.numCompletedTasks
        frac = (done / total) if total else None
        eta = (self.elapsed() * (1 - frac) / frac) if frac else None
        return {
            "job_id": self.job_id,
            "state": "cancelled" if self._cancelled
            else "paused" if self.is_paused else "running",
            "elapsed_sec": round(self.elapsed(), 2),
            "active_stages": len(active),
            "tasks_done": done,
            "tasks_total": total,
            "fraction": frac,
            "eta_sec": round(eta, 1) if eta is not None else None,
        }

    def close(self) -> None:
        """Detach the thread from the group (job end)."""
        self.spark.sparkContext.setJobGroup(None, None)


class JobRegistry:
    """run_service JobRegistry twin: job id -> handle."""

    def __init__(self) -> None:
        self._jobs: dict[str, JobHandle] = {}
        self._lock = threading.Lock()

    def start(self, spark: SparkSession, job_id: str, description: str = "") -> JobHandle:
        handle = JobHandle(spark, job_id, description)
        with self._lock:
            self._jobs[job_id] = handle
        return handle

    def get(self, job_id: str) -> JobHandle | None:
        with self._lock:
            return self._jobs.get(job_id)

    def list(self) -> list[dict]:
        with self._lock:
            return [h.progress() for h in self._jobs.values()]

    def remove(self, job_id: str) -> None:
        with self._lock:
            self._jobs.pop(job_id, None)
