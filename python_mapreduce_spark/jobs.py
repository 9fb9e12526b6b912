"""Driver-side job runner: the reference scheduler's surface (O27-O29)
without its machinery.

The reference runs a flock-guarded job file with priorities, job groups,
``run_once``/``force_run`` flags, success/failure logs and cascade
group deletion on failure, plus three job types — mapreduce, script,
file transfer (scheduler.py:186-226, 358-433, 449-494; runner at
30-171). Here a job is any Python callable (a Spark query, a plain
script, a read/write between stores — the three reference types collapse
into one), and the queue is a small in-process structure: orchestration
at cluster scale belongs to Spark scheduler pools / external schedulers,
not the engine (SURVEY.md §2.1 O27 "out of engine scope — thin
driver-side job-runner").
"""

from __future__ import annotations

import subprocess
import time
import traceback
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

MAX_RUNTIME_SAMPLES = 50  # reference keeps <=50 runtimes per job (scheduler.py:484-494)


@dataclass
class Job:
    """One schedulable unit (reference job dict, scheduler.py:496-533)."""

    name: str
    fn: Callable[[], Any]
    priority: int = 0
    group: str | None = None
    run_once: bool = False
    force_run: bool = False
    finished: bool = field(default=False, init=False)


def script_job(
    name: str,
    argv: Sequence[str],
    *,
    priority: int = 0,
    group: str | None = None,
    run_once: bool = False,
    force_run: bool = False,
    timeout: float | None = None,
) -> Job:
    """The reference's 'script' job type (scheduler.py:106-125): run a
    command in a subprocess; a nonzero exit is a job failure (stderr tail
    carried in the raised error, so it lands in the queue's failure log).
    """

    def fn() -> str:
        proc = subprocess.run(  # noqa: S603 - the command IS the job
            list(argv), capture_output=True, text=True, timeout=timeout
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"script job {name!r} exited {proc.returncode}: {proc.stderr[-2000:]}"
            )
        return proc.stdout

    return Job(
        name, fn, priority=priority, group=group, run_once=run_once, force_run=force_run
    )


class JobQueue:
    """Priority queue with the reference's bookkeeping semantics.

    * submit overwrites by name (scheduler.py:205-220)
    * run() picks the highest-priority unfinished job each cycle
      (scheduler.py:406-433)
    * run_once jobs are deleted after success (scheduler.py:449-457)
    * force_run jobs re-run even when already finished (scheduler.py:502)
    * a failure cascade-deletes the job's whole group
      (scheduler.py:459-461) and is recorded with its traceback
    """

    def __init__(self) -> None:
        self._jobs: dict[str, Job] = {}
        self.succeeded: list[str] = []
        self.failed: list[tuple[str, str]] = []
        self.runtimes: dict[str, list[float]] = {}

    # -- queue management ---------------------------------------------------

    def submit(self, job: Job) -> None:
        self._jobs[job.name] = job

    def delete(self, name: str) -> None:
        self._jobs.pop(name, None)

    def delete_group(self, group: str) -> None:
        for name in [n for n, j in self._jobs.items() if j.group == group]:
            del self._jobs[name]

    def jobs(self) -> list[Job]:
        return sorted(self._jobs.values(), key=lambda j: -j.priority)

    # -- execution ----------------------------------------------------------

    def run_cycle(self) -> int:
        """One scheduler cycle: run each currently-runnable job once, in
        priority order (the body of the reference's eternal Runner loop,
        scheduler.py:30-42 — which re-runs force_run jobs every cycle).
        Returns the number of jobs executed."""
        ran = 0
        for job in self.jobs():
            if job.name not in self._jobs:  # cascaded away by an earlier failure
                continue
            if job.finished and not job.force_run:
                continue
            ran += 1
            t0 = time.time()
            try:
                job.fn()
            except Exception:  # noqa: BLE001 - reference aborts the job, not the runner
                self.failed.append((job.name, traceback.format_exc()))
                if job.group:
                    self.delete_group(job.group)
                else:
                    self.delete(job.name)
                continue
            self._record_runtime(job.name, time.time() - t0)
            self.succeeded.append(job.name)
            job.finished = True
            if job.run_once:
                self.delete(job.name)
        return ran

    def run(self) -> None:
        """Cycle until nothing remains runnable (force_run jobs would
        cycle forever by design — drive those with run_cycle())."""
        while any(not j.finished for j in self._jobs.values()):
            if self.run_cycle() == 0:
                break

    def _record_runtime(self, name: str, seconds: float) -> None:
        samples = self.runtimes.setdefault(name, [])
        samples.append(seconds)
        del samples[:-MAX_RUNTIME_SAMPLES]
