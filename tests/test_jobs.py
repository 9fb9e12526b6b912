"""Job-runner veneer semantics (reference scheduler O27-O29)."""

from __future__ import annotations

from python_mapreduce_spark.jobs import Job, JobQueue


def test_priority_order_and_overwrite_by_name():
    log: list[str] = []
    q = JobQueue()
    q.submit(Job("low", lambda: log.append("low"), priority=1))
    q.submit(Job("high", lambda: log.append("high"), priority=10))
    q.submit(Job("high", lambda: log.append("high2"), priority=10))  # overwrite
    q.run()
    assert log == ["high2", "low"]  # overwrite-by-name kept the second fn
    assert q.succeeded == ["high", "low"]


def test_run_once_deletes_after_success():
    q = JobQueue()
    q.submit(Job("once", lambda: None, run_once=True))
    q.run()
    assert q.jobs() == []
    assert q.succeeded == ["once"]


def test_failure_cascades_group_deletion():
    log: list[str] = []
    q = JobQueue()

    def boom() -> None:
        raise RuntimeError("boom")

    q.submit(Job("a", boom, priority=5, group="g1"))
    q.submit(Job("b", lambda: log.append("b"), priority=1, group="g1"))
    q.submit(Job("c", lambda: log.append("c"), priority=0, group="g2"))
    q.run()
    assert log == ["c"]  # b cascaded away with its group
    assert [n for n, _ in q.failed] == ["a"]
    assert "boom" in q.failed[0][1]


def test_force_run_reruns_each_cycle():
    log: list[str] = []
    q = JobQueue()
    q.submit(Job("f", lambda: log.append("f"), force_run=True))
    assert q.run_cycle() == 1
    assert q.run_cycle() == 1
    assert log == ["f", "f"]


def test_runtime_history_capped_at_50():
    q = JobQueue()
    q.submit(Job("r", lambda: None, force_run=True))
    for _ in range(60):
        q.run_cycle()
    assert len(q.runtimes["r"]) == 50


def test_script_job_subprocess_success_and_failure():
    # Reference 'script' job type parity (scheduler.py:106-125): commands
    # run in a subprocess, nonzero exit fails the job and cascades its
    # group like any other failure.
    import sys

    from python_mapreduce_spark.jobs import JobQueue, script_job

    q = JobQueue()
    q.submit(script_job("ok", [sys.executable, "-c", "print('hi')"], group="g"))
    q.submit(
        script_job(
            "boom", [sys.executable, "-c", "import sys; sys.exit(3)"], group="g2"
        )
    )
    q.submit(script_job("same_group", [sys.executable, "-c", "pass"], group="g2", priority=-1))
    q.run()
    assert "ok" in q.succeeded
    assert [n for n, _ in q.failed] == ["boom"]
    assert "exited 3" in q.failed[0][1] or "exited 3" in str(q.failed[0])
    # group g2 cascade-deleted: same_group never ran
    assert "same_group" not in q.succeeded
