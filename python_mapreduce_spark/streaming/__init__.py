"""Streaming & incremental processing.

Reference equivalent: the ``hold_state`` per-server file ledger
(mapper.py:110-143) plus the additive-recombination contract
"f(A + B) = f(A) + f(B)" (README.txt:18) — incremental batch jobs that
skip already-seen input files. Its ledger deletes state on read and
rewrites it after the map phase, so a crash in between loses data
(SURVEY.md §7 risks).

Structured Streaming's checkpointed file source is the strictly-stronger
replacement: exactly-once file tracking that survives kill/restart, plus
the event-time machinery the reference lacks entirely — watermarks,
tumbling/sliding/session windows, arbitrary stateful operators.
"""

from python_mapreduce_spark.streaming.incremental import (
    file_stream,
    incremental_pass,
    run_stream_to_memory,
)

__all__ = ["file_stream", "incremental_pass", "run_stream_to_memory"]
