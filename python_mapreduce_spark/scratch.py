"""Per-process scratch space for write-evidence queries.

Several registry queries prove write-path behavior (sink round-trips,
z-order clustered layout, incremental-ingest state) by writing real
parquet to local temp space and reading it back. A bare
``tempfile.mkdtemp`` per invocation leaks those table-scale copies
forever — repeated bench/driver runs accumulate orphaned dirs
(ADVICE r9). Every such site now allocates under one per-process root
that is removed at interpreter exit.

Each call still returns a FRESH directory: in-process repetition
(bench warmup + best-of-3) must not collide with an active streaming
query or a concurrently-open reader on the previous invocation's
files. Accumulation is therefore bounded by process lifetime instead
of unbounded across runs.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(tag: str) -> str:
    """A fresh subdirectory under the per-process scratch root.

    The root is created lazily on first use and ``shutil.rmtree``'d at
    interpreter exit (pure-filesystem cleanup — safe after the Spark
    session is gone). ``tag`` keeps dirs attributable while debugging
    a live process.
    """
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="spark_graft_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=f"{tag}_", dir=_ROOT)
