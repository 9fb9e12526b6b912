"""Experiment-only PySpark daemon wrapper: count worker forks.

Launch with spark.python.daemon.module=exp_daemon (tools/ on PYTHONPATH).
Each worker_main entry (i.e., each forked worker incarnation) appends one
line to /tmp/pyworker_starts.log.
"""

import os
import time

import pyspark.daemon as d

_orig_worker_main = d.worker_main


def worker_main(infile, outfile):
    with open("/tmp/pyworker_starts.log", "a") as f:
        f.write(f"{time.time():.3f} pid={os.getpid()}\n")
    return _orig_worker_main(infile, outfile)


d.worker_main = worker_main

if __name__ == "__main__":
    d.manager()
