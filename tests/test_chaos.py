"""Fault injection: task death mid-query (reference C6 chaos).

The reference's chaos harness makes a worker ``os.Exit(1)`` with
p=1/20 while holding live work (client.go:310-313) and asserts the
job still completes correctly via coordinator reassignment. Spark's
equivalent contract is task retry: a task whose Python worker dies is
rescheduled (up to ``spark.task.maxFailures`` attempts) and the query
result is unchanged.

Runs in a SUBPROCESS because the shared test session is
``local[8]`` — local mode pins maxFailures=1 (any task death fails
the job), which is the wrong contract to test. The subprocess uses
``local[4, 3]`` (3 task attempts) and kills the Python worker of a
mapInPandas stage exactly once via an on-disk marker.
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import os, sys, tempfile
sys.path.insert(0, "@@REPO@@")
marker_dir = sys.argv[1]

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[4, 3]")
    .appName("chaos")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from distributed_mapreduce_p2p_spark.sources.io import read_table

ev = read_table(spark, "/root/testdata/sf0.001", "events")

def chaotic(batches):
    # First task to get here dies mid-flight — exactly the
    # reference's os.Exit(1) chaos. The marker makes it once-only so
    # the retry (and every other task) survives.
    import pandas as pd
    marker = os.path.join(marker_dir, "killed")
    first = not os.path.exists(marker)
    if first:
        try:
            with open(marker, "x") as f:
                f.write("x")
        except FileExistsError:
            first = False
    emitted = False
    for pdf in batches:
        if first and not emitted:
            os._exit(1)
        emitted = True
        yield pdf[["user_id", "value"]]

mapped = ev.mapInPandas(chaotic, "user_id long, value double")
got = (
    mapped.groupBy("user_id")
    .agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
    )
)
want = (
    ev.groupBy("user_id")
    .agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
    )
)
g = {(r.user_id, r.n, r.s) for r in got.collect()}
w = {(r.user_id, r.n, r.s) for r in want.collect()}
assert os.path.exists(os.path.join(marker_dir, "killed")), "chaos never fired"
assert g == w, f"mismatch after task retry: {len(g)} vs {len(w)} rows"
print("CHAOS_OK", len(g))
spark.stop()
"""


def test_query_survives_python_worker_death():
    with tempfile.TemporaryDirectory(prefix="chaos_") as td:
        proc = subprocess.run(
            [sys.executable, "-c", _SCRIPT.replace("@@REPO@@", str(REPO)), td],
            capture_output=True,
            text=True,
            timeout=420,
        )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "CHAOS_OK" in proc.stdout
