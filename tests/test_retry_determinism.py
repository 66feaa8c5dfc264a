"""Task-retry determinism: at 100 TB task retries are a certainty
(preemption, OOM kills, speculative execution), and Spark's recovery
model silently re-runs the failed task's whole partition. Every
operator in this engine is designed attempt-deterministic — same
partition in, same bytes out — so a replayed attempt must change
NOTHING about the result.

This test injects a real task failure (the first attempt of one
partition of a ``mapInPandas`` stage raises) in a subprocess session
with ``local[4, 2]`` (maxFailures=2 — local mode defaults to 1, where
any failure kills the job), and asserts (a) the job survives via
retry, (b) at least one extra attempt actually ran, and (c) the result
equals the no-failure run bit-for-bit.
"""

from __future__ import annotations

import subprocess
import sys

_PROBE = r"""
import glob, os, sys, tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

marker_dir = tempfile.mkdtemp(prefix="retry_marks_")

spark = (SparkSession.builder.master("local[4, 2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())

df = spark.range(0, 1000).repartition(4)

def flaky(batches):
    from pyspark import TaskContext
    ctx = TaskContext.get()
    pid = ctx.partitionId()
    if pid == 0:
        mark = os.path.join(marker_dir, f"attempt-{ctx.attemptNumber()}")
        open(mark, "w").close()
        if ctx.attemptNumber() == 0:
            raise RuntimeError("injected failure on first attempt")
    for pdf in batches:
        pdf["v"] = pdf["id"] * 3 + 1
        yield pdf[["id", "v"]]

out = df.mapInPandas(flaky, schema="id long, v long").agg(
    F.count(F.lit(1)).alias("n"),
    F.sum("id").alias("sid"),
    F.sum("v").alias("sv"),
).collect()[0]

attempts = sorted(os.path.basename(p) for p in glob.glob(marker_dir + "/*"))
print("RETRYPROBE attempts", ",".join(attempts), flush=True)
print("RETRYPROBE result", out["n"], out["sid"], out["sv"], flush=True)
expect_sid = 999 * 1000 // 2
assert out["n"] == 1000 and out["sid"] == expect_sid, out
assert out["sv"] == 3 * expect_sid + 1000, out
assert "attempt-0" in attempts and "attempt-1" in attempts, attempts
print("RETRYPROBE ALL_OK", flush=True)
"""


def test_retry_replay_is_deterministic():
    res = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "RETRYPROBE ALL_OK" in res.stdout, (
        f"stdout:\n{res.stdout}\nstderr:\n{res.stderr[-3000:]}"
    )
