"""SparkSession construction with scale-appropriate defaults.

Local testing runs on ``local[N]`` but every knob here is chosen so the
same code runs unchanged on a multi-executor cluster: AQE for runtime
re-planning (partition coalescing, skew-join splitting), shuffle
partitions sized explicitly, Arrow enabled for the Pandas-UDF paths, and
a pinned UTC session timezone so results are reproducible across engines
(the DuckDB oracle is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime confs that are safe (and desirable) to apply to an existing
#: session — e.g. the driver-owned session passed into ``queries()``.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # sized to the local core count (driver-owned sessions default to
    # 200 — tiny-task spray at test scale); AQE coalescing still rules
    "spark.sql.shuffle.partitions": str(
        int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    ),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Round-10 (guide §2.2 — fewer, larger reduce partitions): with
    # parallelismFirst at its default (true) AQE coalesces only down to
    # the session parallelism, so at small inputs every post-shuffle
    # stage still launches <cores> near-empty tasks — measured ~16 s of
    # pure task overhead across the 86-query suite at 32 cores / sf0.1
    # (the 8-core suite beat the 32-core one). false makes AQE honor
    # advisoryPartitionSizeInBytes instead: partition count tracks
    # DATA SIZE at every scale (sf0.1 collapses to 1-2 real tasks,
    # 100 TB still gets hundreds of thousands) — the scale-adaptive
    # setting, not a local[32] tune. Env-tunable for clusters that
    # prefer idle-core backfill over per-task efficiency.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": os.environ.get(
        "SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"
    ),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": os.environ.get(
        "SPARK_GRAFT_ADVISORY_PARTITION_BYTES", str(32 * 1024 * 1024)
    ),
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # let custom Python DataSources (sources/pygen.py) absorb filters
    "spark.sql.python.filterPushdown.enabled": "true",
    # testdata events.ts is parquet timestamp[ns]; read as raw long and
    # convert on load (sources.registry.NANOS_CANDIDATES)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # parquet scans: split files small enough that a scan parallelizes
    # even on modest local inputs (a single 30 MB file would otherwise
    # be ONE task). At cluster scale raise this back toward 128m+ via
    # the env knob — fewer, fatter partitions amortize task overhead.
    "spark.sql.files.maxPartitionBytes": os.environ.get(
        "SPARK_GRAFT_MAX_PARTITION_BYTES", str(8 * 1024 * 1024)
    ),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "data_integration_project_spark") -> SparkSession:
    """Build (or fetch) the session with engine defaults applied."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: Target INPUT bytes per task for CPU-fat Python/Arrow stages (encode/
#: decode adapters, signature folds). Round-10 (guide §2.6/§6): these
#: stages used to fan out to a flat ``defaultParallelism`` — at 32
#: local cores that is 32 Python task launches + Arrow stream setups
#: for kilobytes of input, measured ~0.3-0.6 s of pure overhead per
#: query at sf0.1 (width 8 or 4 recovers the 8-core times exactly).
#: ~512 KB of source bytes per task keeps per-task overhead (~30 ms)
#: under ~20% of the stage's real work while still saturating every
#: core once the input is a few MB per core — at 100 TB any of these
#: stages clamps to the full session parallelism. Env-tunable: raise
#: it on clusters with fatter cores or cheaper schedulers.
SPREAD_TARGET_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPREAD_TARGET_BYTES", str(512 * 1024))
)


def spread_width(df, per_byte_cost: float = 1.0) -> int:
    """Partition width for a CPU-fat Python stage over ``df``: enough
    tasks to cover Catalyst's size estimate at ~SPREAD_TARGET_BYTES
    input bytes per task, clamped to [2, defaultParallelism]. Falls
    back to the full parallelism whenever the estimate is missing or
    huge — mis-estimation can only cost a too-wide (current behavior)
    spread, never a serial stage.

    ``per_byte_cost`` scales the target down for stages whose work per
    input byte is far above a hash/tokenize pass (media codecs: ~4) —
    measured at sf0.1, the LZW/deflate image decodes want ~4x more
    tasks per byte than the token-hash folds before task overhead wins
    again."""
    cores = default_parallelism()
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return cores
    target = max(1, int(SPREAD_TARGET_BYTES / max(per_byte_cost, 1e-9)))
    if est <= 0 or est >= cores * target:
        return cores
    return min(cores, max(2, -(-est // target)))


#: Target shuffle-partition size for iterative loops, in ROWS of the
#: loop's working frame (edges, labels, coefficients). 2M rows of two
#: int64s ≈ 32 MB per partition — inside the guide's 100 MB-1 GB band
#: once real-world row widths are counted. Env-tunable for clusters.
LOOP_ROWS_PER_PARTITION = int(
    os.environ.get("SPARK_GRAFT_LOOP_ROWS_PER_PARTITION", str(2_000_000))
)


class iterative_loop:
    """Context manager pinning shuffle partitioning for a fixed-shape
    iterative loop (connected components, label propagation, PageRank,
    gradient descent, BPE merge rounds).

    Why (optimization guide §1.2/§2): each loop round is a handful of
    exchanges over a working frame whose size the OPERATOR knows
    exactly (it counts the frame every round for its convergence
    check). AQE re-plans every exchange of every round as its own job
    — measured 101 Spark jobs for a 12-round / 5k-edge star loop,
    ~8 jobs per round of pure scheduler+py4j overhead. Inside the
    loop we size ``spark.sql.shuffle.partitions`` directly from the
    measured row count (``rows / LOOP_ROWS_PER_PARTITION``, clamped to
    at least 1) and suspend AQE: coalescing is subsumed by the exact
    sizing, and AQE's skew handling only rewrites joins — the loop
    bodies here are windows and aggregates it would never touch.
    Confs are restored on exit; ``tune_session`` re-applies engine
    defaults at the next catalog call anyway.

    Scale-adaptive by construction: at 5k edges this yields 1
    partition (one task per stage instead of 32 empties); at 10^12
    edges it yields 500k partitions of ~32 MB. Not a local[32] tune —
    the same formula serves both ends, and the divisor is env-tunable.
    """

    def __init__(self, spark: SparkSession, rows: int):
        self.spark = spark
        self.rows = rows
        self._saved: dict[str, str] = {}

    def resize(self, rows: int) -> None:
        """Re-derive the loop partition count from a fresh row count
        (working frames can shrink round over round)."""
        self.parts = max(1, -(-int(rows) // LOOP_ROWS_PER_PARTITION))
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.parts))

    def __enter__(self) -> "iterative_loop":
        for k in ("spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled"):
            try:
                self._saved[k] = self.spark.conf.get(k)
            except Exception:  # unset on this session — restore to unset
                self._saved[k] = None
        self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        self.resize(self.rows)
        return self

    def __exit__(self, *exc) -> None:
        for k, v in self._saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally built session.

    The correctness driver passes its own SparkSession; timezone pinning
    and AQE are runtime-configurable, so apply them here instead of
    assuming the session was built by :func:`get_spark`.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # immutable conf on this build — leave as-is
            pass
    return spark
