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
