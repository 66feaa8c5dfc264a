"""Multi-batch streaming soak (VERDICT r3 item 9).

The single-drain soak measures fixed streaming machinery; state-store
GROWTH only shows when the same query runs many triggers. This harness
splits the events fixture into N time-ordered chunk files, drives three
state-heavy shapes one file per trigger, and prints per-trigger wall
and state-store size from the progress reports:

* ``stateful_totals`` — applyInPandasWithState per-user integer-cent
  accumulators (state rows = |users|, grows until every user seen)
* ``streaming_dedup`` — watermarked dropDuplicates on event_id (state
  rows = events inside the watermark horizon — the eviction test)
* ``stream_stream_join`` — watermarked view⋈click attribution join
  with a time-range bound (two buffered sides, watermark-evicted)
* ``state_ttl_eviction`` — per-user totals with an EventTimeTimeout
  TTL (round-7's events_streaming_state_ttl shape): state must GROW
  to the active key set, then COLLAPSE when the watermark passes
  last-activity + TTL — the store-bounding half of the state story;
  two far-future sentinel chunks force the full eviction cliff into
  the table

Usage::

    python tools/soak_streaming.py [sf_dir] [n_chunks]

Writes a markdown table to stdout (paste into SCALE.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time


def _chunk_events(sf_dir: str, n_chunks: int) -> str:
    """Split events.parquet into n time-ordered chunk files."""
    import duckdb

    out = tempfile.mkdtemp(prefix="soak_stream_")
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    per = -(-n // n_chunks)
    con.execute(
        f"CREATE VIEW ev AS SELECT * FROM '{sf_dir}/events.parquet' ORDER BY ts, event_id"
    )
    for i in range(n_chunks):
        con.execute(
            f"COPY (SELECT * FROM ev ORDER BY ts, event_id LIMIT {per} OFFSET {i * per})"
            f" TO '{out}/chunk-{i:03d}.parquet' (FORMAT PARQUET)"
        )
    return out


def _progress_rows(query) -> list[dict]:
    rows = []
    for p in query.recentProgress:
        ops = p.get("stateOperators") or []
        rows.append(
            {
                "batch": p["batchId"],
                "in_rows": int(p.get("numInputRows", 0)),
                "ms": int(p["durationMs"].get("triggerExecution", 0)),
                "state_rows": sum(int(o.get("numRowsTotal", 0)) for o in ops),
                "state_mb": round(
                    sum(int(o.get("memoryUsedBytes", 0)) for o in ops) / 1e6, 2
                ),
            }
        )
    return [r for r in rows if r["in_rows"] > 0]


def _drain(q) -> None:
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()


def soak(spark, sf_dir: str, n_chunks: int) -> dict[str, list[dict]]:
    from pyspark.sql import functions as F

    chunks = _chunk_events(sf_dir, n_chunks)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    results: dict[str, list[dict]] = {}

    def stream(recursive: bool = False):
        # recursive=True also picks up the sentinel chunk DIRECTORIES
        # shape 4 writes under the chunk root
        r = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        if recursive:
            r = r.option("recursiveFileLookup", "true")
        return (
            r.parquet(chunks)
            # fixture ts is timestamp_ntz; watermarks require TIMESTAMP
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )

    def _cents(pdf) -> int:
        """floor(value·100 + 0.5) summed as int64 — the one rounding
        rule every stateful shape shares."""
        import numpy as np

        return int(
            np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64").sum()
        )

    # 1) applyInPandasWithState per-user totals ---------------------------
    from collections.abc import Iterator
    from typing import Any

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += _cents(pdf)
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    t0 = time.time()
    q = (
        stream()
        .select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType="user_id long, n_events long, total_cents long",
            stateStructType="n long, cents long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_tot_"))
        .start()
    )
    _drain(q)
    results["stateful_totals"] = _progress_rows(q)
    print(f"# stateful_totals drained in {time.time() - t0:.1f}s", file=sys.stderr)

    # 2) watermarked streaming dedup --------------------------------------
    t0 = time.time()
    q = (
        stream()
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id", "ts"])
        .writeStream.format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_dd_"))
        .start()
    )
    _drain(q)
    results["streaming_dedup"] = _progress_rows(q)
    print(f"# streaming_dedup drained in {time.time() - t0:.1f}s", file=sys.stderr)

    # 3) watermarked stream-stream join ------------------------------------
    t0 = time.time()
    views = (
        stream()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("v_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    clicks = (
        stream()
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    )
    q = (
        joined.writeStream.format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_ss_"))
        .start()
    )
    _drain(q)
    results["stream_stream_join"] = _progress_rows(q)
    print(f"# stream_stream_join drained in {time.time() - t0:.1f}s", file=sys.stderr)

    # 4) event-time-TTL eviction (round-7 events_streaming_state_ttl) ----
    # per-user totals whose state closes when the watermark passes
    # last_activity + TTL; with a 2-day TTL over the fixture's 30-day
    # span, churned-out users evict mid-stream and two far-future
    # sentinel chunks evict the remainder — state_rows must grow to the
    # active key set, then collapse toward zero.
    import datetime

    ttl_ms = 2 * 86400 * 1000

    def ttl_fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            n, cents = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
            )
            return
        n, cents = state.get if state.exists else (0, 0)
        last_ms = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            cents += _cents(pdf)
            hi = int(pdf["event_ms"].max())
            last_ms = hi if last_ms is None else max(last_ms, hi)
        state.update((n, cents))
        if last_ms is not None:
            state.setTimeoutTimestamp(last_ms + ttl_ms)
        return
        yield  # pragma: no cover - generator form required by the API

    # sentinel chunks: one event far past max_ts + TTL, then +1h more,
    # written AFTER the data chunks (file order = trigger order)
    import duckdb as _dd

    max_ts = _dd.sql(
        f"SELECT max(ts) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    for i, far in enumerate(
        (
            max_ts + datetime.timedelta(days=4),
            max_ts + datetime.timedelta(days=4, hours=1),
        )
    ):
        spark.createDataFrame(
            [(-1 - i, far, -1 - i, "view", 0.0, "{}")], schema
        ).coalesce(1).write.parquet(f"{chunks}/zz-sentinel-{i}.parquet")

    t0 = time.time()
    q = (
        stream(recursive=True)
        .select(
            "user_id",
            "ts",
            "value",
            F.unix_millis(F.col("ts")).alias("event_ms"),
        )
        .withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            ttl_fn,
            outputStructType="user_id long, n_events long, total_cents long",
            stateStructType="n long, cents long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_ttl_"))
        .start()
    )
    _drain(q)
    results["state_ttl_eviction"] = _progress_rows(q)
    print(f"# state_ttl_eviction drained in {time.time() - t0:.1f}s", file=sys.stderr)

    shutil.rmtree(chunks, ignore_errors=True)
    return results


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("soak_streaming")
        .getOrCreate()
    )
    results = soak(spark, sf_dir, n_chunks)
    for name, rows in results.items():
        print(f"\n### {name} ({sf_dir}, {n_chunks} triggers)\n")
        print("| batch | input rows | trigger ms | state rows | state MB |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['batch']} | {r['in_rows']} | {r['ms']} "
                f"| {r['state_rows']} | {r['state_mb']} |"
            )
    spark.stop()


if __name__ == "__main__":
    main()
