"""Streaming upsert: ``foreachBatch`` MERGE into the bucketed SCD2
dimension — the streaming half of the parquet MERGE-INTO emulation
(operators/dwh.scd2_merge_incremental). The reference's queue leg only
appends to zones; this is the missing upsert path a warehouse consumer
needs, built from the same incremental merge the batch layer uses.

Exactly-once story: the merge is IDEMPOTENT for a replayed batch —
re-applying updates whose tracked values already match the current
dimension rows produces zero closed/opened rows — so foreachBatch's
at-least-once delivery composes to effectively-once dimension state
(same guarantee Delta's foreachBatch MERGE pattern relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dwh import scd2_merge_incremental


def scd2_stream_upsert(
    spark: SparkSession,
    dim_path: str,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_date: str,
    *,
    checkpoint: str,
    n_buckets: int = 64,
):
    """Start a streaming MERGE: each micro-batch of ``updates`` (a
    streaming DataFrame) is incrementally merged into the bucketed SCD2
    dimension at ``dim_path`` — only the affected bucket partitions are
    read and rewritten per batch. AvailableNow trigger: drain what
    exists, then stop. Returns the StreamingQuery."""

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        scd2_merge_incremental(
            spark,
            dim_path,
            batch,
            key,
            tracked,
            effective_date,
            n_buckets=n_buckets,
        )

    return (
        updates.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
