"""Full-pipeline orchestration — the reference's ``RUN_ALL_STEPS.py`` /
``main.py`` drivers as one composable API.

Reference step → engine stage:

1. STEP1 producer (CSV discovery + publish, RUN_ALL_STEPS.py:120-157)
   → :func:`ingest_csv_dir`: discover entity CSVs, permissive-scan,
   envelope-wrap into the streaming inbox.
2. STEP2 raw consumer (bounded drain → raw zone, :159-196)
   + STEP3 quality engine (validate/split, :198-237)
   → :func:`drain_and_validate`: one checkpointed AvailableNow stream
   per entity lands raw rows, runs the entity RuleSet + ordered
   first-wins dedup inside foreachBatch, writes clean/error zones.
3. STEP4 transform+load (:239-276) → transforms run INSIDE the drain
   (the reference's "pipeline mode" memory handoff is simply lazy
   evaluation here); the load target is the partitioned parquet
   staging zone (JDBC via operators.sinks.jdbc_bulk_insert when a
   warehouse is reachable).
4. Post-hoc SQL layer (merged views / reconciliation / DWH) →
   :func:`build_marts`: merged views + conflict queries + star build
   over the clean zone.

A ``run_id`` scopes every output path (reference ``DB_{run_id}``).
Each stage returns DataFrames/paths so callers can stop anywhere; the
only materializations are the zone writes themselves.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.cleaning import transform_entity
from .operators.entity_rules import ruleset_for
from .operators.quality import reject_duplicates
from .operators.reconcile import merged_view, source_counts
from .sources.csv import (
    RAW_CSV_LAYOUTS,
    discover_csvs,
    read_entity_csv,
    with_line_numbers,
)
from .streaming.envelope import encode_envelope
from .streaming.pipeline import ZonePaths, consume_inbox

#: natural key per entity for the ordered first-wins dedup (V2)
DEDUP_KEYS: dict[str, list[str]] = {
    "khach_hang": ["customer_id"],
    "loai_mon": ["ma_loai"],
    "nguyen_lieu": ["ma_nguyen_lieu"],
}


@dataclass
class PipelineRun:
    run_id: str
    zones: ZonePaths
    ingested: dict[str, int] = field(default_factory=dict)
    zone_counts: dict[str, dict[str, int]] = field(default_factory=dict)


def ingest_csv_dir(
    spark: SparkSession, data_dir: str, zones: ZonePaths, *, run_id: str, source: str = "csv"
) -> dict[str, int]:
    """STEP1: discover entity CSVs and publish envelope-wrapped rows to
    the per-entity inbox. Corrupt CSV lines are forwarded raw — the
    consumer dead-letters them (matching queue poison semantics)."""
    counts: dict[str, int] = {}
    for item in discover_csvs(data_dir):
        entity = item["entity_type"]
        if entity is None:
            continue
        # cache: Spark disallows predicates over ONLY the corrupt-record
        # column of a raw CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
        raw = with_line_numbers(read_entity_csv(spark, item["file_path"], entity)).cache()
        try:
            ok = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
            enveloped = encode_envelope(
                ok, source=source, entity_type=entity, run_id=run_id, order_col="_line_no"
            )
            out = os.path.join(zones.inbox, entity)
            enveloped.write.mode("append").text(out)
            counts[entity] = counts.get(entity, 0) + ok.count()
        finally:
            raw.unpersist()  # both readers (write + count) are done
    return counts


def drain_and_validate(
    spark: SparkSession, zones: ZonePaths, entities: list[str]
) -> dict[str, dict[str, int]]:
    """STEP2+3+4 fused: per entity, drain the inbox exactly once
    (AvailableNow), transform to the canonical layout, validate with
    the entity RuleSet (+ ordered dedup where keyed), split into
    clean/error parquet zones. Entities drain as independent streams —
    on a cluster they run concurrently; here sequentially."""
    results: dict[str, dict[str, int]] = {}
    for entity in entities:
        # per-SOURCE validator routing (reference main.py:674-681): the
        # inbox carries the CSV feed, so mon rows get mon_csv_rules —
        # which validate the RAW layout (price string parseability, the
        # category NAME) BEFORE the transform; every other entity
        # validates the canonical post-transform layout.
        rules = ruleset_for(entity, source="csv")

        # decode → transform happens inside the consumer's foreachBatch
        # via a RuleSet whose validate() is applied around the transform;
        # we wrap by subclassing-by-composition: consume_inbox validates
        # the DECODED rows, so hand it a ruleset that sequences both.
        class _TransformThenValidate:
            def validate(self, df: DataFrame) -> DataFrame:
                if rules.entity == "mon_csv":
                    # validate raw, then transform; the verdict columns
                    # are _-prefixed and survive the transform's
                    # metadata passthrough
                    validated = transform_entity(entity, rules.validate(df))
                else:
                    validated = rules.validate(transform_entity(entity, df))
                keys = DEDUP_KEYS.get(entity)
                if keys:
                    validated = reject_duplicates(
                        validated.drop("_is_valid"),
                        keys,
                        [F.col("_line_no").asc_nulls_last()],
                        f"duplicate {keys[0]}",
                    )
                return validated

        # the envelope payload is the RAW CSV layout (all strings);
        # canonicalization happens in the transform inside the drain
        from pyspark.sql import types as T

        raw_payload = T.StructType(
            [T.StructField(c, T.StringType()) for c in RAW_CSV_LAYOUTS[entity]]
        )
        q = consume_inbox(
            spark,
            zones,
            entity=entity,
            data_schema=raw_payload,
            ruleset=_TransformThenValidate(),  # duck-typed: only .validate used
        )
        q.awaitTermination()
        counts = {}
        for zone_name, path in (("clean", zones.clean), ("error", zones.error)):
            try:
                counts[zone_name] = spark.read.parquet(os.path.join(path, entity)).count()
            except Exception:
                counts[zone_name] = 0
        results[entity] = counts
    return results


def build_marts(
    spark: SparkSession, zones: ZonePaths, entities: list[str]
) -> dict[str, DataFrame]:
    """Post-hoc layer: merged views (single-source runs union
    trivially) + per-source count report over the clean zone — the
    first marts the reference builds in SQL Server. DWH star builds
    continue from these via operators.dwh."""
    marts: dict[str, DataFrame] = {}
    for entity in entities:
        clean = spark.read.parquet(os.path.join(zones.clean, entity))
        merged = merged_view({src: df for src, df in _by_source(clean)})
        merged.createOrReplaceTempView(f"{entity}_merged")
        marts[f"{entity}_merged"] = merged
        marts[f"{entity}_source_counts"] = source_counts(merged)
    return marts


def _by_source(clean: DataFrame):
    sources = [r["_source"] for r in clean.select("_source").distinct().collect()]
    for s in sources:
        yield s, clean.filter(F.col("_source") == s).drop("_source")


def run_full_pipeline(
    spark: SparkSession, data_dir: str, out_root: str, *, run_id: str
) -> PipelineRun:
    """The RUN_ALL_STEPS entry point: ingest → drain/validate → marts.
    Returns per-stage counts for the monitoring layer (A4)."""
    zones = ZonePaths(os.path.join(out_root, f"run_{run_id}"))
    run = PipelineRun(run_id=run_id, zones=zones)
    run.ingested = ingest_csv_dir(spark, data_dir, zones, run_id=run_id)
    run.zone_counts = drain_and_validate(spark, zones, sorted(run.ingested))
    build_marts(spark, zones, sorted(run.ingested))
    record_run_history(spark, out_root, run)
    return run


def record_run_history(spark: SparkSession, out_root: str, run: PipelineRun) -> None:
    """A4 across runs: append one row per (run, entity) with ingest and
    zone counts to a queryable history table — the reference keeps this
    only in per-run log files (pipeline_run_*.log); here it is a
    partitioned parquet table any monitoring query can scan."""
    rows = [
        (
            run.run_id,
            entity,
            run.ingested.get(entity, 0),
            counts.get("clean", 0),
            counts.get("error", 0),
        )
        for entity, counts in sorted(run.zone_counts.items())
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "run_id string, entity string, ingested long, clean long, error long"
    ).withColumn("recorded_at", F.current_timestamp())
    df.write.mode("append").partitionBy("run_id").parquet(
        os.path.join(out_root, "run_history")
    )


def run_history(spark: SparkSession, out_root: str):
    """Scan the cross-run history (monitoring surface)."""
    return spark.read.parquet(os.path.join(out_root, "run_history"))
