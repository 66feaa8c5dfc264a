"""Streaming near-duplicate detection at ingest: banded MinHash
candidates for INCOMING documents against a static fingerprint store.

This is the shape a 100 TB/day corpus pipeline actually runs — dedup
happens AT INGEST, per micro-batch, against the history of everything
already accepted, never as an after-the-fact batch job over the full
corpus. It composes two proven contracts:

- the stream-static equi-join (plans/events_q.events_stream_static_join):
  the static side — here the (band, bucket) store — joins into every
  micro-batch without watermarks or join state;
- the fingerprint-store contract
  (plans/dedup_q.dedup_incremental_against_store): history participates
  ONLY as signatures (LSH band buckets — n_bands short strings per
  ever-accepted document), never as text, so per-batch cost is
  O(batch · bands + |store ∩ batch-buckets|) and re-crawled or lightly
  edited content is flagged without touching a byte of the historical
  corpus.

Idempotency under replay: ``process_batch`` writes each micro-batch's
per-document flags to a ``batch_id``-keyed subdirectory with OVERWRITE
semantics — the standard foreachBatch exactly-once recipe. A replayed
batch (checkpoint recovery re-delivers the last uncommitted batch with
the SAME batch_id) overwrites its own prior partial output instead of
appending a duplicate, so the final rollup is replay-invariant
(tests/test_streaming.py pins this by running a batch twice).

Scale shape: the store is (band, bucket) rows — bounded by
n_bands × |history|, co-partitionable on the bucket key; each batch
computes signatures with the one-shuffle codegen plan
(operators/dedup.shingle_sets_with_signatures) and probes the store
with a left-semi equi-join (AQE broadcasts a small store, shuffles a
large one on the same key the store is bucketed by). No state server,
no watermark — the store is the state, and it is append-only.

Reference parity: the reference has only the order-dependent
duplicate-id check inside its consume loop (main.py:663-700); this is
the corpus-scale generalization of "have I seen this message before"
to "have I seen this CONTENT before, approximately".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import lsh_bucket_rows, shingle_sets_with_signatures


def build_band_store(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """The static fingerprint store: DISTINCT (band, bucket) keys of the
    accepted history. In production this is a parquet table appended
    after every accepted batch; here it is derived from the history
    DataFrame with the same one-shuffle signature plan the batches use."""
    sigs = shingle_sets_with_signatures(df, id_col, text_col, shingle_k, n_hashes)
    return (
        lsh_bucket_rows(sigs, id_col, n_bands, n_hashes // n_bands)
        .select("_band", "_bucket")
        .distinct()
    )


def batch_neardup_flags(
    batch: DataFrame,
    store: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Per-document near-dup flags for one (micro-)batch: a document is
    flagged iff ANY of its LSH band buckets exists in the store — the
    banded-candidate rule, signature-only (the store has no text to
    verify against; production either drops on signature match or
    fetches the stored document for an exact-Jaccard verify leg).
    Documents too short to shingle produce no buckets and pass."""
    sigs = shingle_sets_with_signatures(
        batch, id_col, text_col, shingle_k, n_hashes
    )
    hits = (
        lsh_bucket_rows(sigs, id_col, n_bands, n_hashes // n_bands)
        .join(store, ["_band", "_bucket"], "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("_neardup", F.lit(1))
    )
    keep = [c for c in batch.columns if c != text_col]
    return (
        batch.select(*keep)
        .join(hits, id_col, "left")
        .withColumn("_neardup", F.coalesce(F.col("_neardup"), F.lit(0)))
    )


def append_accepted_to_store(
    store: DataFrame,
    batch: DataFrame,
    flags: DataFrame,
    id_col: str,
    text_col: str,
    **lsh_kwargs,
) -> DataFrame:
    """The store's APPEND leg — what makes the ingest loop actually
    incremental: documents the gate ACCEPTED (``_neardup = 0``)
    contribute their band buckets to the store, so the next batch
    dedups against them too. The store stays (band, bucket) rows only
    — append is a union + distinct on the bucket key, the same
    co-partitionable shape the probe joins on. Flagged documents add
    nothing (their content is already represented).

    Production form: the per-batch delta is appended to the store
    table inside the same foreachBatch transaction that lands the
    flags, keyed by batch_id for replay idempotence (a replayed append
    of the same delta is absorbed by the distinct)."""
    accepted = flags.filter(F.col("_neardup") == 0).select(id_col)
    delta = build_band_store(
        batch.join(accepted, id_col, "left_semi"),
        id_col,
        text_col,
        **lsh_kwargs,
    )
    return store.unionByName(delta).distinct()


def run_neardup_ingest(
    spark: SparkSession,
    incoming: DataFrame,
    store: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str,
    text_col: str,
    grow_store: bool = False,
    **lsh_kwargs,
) -> None:
    """Drain the incoming stream with AvailableNow, flagging each
    micro-batch against the store and landing per-document flags under
    ``out_dir/batch_id=N`` (overwrite — see module note on replay).

    With the default ``grow_store=False`` every micro-batch probes the
    SAME fixed, pre-built store — intra-stream duplicates (batch N+1
    re-crawling a document batch N accepted) pass silently; the append
    leg is the caller's loop. With ``grow_store=True`` the loop is
    closed here: after each batch's flags land, the ACCEPTED documents'
    band buckets are appended to the store
    (:func:`append_accepted_to_store`) and materialized
    (localCheckpoint truncates the per-batch lineage chain), so batch
    N+1 dedups against everything batch N let through — the module
    docstring's "history of everything already accepted", now within a
    single run as well as across runs.

    Replay note for ``grow_store=True``: the grown store is driver
    memory — a checkpoint-recovery RESTART rebuilds it from the initial
    store and AvailableNow re-delivers every batch in order, arriving
    at the same final state (append is a distinct-union, so replayed
    deltas absorb idempotently); a WITHIN-RUN replay of batch N re-probes
    the store as of batch N-1 only if the append happens after the
    flags write, which is the order below."""

    state = {"store": store}

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if grow_store:
            batch = batch.persist()
        try:
            flags = batch_neardup_flags(
                batch, state["store"], id_col, text_col, **lsh_kwargs
            )
            path = os.path.join(out_dir, f"batch_id={batch_id}")
            flags.write.mode("overwrite").parquet(path)
            if grow_store:
                # re-read the landed flags: one probe-join execution per
                # batch, and the append sees exactly what was written
                landed = spark.read.parquet(path)
                state["store"] = append_accepted_to_store(
                    state["store"], batch, landed, id_col, text_col, **lsh_kwargs
                ).localCheckpoint()
        finally:
            if grow_store:
                batch.unpersist()

    q = (
        incoming.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
