"""Manifest-committed file sink: exactly-once streaming output on a
plain filesystem.

A naive ``foreachBatch`` parquet append is only at-least-once: a batch
that commits files but dies before the checkpoint advances is rewritten
on restart, and readers see duplicates. The manifest protocol fixes it
with the commit discipline table formats use under the hood
(reference parity: the reference's zone writers land files directly —
coffee_etl_clean/etl/load.py — and rely on single-writer luck):

1. write the batch's rows to a batch-scoped directory;
2. atomically publish ONE manifest file (temp + rename) naming the
   data files of that batch;
3. readers list manifests and read ONLY manifested files.

Replayed batches are detected by their manifest already existing and
skipped, so duplicated micro-batch execution cannot duplicate data:
the rename is the commit point, and a batch directory without a
manifest is invisible garbage, never wrong results.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(out_dir: str, batch_id: int) -> str:
    return os.path.join(out_dir, "_manifests", f"manifest-{batch_id:08d}.json")


def commit_batch(df: DataFrame, batch_id: int, out_dir: str) -> bool:
    """foreachBatch body: write + atomically publish one micro-batch.
    Returns False (and writes nothing) if the batch is already
    committed — the replay-idempotency half of exactly-once."""
    manifest = _manifest_path(out_dir, batch_id)
    if os.path.exists(manifest):
        return False
    data_dir = os.path.join(out_dir, "data", f"batch={batch_id:08d}")
    df.write.mode("overwrite").parquet(data_dir)
    files = sorted(
        f"batch={batch_id:08d}/{name}"
        for name in os.listdir(data_dir)
        if name.endswith(".parquet")
    )
    os.makedirs(os.path.dirname(manifest), exist_ok=True)
    tmp = manifest + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"batch_id": batch_id, "files": files}, fh)
    os.rename(tmp, manifest)  # the commit point
    return True


def read_manifested(spark: SparkSession, out_dir: str) -> tuple[DataFrame, int]:
    """Read exactly the committed files — uncommitted batch directories
    are ignored by construction. Returns (df, n_committed_batches)."""
    mdir = os.path.join(out_dir, "_manifests")
    files: list[str] = []
    n_batches = 0
    for name in sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []:
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as fh:
            m = json.load(fh)
        files += [os.path.join(out_dir, "data", f) for f in m["files"]]
        n_batches += 1
    if not files:
        raise ValueError(f"no committed manifests under {out_dir}")
    df = spark.read.parquet(*files)
    return df, n_batches


def manifest_sink(stream_df: DataFrame, out_dir: str, checkpoint: str):
    """Drain ``stream_df`` through the manifest commit protocol until
    the source stops producing (processAllAvailable — AvailableNow
    only covers a simple stream reader's first prefetched batch), then
    stop the query. Returns after the drain is complete."""
    q = (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: commit_batch(df, bid, out_dir)
        )
        .option("checkpointLocation", checkpoint)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return q
