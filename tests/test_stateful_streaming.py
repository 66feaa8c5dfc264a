"""applyInPandasWithState operators: per-key state must accumulate
across micro-batches AND across query restarts (checkpointed state
store), and cross-batch first-wins dedup must mark only true first
occurrences as new."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from data_integration_project_spark.streaming.stateful import (
    running_user_totals,
    stateful_first_wins,
)


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="stateful_")
    paths = {
        "in": os.path.join(root, "in"),
        "out": os.path.join(root, "out"),
        "ckpt": os.path.join(root, "ckpt"),
    }
    os.makedirs(paths["in"])
    yield paths
    shutil.rmtree(root, ignore_errors=True)


def _drain(spark, paths, op):
    stream = spark.readStream.schema("user_id long, value double").json(paths["in"])

    def sink(batch, batch_id):
        if batch.count():
            batch.write.mode("append").parquet(paths["out"])

    q = (
        op(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", paths["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_state_survives_restart(spark, dirs):
    with open(os.path.join(dirs["in"], "a.json"), "w") as f:
        f.write('{"user_id": 1, "value": 10.0}\n')
        f.write('{"user_id": 1, "value": 5.0}\n')
        f.write('{"user_id": 2, "value": 1.0}\n')
    _drain(spark, dirs, running_user_totals)

    # second file, NEW query run, SAME checkpoint → state must carry over
    with open(os.path.join(dirs["in"], "b.json"), "w") as f:
        f.write('{"user_id": 1, "value": 2.5}\n')
    _drain(spark, dirs, running_user_totals)

    out = spark.read.parquet(dirs["out"])
    latest = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in out.orderBy("n_events").collect()  # last write wins per user
    }
    assert latest[1] == (3, 17.5)  # 2 events from batch A + 1 from batch B
    assert latest[2] == (1, 1.0)


def test_stateful_first_wins_marks_only_first(spark, dirs):
    with open(os.path.join(dirs["in"], "a.json"), "w") as f:
        f.write('{"user_id": 1, "value": 1.0}\n')
        f.write('{"user_id": 1, "value": 1.0}\n')

    def op(stream):
        keyed = stream.selectExpr("CAST(user_id AS STRING) AS k")
        return stateful_first_wins(keyed)

    _drain(spark, dirs, op)
    with open(os.path.join(dirs["in"], "b.json"), "w") as f:
        f.write('{"user_id": 1, "value": 1.0}\n')
    _drain(spark, dirs, op)

    rows = sorted(
        spark.read.parquet(dirs["out"]).collect(), key=lambda r: r["n_occurrences"]
    )
    assert rows[0]["is_new"] is True and rows[0]["n_occurrences"] == 2
    assert rows[-1]["is_new"] is False and rows[-1]["n_occurrences"] == 3
