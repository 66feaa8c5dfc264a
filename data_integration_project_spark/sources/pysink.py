"""Custom Python DataSource SINK (Spark 4 ``DataSourceWriter``): a
JSON-lines file sink with a two-phase temp+rename commit protocol.

The write-side extension point complementing ``sources/pygen.py``'s
reader: executors stream rows into per-task-attempt files under
``_temporary/``, return a ``WriterCommitMessage`` per successful task,
and the DRIVER publishes exactly the reported attempts by renaming them
to final names in ``commit()`` — a failed or speculative duplicate
attempt never becomes visible because its message never reaches the
driver (the same visibility rule as Spark's HadoopMapReduceCommitProtocol
and the streaming manifest sink in ``streaming/manifest.py``).

Parity note: the reference's sinks append rows imperatively with no
commit point (coffee_etl_clean/etl/db/sql_client.py:118-194 —
executemany straight into staging); this sink is the Spark-idiomatic
replacement where partial-failure atomicity comes from the commit
protocol, not from transactional DDL.

Local-filesystem rename is atomic per file; on an object store the same
protocol needs a manifest commit (see ``streaming/manifest.py``) rather
than rename — the class structure is identical.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class JsonlCommit(WriterCommitMessage):
    temp_path: str
    final_name: str
    n_rows: int


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")
        self.overwrite = overwrite

    # executor side: one call per task, streaming the partition iterator
    def write(self, iterator) -> JsonlCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        tmp_dir = os.path.join(self.path, "_temporary")
        os.makedirs(tmp_dir, exist_ok=True)
        tmp = os.path.join(
            tmp_dir, f"attempt-{ctx.taskAttemptId()}-part-{pid:05d}.jsonl"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True, default=str))
                f.write("\n")
                n += 1
        return JsonlCommit(temp_path=tmp, final_name=f"part-{pid:05d}.jsonl", n_rows=n)

    # driver side: publish exactly the attempts that reported success
    def commit(self, messages) -> None:
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, name))
        total = 0
        published = []
        for m in messages:
            if m is None:
                continue
            os.replace(m.temp_path, os.path.join(self.path, m.final_name))
            published.append(m.final_name)
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as f:
            json.dump({"files": sorted(published), "rows": total}, f)
        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)

    def abort(self, messages) -> None:
        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonlStreamSinkWriter":
        return JsonlStreamSinkWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)


class JsonlStreamSinkWriter(DataSourceStreamWriter):
    """Streaming leg of the sink (Spark 4 ``DataSourceStreamWriter``):
    per micro-batch, executors write per-task-attempt temp files and
    the driver publishes them under batch-scoped final names plus a
    ``_batch-N.json`` manifest in ``commit(messages, batchId)``. A
    replayed batch (checkpoint recovery) overwrites the SAME final
    names and manifest — publish is idempotent on batch replay, which
    is the streaming exactly-once contract (same rule as
    ``streaming/manifest.py``'s foreachBatch sink, now behind the
    engine's sink API instead of user code)."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")

    def write(self, iterator) -> JsonlCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        tmp_dir = os.path.join(self.path, "_temporary")
        os.makedirs(tmp_dir, exist_ok=True)
        tmp = os.path.join(
            tmp_dir, f"attempt-{ctx.taskAttemptId()}-part-{pid:05d}.jsonl"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True, default=str))
                f.write("\n")
                n += 1
        return JsonlCommit(temp_path=tmp, final_name=f"part-{pid:05d}.jsonl", n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        total = 0
        published = []
        for m in messages:
            if m is None:
                continue
            final = f"batch-{batchId:05d}-{m.final_name}"
            os.replace(m.temp_path, os.path.join(self.path, final))
            published.append(final)
            total += m.n_rows
        manifest = os.path.join(self.path, f"_batch-{batchId:05d}.json")
        with open(manifest, "w", encoding="utf-8") as f:
            json.dump({"batch": batchId, "files": sorted(published), "rows": total}, f)

    def abort(self, messages, batchId: int) -> None:
        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)
