"""EXECUTED database legs via stdlib ``sqlite3`` behind the Spark 4
Python DataSource API — the engine's RDBMS story made runnable in this
container (no JDBC driver jars ship here, so the JDBC plans in
``sources/jdbc.py`` stay construction-tested; THIS module executes the
same operator semantics against a real SQL database).

Reference parity (coffee_etl_clean):
* batched bulk insert — ``etl/db/sql_client.py:118-194`` does
  ``executemany`` over explicit batches into staging; the writer here
  batches ``executemany`` the same way (``batch_size`` option), one
  shard database per task.
* DDL bootstrap / truncate — ``main.py`` creates tables idempotently
  and truncates staging before a load; ``commit()`` runs
  ``CREATE TABLE IF NOT EXISTS`` and honors ``truncate=true``.
* SQL passthrough + table scan — the reader accepts either
  ``table`` or an arbitrary ``query``; equality/range predicates are
  PUSHED into the database's WHERE clause (``pushFilters``), which is
  exactly what the JDBC source would do.

Scale shape: the reader plans one partition per rowid range — each
task opens its own connection and scans only its slice (the
partitioned-JDBC-scan pattern from ``sources/jdbc.read_table``); the
writer lands one shard per task, and only the driver's commit merges
shards into the target (SQLite's single-writer lock makes the merge
driver-side; a server RDBMS would commit per-task transactions
instead — the class structure is the same).
"""

from __future__ import annotations

import os
import shutil
import sqlite3
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)


@dataclass
class _RowidRange(InputPartition):
    lo: int
    hi: int  # inclusive


def _quote(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


class SqliteReader(DataSourceReader):
    def __init__(self, schema, options) -> None:
        self.path = options["path"]
        self.table = options.get("table")
        self.query = options.get("query")
        if not self.table and not self.query:
            raise ValueError("sqlite source needs 'table' or 'query'")
        self.n_parts = int(options.get("n_partitions", 4))
        self.cols = [f.name for f in schema.fields]
        self.pushed: list[str] = []

    def pushFilters(self, filters):
        """Absorb equality/range predicates into the database WHERE
        clause (the JDBC-source contract); anything else is returned
        for Spark to evaluate post-scan."""
        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
        }
        for f in filters:
            op = ops.get(type(f))
            if (
                op is not None
                and len(f.attribute) == 1
                and isinstance(f.value, (int, float, str))
            ):
                self.pushed.append(f"{f.attribute[0]} {op} {_quote(f.value)}")
            else:
                yield f

    def _source_sql(self) -> str:
        return self.table if self.table else f"({self.query})"

    def partitions(self):
        # driver-side planning query: rowid bounds → one range per task
        con = sqlite3.connect(self.path)
        try:
            if self.table:
                lo, hi = con.execute(
                    f"SELECT MIN(rowid), MAX(rowid) FROM {self.table}"
                ).fetchone()
            else:  # passthrough query: no rowid — single partition
                return [_RowidRange(0, 0)]
        finally:
            con.close()
        if lo is None:
            return [_RowidRange(1, 0)]  # empty table
        step = -(-(hi - lo + 1) // self.n_parts)
        return [
            _RowidRange(a, min(a + step - 1, hi))
            for a in range(lo, hi + 1, step)
        ]

    def read(self, part: _RowidRange):
        con = sqlite3.connect(self.path)
        try:
            where = list(self.pushed)
            if self.table:
                where.append(f"rowid BETWEEN {part.lo} AND {part.hi}")
            clause = (" WHERE " + " AND ".join(where)) if where else ""
            sql = f"SELECT {', '.join(self.cols)} FROM {self._source_sql()}{clause}"
            yield from con.execute(sql)
        finally:
            con.close()


@dataclass
class SqliteCommit(WriterCommitMessage):
    shard_path: str
    n_rows: int
    n_quarantined: int = 0


class SqliteWriter(DataSourceWriter):
    """Batched bulk writer with BATCH-LEVEL ROLLBACK-AND-CONTINUE
    (reference ``etl/db/sql_client.py:153-183``: each executemany batch
    commits on its own; a failing batch is rolled back, quarantined, and
    the load continues with the next batch). Failed batches land in
    ``{table}__quarantine`` (original values + ``_error`` message) so an
    operator can replay them — the K8 failed-data-logger semantics made
    queryable.

    Shards are written under a per-write ``_shards-<token>`` temporary
    directory and the WHOLE directory is removed in commit/abort, so a
    failed or speculative task attempt (which never reports a commit
    message) cannot leave an orphan shard database behind."""

    def __init__(self, schema, options, overwrite: bool) -> None:
        self.path = options["path"]
        self.table = options["table"]
        self.batch_size = int(options.get("batch_size", 500))
        self.truncate = options.get("truncate", "false").lower() == "true"
        #: optional explicit DDL (lets a test declare CHECK constraints
        #: that make a poison batch fail server-side)
        self.ddl_override = options.get("ddl")
        self.cols = [f.name for f in schema.fields]
        self.overwrite = overwrite
        # generated driver-side at plan time; pickled to every task so
        # all shards of THIS write land in one disposable directory
        self.shard_dir = f"{self.path}._shards-{uuid.uuid4().hex[:12]}"

    def _ddl(self) -> str:
        if self.ddl_override:
            return self.ddl_override
        return (
            f"CREATE TABLE IF NOT EXISTS {self.table} "
            f"({', '.join(self.cols)})"
        )

    def _quarantine_ddl(self) -> str:
        # no constraints here on purpose: quarantine must accept exactly
        # the rows the target rejected
        return (
            f"CREATE TABLE IF NOT EXISTS {self.table}__quarantine "
            f"({', '.join(self.cols)}, _error)"
        )

    # executor side: one shard database per task, batched executemany
    def write(self, iterator) -> SqliteCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.shard_dir, exist_ok=True)
        shard = os.path.join(self.shard_dir, f"shard-{ctx.taskAttemptId()}")
        con = sqlite3.connect(shard)
        n = 0
        n_quarantined = 0
        try:
            # shards are disposable scratch (the driver-side merge is the
            # durable commit): skip per-transaction fsyncs, or small
            # batch sizes pay one disk sync PER BATCH
            con.execute("PRAGMA synchronous = OFF")
            con.execute("PRAGMA journal_mode = MEMORY")
            con.execute(self._ddl())
            con.execute(self._quarantine_ddl())
            ph = ", ".join("?" for _ in self.cols)
            ins = f"INSERT INTO {self.table} VALUES ({ph})"
            qins = f"INSERT INTO {self.table}__quarantine VALUES ({ph}, ?)"

            def flush(batch: list[tuple]) -> None:
                nonlocal n, n_quarantined
                try:
                    con.executemany(ins, batch)  # K4 batched bulk insert
                    con.commit()  # per-batch transaction
                    n += len(batch)
                except sqlite3.Error as e:
                    con.rollback()  # rollback THIS batch, keep going
                    con.executemany(qins, [r + (str(e),) for r in batch])
                    con.commit()
                    n_quarantined += len(batch)

            batch: list[tuple] = []
            for row in iterator:
                batch.append(tuple(row))
                if len(batch) >= self.batch_size:
                    flush(batch)
                    batch = []
            if batch:
                flush(batch)
        finally:
            con.close()
        return SqliteCommit(shard_path=shard, n_rows=n, n_quarantined=n_quarantined)

    # driver side: DDL bootstrap + optional truncate, then shard merge
    def commit(self, messages) -> None:
        con = sqlite3.connect(self.path)
        try:
            con.execute(self._ddl())  # K7 idempotent bootstrap
            con.execute(self._quarantine_ddl())
            if self.truncate or self.overwrite:
                con.execute(f"DELETE FROM {self.table}")  # K6 truncate
                con.execute(f"DELETE FROM {self.table}__quarantine")
            for m in messages:
                if m is None:
                    continue
                con.execute("ATTACH DATABASE ? AS shard", (m.shard_path,))
                con.execute(
                    f"INSERT INTO {self.table} SELECT * FROM shard.{self.table}"
                )
                con.execute(
                    f"INSERT INTO {self.table}__quarantine "
                    f"SELECT * FROM shard.{self.table}__quarantine"
                )
                con.commit()
                con.execute("DETACH DATABASE shard")
            con.commit()
        finally:
            con.close()
        self._cleanup_shards()

    def abort(self, messages) -> None:
        self._cleanup_shards()

    def _cleanup_shards(self) -> None:
        # removes EVERY shard of this write — including ones from failed
        # or speculative attempts that never sent a commit message
        shutil.rmtree(self.shard_dir, ignore_errors=True)


class SqliteSimpleStreamReader(SimpleDataSourceStreamReader):
    """STREAMING READER leg: poll the database for new rows by rowid —
    the CDC-by-polling source every RDBMS-backed ETL starts with (the
    reference drains a queue; the queue's upstream is exactly this
    poll). Offsets are ``{"rowid": n}``: a micro-batch reads rows with
    ``rowid > start`` up to the current MAX(rowid), so replays
    (``readBetweenOffsets``) are exact and the stream is idempotent
    under checkpoint recovery. Deletions/updates are out of scope by
    design — rowid-tail polling is an APPEND-feed contract (real CDC
    needs the database's log, which SQLite doesn't expose).

    SINGLE-WRITER / ORDERED-COMMIT CONTRACT: rowid-tail polling assumes
    rowids become visible in order. If two writer connections
    interleave — a transaction holding LOWER rowids commits AFTER a
    poll already observed a higher MAX(rowid) — those rows land behind
    the checkpointed offset and are never read. SQLite's database-level
    write lock makes single-connection appenders safe; for a
    multi-writer feed, poll with a stability lag (take ``end`` =
    MAX(rowid) observed on the PREVIOUS poll, so in-flight writers one
    poll behind still surface) or switch to a log-based CDC source."""

    def __init__(self, schema, options) -> None:
        self.path = options["path"]
        self.table = options["table"]
        self.cols = [f.name for f in schema.fields]
        self.start_rowid = int(options.get("start_rowid", 0))

    def initialOffset(self) -> dict:
        return {"rowid": self.start_rowid}

    def _max_rowid(self, con) -> int:
        row = con.execute(f"SELECT MAX(rowid) FROM {self.table}").fetchone()
        return int(row[0]) if row and row[0] is not None else 0

    def read(self, start: dict):
        con = sqlite3.connect(self.path)
        try:
            end = max(self._max_rowid(con), start["rowid"])
            rows = con.execute(
                f"SELECT {', '.join(self.cols)} FROM {self.table} "
                "WHERE rowid > ? AND rowid <= ?",
                (start["rowid"], end),
            ).fetchall()
        finally:
            con.close()
        return iter(rows), {"rowid": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        con = sqlite3.connect(self.path)
        try:
            yield from con.execute(
                f"SELECT {', '.join(self.cols)} FROM {self.table} "
                "WHERE rowid > ? AND rowid <= ?",
                (start["rowid"], end["rowid"]),
            )
        finally:
            con.close()

    def commit(self, end: dict) -> None:
        pass  # offsets live in the Spark checkpoint; nothing DB-side


class SqliteDataSource(DataSource):
    """``spark.read.format("sqlite").option("path", db).option("table", t)``
    and the matching ``df.write.format("sqlite")`` leg."""

    @classmethod
    def name(cls) -> str:
        return "sqlite"

    def schema(self):
        raise NotImplementedError("pass an explicit schema")

    def reader(self, schema) -> SqliteReader:
        return SqliteReader(schema, self.options)

    def writer(self, schema, overwrite: bool) -> SqliteWriter:
        return SqliteWriter(schema, self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "SqliteStreamWriter":
        return SqliteStreamWriter(schema, self.options)

    def simpleStreamReader(self, schema) -> SqliteSimpleStreamReader:
        return SqliteSimpleStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(SqliteDataSource)


class SqliteStreamWriter(SqliteWriter, DataSourceStreamWriter):
    """Streaming leg: EXACTLY-ONCE into the database via a batch log.
    ``commit(messages, batchId)`` merges the batch's shards and records
    the batch id in ``_batch_log`` in the SAME transaction; a replayed
    batch (checkpoint recovery) finds its id already logged and skips —
    the transactional-sink idempotence recipe every
    Kafka→Spark→RDBMS pipeline uses (cf. streaming/manifest.py for the
    file-sink form of the same rule)."""

    def __init__(self, schema, options) -> None:
        super().__init__(schema, options, overwrite=False)

    def commit(self, messages, batchId: int) -> None:  # type: ignore[override]
        con = sqlite3.connect(self.path)
        con.isolation_level = None  # explicit transaction control
        try:
            con.execute(self._ddl())
            con.execute(self._quarantine_ddl())
            con.execute(
                "CREATE TABLE IF NOT EXISTS _batch_log (batch_id INTEGER PRIMARY KEY)"
            )
            # SQLite forbids ATTACH inside a transaction, so shard rows
            # are read through SEPARATE connections and inserted on the
            # target connection — which lets the merged rows and the
            # _batch_log row commit ATOMICALLY. A crash between them can
            # no longer leave rows committed but the batch unlogged
            # (which would duplicate every shard on checkpoint replay).
            con.execute("BEGIN IMMEDIATE")
            try:
                already = con.execute(
                    "SELECT 1 FROM _batch_log WHERE batch_id = ?", (batchId,)
                ).fetchone()
                if already is None:
                    ph = ", ".join("?" for _ in self.cols)
                    # Stream each shard in bounded chunks (fetchmany +
                    # executemany) instead of fetchall(): the merge and
                    # the _batch_log row still commit in ONE target
                    # transaction, but a large micro-batch no longer
                    # materializes whole shards in driver memory.
                    chunk = 10_000
                    for m in messages:
                        if m is None:
                            continue
                        src = sqlite3.connect(m.shard_path)
                        try:
                            cur = src.execute(
                                f"SELECT * FROM {self.table}"
                            )
                            while True:
                                rows = cur.fetchmany(chunk)
                                if not rows:
                                    break
                                con.executemany(
                                    f"INSERT INTO {self.table} VALUES ({ph})",
                                    rows,
                                )
                            try:
                                qcur = src.execute(
                                    f"SELECT * FROM {self.table}__quarantine"
                                )
                            except sqlite3.OperationalError:
                                qcur = None  # shard predates quarantine
                            while qcur is not None:
                                qrows = qcur.fetchmany(chunk)
                                if not qrows:
                                    break
                                con.executemany(
                                    f"INSERT INTO {self.table}__quarantine "
                                    f"VALUES ({ph}, ?)",
                                    qrows,
                                )
                        finally:
                            src.close()
                    con.execute(
                        "INSERT INTO _batch_log (batch_id) VALUES (?)", (batchId,)
                    )
                con.execute("COMMIT")
            except BaseException:
                con.execute("ROLLBACK")
                raise
        finally:
            con.close()
        self._cleanup_shards()

    def abort(self, messages, batchId: int) -> None:  # type: ignore[override]
        self._cleanup_shards()
