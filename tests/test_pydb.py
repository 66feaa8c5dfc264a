"""Executed-database sink invariants (sources/pydb.py), tested without
a Spark session: the streaming batch-log commit must be IDEMPOTENT on
replay — a re-delivered batch id is a no-op even if the replayed shard
contains different bytes — and a new batch id must apply. This is the
contract that makes the sqlite stream sink exactly-once under
checkpoint recovery (sensors_sqlite_stream_sink exercises the live
path; this pins the replay branch the live path can't force).
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import types as T

from data_integration_project_spark.sources.pydb import (
    SqliteCommit,
    SqliteStreamWriter,
)

_SCHEMA = T.StructType(
    [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
)


def _shard(path, rows):
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (a, b)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    con.commit()
    con.close()
    return str(path)


def _count(db):
    con = sqlite3.connect(db)
    try:
        return con.execute("SELECT COUNT(*), COALESCE(SUM(a), 0) FROM t").fetchone()
    finally:
        con.close()


def test_stream_commit_replay_is_noop(tmp_path):
    db = str(tmp_path / "main.db")
    w = SqliteStreamWriter(_SCHEMA, {"path": db, "table": "t"})

    s1 = _shard(tmp_path / "main.db.shard-1", [(1, "x"), (2, "y")])
    w.commit([SqliteCommit(s1, 2)], 7)
    assert _count(db) == (2, 3)

    # replay of batch 7 with DIFFERENT content must be skipped entirely
    s2 = _shard(tmp_path / "main.db.shard-2", [(100, "z")])
    w.commit([SqliteCommit(s2, 1)], 7)
    assert _count(db) == (2, 3), "replayed batch was applied twice"

    # a genuinely new batch id applies
    s3 = _shard(tmp_path / "main.db.shard-3", [(10, "w")])
    w.commit([SqliteCommit(s3, 1)], 8)
    assert _count(db) == (3, 13)

    con = sqlite3.connect(db)
    logged = sorted(
        r[0] for r in con.execute("SELECT batch_id FROM _batch_log").fetchall()
    )
    con.close()
    assert logged == [7, 8]


def test_batch_rollback_and_continue(spark, tmp_path):
    """sql_client.py:153-183 semantics: a batch whose insert fails is
    rolled back and quarantined WHOLE (the database can't say which row
    poisoned the executemany), and the load continues with the next
    batch. 10 ordered rows, batch_size 4, poison at row 6 → batch
    [5..8] quarantines (4 rows), batches [1..4] and [9,10] load."""
    from data_integration_project_spark.sources import pydb

    pydb.register(spark)
    db = str(tmp_path / "pl.db")
    rows = [(i, float(i)) for i in range(1, 11)]
    df = (
        spark.createDataFrame(rows, "k long, v double")
        .repartition(1)
        .sortWithinPartitions("k")
    )
    ddl = "CREATE TABLE IF NOT EXISTS t (k, v, CHECK (k <> 6))"
    (
        df.write.format("sqlite")
        .option("path", db)
        .option("table", "t")
        .option("ddl", ddl)
        .option("batch_size", "4")
        .mode("append")
        .save()
    )
    con = sqlite3.connect(db)
    try:
        loaded = sorted(r[0] for r in con.execute("SELECT k FROM t"))
        quarantined = sorted(
            r[0] for r in con.execute("SELECT k FROM t__quarantine")
        )
        errs = {r[0] for r in con.execute("SELECT _error FROM t__quarantine")}
    finally:
        con.close()
    assert loaded == [1, 2, 3, 4, 9, 10]
    assert quarantined == [5, 6, 7, 8]
    assert all("CHECK" in e or "constraint" in e.lower() for e in errs)
    # no orphan shard directories left behind (temp-dir cleanup)
    import glob

    assert glob.glob(db + "._shards-*") == []


def test_simple_stream_reader_offsets(tmp_path):
    """The CDC-polling stream reader's offset contract: read() returns
    only rows past the start offset and advances to MAX(rowid);
    readBetweenOffsets replays a closed range exactly (checkpoint
    recovery path)."""
    from data_integration_project_spark.sources.pydb import (
        SqliteSimpleStreamReader,
    )

    db = str(tmp_path / "feed.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (a, b)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(1, "x"), (2, "y")])
    con.commit()

    schema = _SCHEMA
    r = SqliteSimpleStreamReader(schema, {"path": db, "table": "t"})
    assert r.initialOffset() == {"rowid": 0}
    rows, end = r.read({"rowid": 0})
    assert sorted(rows) == [(1, "x"), (2, "y")] and end == {"rowid": 2}
    # no new data: empty batch, offset unchanged
    rows2, end2 = r.read(end)
    assert list(rows2) == [] and end2 == {"rowid": 2}
    # delta arrives; next poll reads ONLY the delta
    con.execute("INSERT INTO t VALUES (3, 'z')")
    con.commit()
    rows3, end3 = r.read(end2)
    assert list(rows3) == [(3, "z")] and end3 == {"rowid": 3}
    # replay a committed range bit-exactly
    assert list(r.readBetweenOffsets({"rowid": 0}, {"rowid": 2})) == [
        (1, "x"),
        (2, "y"),
    ]
    con.close()
