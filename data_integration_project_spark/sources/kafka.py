"""Kafka source/sink legs (reference S9/K1 "or Kafka" mapping,
SURVEY.md §2.1) — construction-only in this container, mirroring the
JDBC pattern (``sources/jdbc.py`` builds plans, ``sources/pydb.py``
executes the semantics): here :mod:`streaming.pipeline`'s file-inbox
``Trigger.AvailableNow`` drain is the EXECUTED twin (bounded drain,
ack = checkpoint commit, nack → error zone), and this module wires the
real ``format("kafka")`` options so the same pipeline runs against a
broker the moment one is reachable.

Reference mapping (``etl/broker/rabbitmq_client.py``):

- connect + queue declare (:49-74)   → :func:`KafkaSource.options`
  (bootstrap servers + subscribe; declaration is broker-side in Kafka)
- bounded consume loop (:76-114)     → :func:`read_stream` with
  ``Trigger.AvailableNow`` semantics downstream (drain-and-stop), or
  :func:`read_batch` for the offset-bounded batch form
- publish w/ delivery confirm (:116-140) → :func:`write_stream` /
  :func:`write_batch` (Kafka acks are the confirm; idempotence via the
  envelope's run-scoped keys)

The payload is the SAME JSON envelope the file inbox uses
(``streaming/envelope.py``): ``value`` carries the envelope JSON,
``key`` carries the entity type so one topic partitions by entity —
the decode path (:func:`decoded_stream`) is shared verbatim with the
executed twin, which is what makes this leg construction-only rather
than semantics-only.

No broker runs in this container, so execution is gated on the caller
providing reachable ``bootstrap_servers``; construction (option
wiring, envelope decode schema, trigger selection) is unit-tested.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..streaming.envelope import decode_envelope


@dataclass(frozen=True)
class KafkaSource:
    """Connection descriptor (reference .env RABBITMQ_* settings →
    Kafka bootstrap/topic/group)."""

    bootstrap_servers: str  # host:port[,host:port...]
    topic: str
    group_id: str | None = None
    starting_offsets: str = "earliest"
    #: cap per micro-batch — the bounded-drain knob (the reference's
    #: consume loop reads until the queue is empty; maxOffsetsPerTrigger
    #: bounds each batch so a backlog can't OOM one trigger)
    max_offsets_per_trigger: int | None = None
    fail_on_data_loss: bool = False
    extra: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        out = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": self.topic,
            "startingOffsets": self.starting_offsets,
            "failOnDataLoss": str(self.fail_on_data_loss).lower(),
        }
        if self.group_id is not None:
            out["kafka.group.id"] = self.group_id
        if self.max_offsets_per_trigger is not None:
            out["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        out.update(self.extra)
        return out


def read_stream(spark: SparkSession, src: KafkaSource) -> DataFrame:
    """S9 queue consume as a stream: ``readStream.format("kafka")``.
    Drain-and-stop comes from running the downstream writeStream with
    ``Trigger.AvailableNow`` (the executed twin's trigger); ack is the
    checkpoint commit, nack is the corrupt→error-zone split."""
    r = spark.readStream.format("kafka")
    for k, v in src.options().items():
        r = r.option(k, v)
    return r.load()


def read_batch(
    spark: SparkSession,
    src: KafkaSource,
    starting: str = "earliest",
    ending: str = "latest",
) -> DataFrame:
    """Offset-bounded BATCH read of a topic — the reference's "drain
    what's there now" consume loop as a plain scan (no checkpoint;
    bounds pin the exact slice)."""
    r = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", src.bootstrap_servers)
        .option("subscribe", src.topic)
        .option("startingOffsets", starting)
        .option("endingOffsets", ending)
    )
    for k, v in src.extra.items():
        r = r.option(k, v)
    return r.load()


def decoded_stream(raw: DataFrame, data_schema: T.StructType) -> DataFrame:
    """Kafka rows → envelope-decoded entity rows: cast the byte
    ``value`` to string and reuse the file-inbox decode verbatim
    (``streaming/envelope.decode_envelope`` — corrupt payloads surface
    as ``_corrupt`` for the dead-letter split, reference nack
    requeue=False, main.py:716-720)."""
    return decode_envelope(
        raw.select(F.col("value").cast("string").alias("value")), data_schema
    )


def write_batch(enveloped: DataFrame, src: KafkaSource, key_col: str | None = None):
    """K1 publish (batch): one-column envelope JSON → topic. Returns
    the configured writer (caller ``.save()``s when a broker exists).
    ``key_col`` partitions the topic (entity type in the reference's
    one-queue-per-entity layout)."""
    out = enveloped.select(
        (
            F.col(key_col).cast("string") if key_col else F.lit(None).cast("string")
        ).alias("key"),
        F.col("value").cast("string").alias("value"),
    )
    return (
        out.write.format("kafka")
        .option("kafka.bootstrap.servers", src.bootstrap_servers)
        .option("topic", src.topic)
    )


def write_stream(
    enveloped: DataFrame,
    src: KafkaSource,
    checkpoint: str,
    key_col: str | None = None,
):
    """K1 publish (streaming): exactly-once-per-checkpoint into the
    topic. Returns the configured DataStreamWriter (caller ``.start()``s
    against a reachable broker)."""
    out = enveloped.select(
        (
            F.col(key_col).cast("string") if key_col else F.lit(None).cast("string")
        ).alias("key"),
        F.col("value").cast("string").alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", src.bootstrap_servers)
        .option("topic", src.topic)
        .option("checkpointLocation", checkpoint)
    )
