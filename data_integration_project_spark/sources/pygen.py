"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic telemetry generator with real partition planning.

This is the §2.1 extension point beyond file/JDBC sources: the same API
a team uses to expose an internal service, a proprietary format, or a
test-data generator as a first-class ``spark.read.format(...)`` source.
The planner calls ``partitions()`` once (N partitions → N parallel
tasks) and ``read(partition)`` per task — so the source scales out like
any file scan, with no driver bottleneck.

Rows are a pure function of the row id (affine arithmetic mod the usual
Mersenne prime), so any engine can replay the stream exactly — the
DuckDB oracle regenerates it from ``range()``. No RNG, no state.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)

P = 2_147_483_647
A, B = 48_271, 11_213

SCHEMA_DDL = (
    "reading_id long, sensor_id int, micro_value long, status string"
)


def row_for(i: int) -> tuple:
    """The generator contract, shared with the oracle: one row per id."""
    h = (A * i + B) % P
    return (
        i,
        i % 50,
        h % 1_000_000,
        "ok" if h % 97 != 0 else "fault",
    )


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class SensorReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 100_000))
        self.n_parts = int(options.get("n_partitions", 8))
        self.sensor_eq: int | None = None  # set by pushFilters

    def pushFilters(self, filters):
        """Source-side FILTER PUSHDOWN (Spark 4.1 DataSource API): an
        ``sensor_id = k`` equality is absorbed into the source — the
        generator then steps straight through that sensor's ids
        (``k, k+50, k+100, …``) and emits 1/50th of the rows, exactly
        the scan reduction a database or service-backed source gets
        from native filtering. Everything else is returned for Spark
        to evaluate post-scan (the contract: returned filters must be
        the input objects by reference)."""
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("sensor_id",)
                and isinstance(f.value, int)
                and self.sensor_eq is None
            ):
                self.sensor_eq = int(f.value)
            else:
                yield f

    def partitions(self):
        step = -(-self.n_rows // self.n_parts)
        return [
            _Range(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Range):
        if self.sensor_eq is not None:
            k = self.sensor_eq
            first = partition.start + ((k - partition.start) % 50)
            for i in range(first, partition.end, 50):
                yield row_for(i)
        else:
            for i in range(partition.start, partition.end):
                yield row_for(i)


class SensorStreamReader(SimpleDataSourceStreamReader):
    """STREAMING leg of the same source (Spark 4
    ``SimpleDataSourceStreamReader``): offsets are plain row positions,
    each micro-batch advances by ``rows_per_batch`` until ``max_rows``.
    ``readBetweenOffsets`` replays any [start, end) range exactly —
    the recovery contract that makes the source exactly-once under
    checkpoint restart: because rows are a pure function of the id,
    replay is trivially deterministic (the property a real queue source
    gets from broker offsets)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 1024))
        self.max_rows = int(options.get("max_rows", 10_000))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = int(start["offset"])
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return iter([row_for(i) for i in range(lo, hi)]), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [row_for(i) for i in range(int(start["offset"]), int(end["offset"]))]
        )


class SensorDataSource(DataSource):
    """``spark.read.format("sensorgen").option("n_rows", ...)`` for
    batch; ``spark.readStream.format("sensorgen")`` for streaming."""

    @classmethod
    def name(cls) -> str:
        return "sensorgen"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> SensorReader:
        return SensorReader(self.options)

    def simpleStreamReader(self, schema) -> SensorStreamReader:
        return SensorStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SensorDataSource)
