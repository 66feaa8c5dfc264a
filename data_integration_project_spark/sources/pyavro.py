"""Avro Object Container Files in pure Python behind the Spark 4
DataSource API: a writer with the temp+rename commit protocol and a
reader with REAL byte-range split planning at sync markers.

The container classpath has ``avro-*.jar`` (the serialization core) but
not the ``spark-avro`` connector, so ``spark.read.format("avro")`` is
unavailable — and the Avro 1.11 spec is small enough to implement
directly: zigzag-varint ints/longs, little-endian IEEE floats/doubles,
length-prefixed strings/bytes, ``["null", T]`` unions as a branch
index, logical ``date`` (int days) and ``timestamp-micros`` (long), all
framed into blocks of ``(row_count, byte_size, deflate(data), sync16)``.

The scale story is the split algorithm, the same one Hadoop's
AvroRecordReader uses: a planner assigns byte ranges [start, end) with
NO knowledge of block boundaries; each task parses the (small) header
for schema/codec/sync, then scans forward from its range start to the
first 16-byte sync marker and decodes exactly the blocks that BEGIN
inside its range. Every block is owned by exactly one split, so a
100 TB directory of .avro files parallelizes like parquet without any
central index. Deflate is stdlib zlib (raw, wbits=-15 per spec).

Parity: the reference ingests only CSV/RDBMS (coffee_etl_clean/etl/
extract/file_source.py, sql_client.py); Avro is part of this engine's
§2.1 source surface alongside parquet/ORC/CSV/JSON/SQLite.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import os
import shutil
import struct
import zlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_MAGIC = b"Obj\x01"
_EPOCH_DATE = dt.date(1970, 1, 1)
_EPOCH_TS = dt.datetime(1970, 1, 1)


# ---------------------------------------------------------------------------
# Primitive codecs (Avro spec §Binary Encoding)
# ---------------------------------------------------------------------------


def _zigzag_encode(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    u, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _enc_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _zigzag_encode(len(raw)) + raw


# ---------------------------------------------------------------------------
# Schema mapping: Spark DDL <-> Avro record schema (flat records, the
# subset every tabular Avro producer emits)
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "long": "long",
    "bigint": "long",
    "int": "int",
    "integer": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
}

_AVRO_TO_SPARK = {
    "long": "bigint",
    "int": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "bytes": "binary",
    ("int", "date"): "date",
    ("long", "timestamp-micros"): "timestamp",
}


def avro_schema_for(spark_schema) -> dict:
    """Build the Avro record schema for a Spark StructType; every field
    is written as the nullable union ``["null", T]`` (the tabular
    convention), with null branch index 0."""
    fields = []
    for f in spark_schema.fields:
        t = _SPARK_TO_AVRO.get(f.dataType.simpleString())
        if t is None:
            raise NotImplementedError(
                f"pyavro: unsupported Spark type {f.dataType.simpleString()}"
            )
        fields.append({"name": f.name, "type": ["null", t]})
    return {"type": "record", "name": "row", "fields": fields}


def _avro_field_kind(ftype) -> tuple[str, bool]:
    """Normalize a field's Avro type to (kind, nullable); kind is the
    primitive name or 'date'/'timestamp-micros' for logical types."""
    nullable = False
    if isinstance(ftype, list):
        branches = [b for b in ftype if b != "null"]
        if len(branches) != 1 or len(branches) == len(ftype):
            raise NotImplementedError("pyavro: only ['null', T] unions")
        nullable = True
        ftype = branches[0]
    if isinstance(ftype, dict):
        logical = ftype.get("logicalType")
        if logical in ("date", "timestamp-micros"):
            return logical, nullable
        ftype = ftype["type"]
    return ftype, nullable


def spark_ddl_for(avro_schema: dict) -> str:
    """Schema inference: Avro record schema -> Spark DDL string."""
    cols = []
    for f in avro_schema["fields"]:
        kind, _ = _avro_field_kind(f["type"])
        spark_t = {
            "date": "date",
            "timestamp-micros": "timestamp",
        }.get(kind) or _AVRO_TO_SPARK[kind]
        cols.append(f"{f['name']} {spark_t}")
    return ", ".join(cols)


def _encode_value(kind: str, v) -> bytes:
    if kind == "long" or kind == "int":
        return _zigzag_encode(int(v))
    if kind == "double":
        return struct.pack("<d", float(v))
    if kind == "float":
        return struct.pack("<f", float(v))
    if kind == "string":
        return _enc_string(str(v))
    if kind == "boolean":
        return b"\x01" if v else b"\x00"
    if kind == "bytes":
        raw = bytes(v)
        return _zigzag_encode(len(raw)) + raw
    if kind == "date":
        return _zigzag_encode((v - _EPOCH_DATE).days)
    if kind == "timestamp-micros":
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        d = v - _EPOCH_TS
        micros = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
        return _zigzag_encode(micros)
    raise NotImplementedError(f"pyavro: encode {kind}")


def _decode_value(kind: str, buf: bytes, pos: int):
    if kind in ("long", "int", "date", "timestamp-micros"):
        v, pos = _zigzag_decode(buf, pos)
        if kind == "date":
            return _EPOCH_DATE + dt.timedelta(days=v), pos
        if kind == "timestamp-micros":
            return _EPOCH_TS + dt.timedelta(microseconds=v), pos
        return v, pos
    if kind == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if kind == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if kind in ("string", "bytes"):
        n, pos = _zigzag_decode(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if kind == "string" else bytes(raw)), pos + n
    if kind == "boolean":
        return buf[pos] == 1, pos + 1
    raise NotImplementedError(f"pyavro: decode {kind}")


def _skip_value(kind: str, buf: bytes, pos: int) -> int:
    """Advance past one value without materializing it — the reader-
    schema resolution path for writer fields the reader dropped."""
    if kind in ("long", "int", "date", "timestamp-micros"):
        _, pos = _zigzag_decode(buf, pos)
        return pos
    if kind == "double":
        return pos + 8
    if kind == "float":
        return pos + 4
    if kind in ("string", "bytes"):
        n, pos = _zigzag_decode(buf, pos)
        return pos + n
    if kind == "boolean":
        return pos + 1
    raise NotImplementedError(f"pyavro: skip {kind}")


# ---------------------------------------------------------------------------
# Container framing
# ---------------------------------------------------------------------------


def write_ocf(
    path: str,
    avro_schema: dict,
    rows,
    *,
    codec: str = "deflate",
    block_rows: int = 1000,
) -> int:
    """Write one Object Container File; the sync marker derives from the
    file name (deterministic, no RNG). Returns rows written."""
    field_kinds = [_avro_field_kind(f["type"]) for f in avro_schema["fields"]]
    sync = hashlib.md5(os.path.basename(path).encode()).digest()
    meta = {
        "avro.schema": json.dumps(avro_schema, separators=(",", ":")),
        "avro.codec": codec,
    }
    n_total = 0
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(_zigzag_encode(len(meta)))
        for k, v in sorted(meta.items()):
            f.write(_enc_string(k))
            raw = v.encode("utf-8")
            f.write(_zigzag_encode(len(raw)) + raw)
        f.write(_zigzag_encode(0))  # end of metadata map
        f.write(sync)

        block = bytearray()
        n_block = 0

        def flush() -> None:
            nonlocal block, n_block
            if not n_block:
                return
            data = bytes(block)
            if codec == "deflate":
                data = zlib.compress(data, 6)[2:-4]  # raw deflate per spec
            f.write(_zigzag_encode(n_block))
            f.write(_zigzag_encode(len(data)))
            f.write(data)
            f.write(sync)
            block, n_block = bytearray(), 0

        for row in rows:
            for (kind, nullable), v in zip(field_kinds, row):
                if nullable:
                    if v is None:
                        block += _zigzag_encode(0)
                        continue
                    block += _zigzag_encode(1)
                elif v is None:
                    raise ValueError("pyavro: null in non-nullable field")
                block += _encode_value(kind, v)
            n_block += 1
            n_total += 1
            if n_block >= block_rows:
                flush()
        flush()
    return n_total


def read_header(path: str) -> tuple[dict, str, bytes, int]:
    """Parse the OCF header: (schema, codec, sync, header_length)."""
    with open(path, "rb") as f:
        head = f.read(65536)
    if head[:4] != _MAGIC:
        raise ValueError(f"pyavro: {path} is not an Avro container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(head, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count precedes a byte size
            n = -n
            _, pos = _zigzag_decode(head, pos)
        for _ in range(n):
            klen, pos = _zigzag_decode(head, pos)
            key = head[pos : pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = _zigzag_decode(head, pos)
            meta[key] = head[pos : pos + vlen]
            pos += vlen
    sync = head[pos : pos + 16]
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync, pos + 16


def read_blocks(path: str, start: int, end: int, reader_schema: dict | None = None):
    """Yield decoded rows from every block that BEGINS in [start, end) —
    the Hadoop split contract. Seeks to ``start``, scans to the first
    sync marker at or after it (the header end counts as a boundary),
    then walks block frames until the next block would begin past
    ``end``.

    With ``reader_schema``, Avro SCHEMA RESOLUTION applies (spec
    "Schema Resolution"): fields are matched by NAME — writer fields
    the reader dropped are skipped on the wire without materializing;
    reader fields the writer never wrote fill from their declared
    ``default``. Rows come out in READER field order, which is how old
    files stay readable under an evolved schema with no rewrite."""
    schema, codec, sync, header_len = read_header(path)
    field_kinds = [_avro_field_kind(f["type"]) for f in schema["fields"]]
    plan = None
    if reader_schema is not None:
        writer_names = [f["name"] for f in schema["fields"]]
        reader_fields = reader_schema["fields"]
        reader_pos = {f["name"]: i for i, f in enumerate(reader_fields)}
        # per writer field: output slot or None (skip)
        plan = [reader_pos.get(n) for n in writer_names]
        defaults = [f.get("default") for f in reader_fields]
        n_out = len(reader_fields)
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        if start <= header_len:
            pos = header_len
        else:
            # scan for the sync marker; a block begins right after it
            f.seek(max(start - 16, 0))
            window = f.read(min(end, size) - max(start - 16, 0) + 16 + 1024)
            hit = window.find(sync)
            base = max(start - 16, 0)
            while hit != -1 and base + hit + 16 < start:
                hit = window.find(sync, hit + 1)
            if hit == -1:
                return
            pos = base + hit + 16
        while pos < min(end, size):
            f.seek(pos)
            frame_head = f.read(20)
            if len(frame_head) < 2:
                return
            n_rows, p = _zigzag_decode(frame_head, 0)
            n_bytes, p = _zigzag_decode(frame_head, p)
            f.seek(pos + p)
            data = f.read(n_bytes)
            if codec == "deflate":
                data = zlib.decompress(data, wbits=-15)
            elif codec != "null":
                raise NotImplementedError(f"pyavro: codec {codec}")
            dpos = 0
            for _ in range(n_rows):
                if plan is None:
                    row = []
                    for kind, nullable in field_kinds:
                        if nullable:
                            branch, dpos = _zigzag_decode(data, dpos)
                            if branch == 0:
                                row.append(None)
                                continue
                        v, dpos = _decode_value(kind, data, dpos)
                        row.append(v)
                    yield tuple(row)
                    continue
                out = list(defaults)
                for slot, (kind, nullable) in zip(plan, field_kinds):
                    if nullable:
                        branch, dpos = _zigzag_decode(data, dpos)
                        if branch == 0:
                            if slot is not None:
                                out[slot] = None
                            continue
                    if slot is None:
                        dpos = _skip_value(kind, data, dpos)
                    else:
                        out[slot], dpos = _decode_value(kind, data, dpos)
                yield tuple(out)
            pos = pos + p + n_bytes + 16  # skip trailing sync


# ---------------------------------------------------------------------------
# Spark DataSource reader: byte-range split planning
# ---------------------------------------------------------------------------


@dataclass
class _AvroSplit(InputPartition):
    path: str
    start: int
    end: int


class AvroReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyavro requires option 'path'")
        self.split_size = int(options.get("split_size", 128 * 1024 * 1024))
        rs = options.get("reader_schema")
        self.reader_schema = json.loads(rs) if rs else None

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, n)
                for n in os.listdir(self.path)
                if n.endswith(".avro")
            )
        return [self.path]

    def partitions(self):
        splits = []
        for p in self._files():
            size = os.path.getsize(p)
            off = 0
            while off < size:
                splits.append(_AvroSplit(p, off, min(off + self.split_size, size)))
                off += self.split_size
        return splits or [_AvroSplit(self.path, 0, 0)]

    def read(self, split: _AvroSplit):
        if split.start >= split.end:
            return  # empty dataset (e.g. directory with no .avro files)
        yield from read_blocks(
            split.path, split.start, split.end, self.reader_schema
        )


# ---------------------------------------------------------------------------
# Spark DataSource writer: temp + rename commit (same protocol as
# sources/pysink.py — only reported attempts become visible)
# ---------------------------------------------------------------------------


@dataclass
class AvroCommit(WriterCommitMessage):
    temp_path: str
    final_name: str
    n_rows: int


class AvroWriter(DataSourceWriter):
    def __init__(self, schema, options, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyavro requires option 'path'")
        self.avro_schema = avro_schema_for(schema)
        self.codec = options.get("codec", "deflate")
        self.block_rows = int(options.get("block_rows", 1000))
        self.overwrite = overwrite

    def write(self, iterator) -> AvroCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        tmp_dir = os.path.join(self.path, "_temporary")
        os.makedirs(tmp_dir, exist_ok=True)
        final = f"part-{pid:05d}.avro"
        tmp = os.path.join(tmp_dir, f"attempt-{ctx.taskAttemptId()}-{final}")
        n = write_ocf(
            tmp,
            self.avro_schema,
            (tuple(row) for row in iterator),
            codec=self.codec,
            block_rows=self.block_rows,
        )
        return AvroCommit(temp_path=tmp, final_name=final, n_rows=n)

    def commit(self, messages) -> None:
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.endswith(".avro"):
                    os.remove(os.path.join(self.path, name))
        total = 0
        for m in messages:
            if m is None:
                continue
            os.replace(m.temp_path, os.path.join(self.path, m.final_name))
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as f:
            json.dump({"rows": total}, f)
        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)

    def abort(self, messages) -> None:
        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)


class AvroDataSource(DataSource):
    """``spark.read.format("pyavro").option("path", dir)`` /
    ``df.write.format("pyavro")``. ``schema()`` infers from the first
    file's embedded Avro schema when the user supplies none."""

    @classmethod
    def name(cls) -> str:
        return "pyavro"

    def schema(self) -> str:
        reader = AvroReader(self.options)
        if reader.reader_schema is not None:
            return spark_ddl_for(reader.reader_schema)
        files = reader._files()
        if not files or not os.path.exists(files[0]):
            raise ValueError("pyavro: cannot infer schema from empty path")
        avro_schema, _, _, _ = read_header(files[0])
        return spark_ddl_for(avro_schema)

    def reader(self, schema) -> AvroReader:
        return AvroReader(self.options)

    def writer(self, schema, overwrite: bool) -> AvroWriter:
        return AvroWriter(schema, self.options, overwrite)


def register(spark) -> None:
    spark.dataSource.register(AvroDataSource)
