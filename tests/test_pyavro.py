"""Pure-Python tests for the Avro OCF codec (sources/pyavro.py): the
split-ownership contract, codec framing, and schema mapping — the
Spark-integrated round trip is the oracled catalog query
``orders_avro_roundtrip``."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pytest

from data_integration_project_spark.sources import pyavro

SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": ["null", "long"]},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": ["null", "double"]},
        {"name": "day", "type": ["null", {"type": "int", "logicalType": "date"}]},
    ],
}


def _rows(n: int):
    return [
        (
            i,
            None if i % 7 == 0 else f"name-{i}",
            i * 0.125,
            dt.date(1995, 1, 1) + dt.timedelta(days=i % 300),
        )
        for i in range(n)
    ]


def _write(path: str, n: int, block_rows: int = 50, codec: str = "deflate") -> None:
    pyavro.write_ocf(path, SCHEMA, _rows(n), codec=codec, block_rows=block_rows)


def test_roundtrip_full_file():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.avro")
        _write(p, 777)
        got = list(pyavro.read_blocks(p, 0, os.path.getsize(p)))
        assert got == _rows(777)


def test_zigzag_extremes():
    for v in (0, -1, 1, 2**62, -(2**62), 12345, -98765):
        enc = pyavro._zigzag_encode(v)
        dec, pos = pyavro._zigzag_decode(enc, 0)
        assert (dec, pos) == (v, len(enc))


@pytest.mark.parametrize("split_size", [400, 1000, 5000, 10**9])
def test_every_block_owned_by_exactly_one_split(split_size):
    """Arbitrary byte-range splits must partition the row set: no row
    lost, no row read twice, regardless of where the cuts land."""
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.avro")
        _write(p, 500, block_rows=37)
        size = os.path.getsize(p)
        got = []
        off = 0
        while off < size:
            got.extend(pyavro.read_blocks(p, off, min(off + split_size, size)))
            off += split_size
        assert sorted(got) == sorted(_rows(500))


def test_null_codec_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.avro")
        _write(p, 120, codec="null")
        _, codec, _, _ = pyavro.read_header(p)
        assert codec == "null"
        assert list(pyavro.read_blocks(p, 0, os.path.getsize(p))) == _rows(120)


def test_schema_inference_ddl():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.avro")
        _write(p, 5)
        schema, _, _, _ = pyavro.read_header(p)
        assert pyavro.spark_ddl_for(schema) == (
            "id bigint, name string, score double, day date"
        )


def test_rejects_non_avro():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "junk.avro")
        with open(p, "wb") as f:
            f.write(b"PAR1notavro")
        with pytest.raises(ValueError):
            pyavro.read_header(p)


def test_schema_resolution_drop_add_reorder():
    """Reader schema drops 'score', adds 'tag' with a default, and
    reorders — old files resolve by name with wire-level skipping."""
    reader_schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "day", "type": ["null", {"type": "int", "logicalType": "date"}]},
            {"name": "id", "type": ["null", "long"]},
            {"name": "tag", "type": ["null", "string"], "default": "none"},
        ],
    }
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.avro")
        _write(p, 200, block_rows=64)
        got = list(
            pyavro.read_blocks(p, 0, os.path.getsize(p), reader_schema)
        )
        exp = [(r[3], r[0], "none") for r in _rows(200)]
        assert got == exp
        assert pyavro.spark_ddl_for(reader_schema) == "day date, id bigint, tag string"
