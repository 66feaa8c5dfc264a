"""Protocol Buffers wire format in pure Python — the value-level codec
for binary message columns (the Kafka-payload case), implemented from
the public encoding spec (protobuf.dev/programming-guides/encoding).

Spark's built-in ``from_protobuf`` needs the protobuf-java jar plus a
compiled descriptor set; neither is in this container. The wire format
itself is tiny: a message is a sequence of ``(tag, value)`` where
``tag = (field_number << 3) | wire_type``; varints are little-endian
base-128 (LEB128); ``sint*`` fields zigzag; wire types are 0 (varint),
1 (fixed64), 2 (length-delimited), 5 (fixed32). Two proto3 behaviors
are load-bearing and tested:

- **default omission**: zero-valued scalar fields are not serialized;
  the decoder must materialize defaults.
- **unknown-field skipping**: the decoder walks fields it has no
  schema entry for BY WIRE TYPE (forward compatibility) — a decoder
  that cannot skip unknown tags breaks on every schema evolution.

Scale shape: encode/decode are per-row byte work inside Arrow-batched
``mapInPandas`` — embarrassingly parallel, no shuffle. The codec layer
is deliberately schema-light: a field map ``{number: (name, kind)}``
drives decode, mirroring how descriptor-driven decoders work.
"""

from __future__ import annotations

import struct


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    v, shift = 0, 0
    while True:
        if pos >= len(buf):
            raise ValueError("protowire: truncated varint")
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 63:
            raise ValueError("protowire: varint overflow")


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_message(fields: dict[int, tuple[str, object]]) -> bytes:
    """Serialize ``{field_number: (kind, value)}`` in ascending field
    order with proto3 default omission. Kinds: ``int`` (varint),
    ``sint`` (zigzag varint), ``double`` (fixed64), ``string``/
    ``bytes`` (length-delimited), ``fixed32`` (uint32)."""
    out = bytearray()
    for num in sorted(fields):
        kind, v = fields[num]
        if kind == "int":
            if v == 0:
                continue
            out += _uvarint(num << 3) + _uvarint(v & 0xFFFFFFFFFFFFFFFF)
        elif kind == "sint":
            if v == 0:
                continue
            out += _uvarint(num << 3) + _uvarint(_zigzag(v))
        elif kind == "double":
            if v == 0.0:
                continue
            out += _uvarint((num << 3) | 1) + struct.pack("<d", v)
        elif kind in ("string", "bytes"):
            raw = v.encode("utf-8") if kind == "string" else bytes(v)
            if not raw:
                continue
            out += _uvarint((num << 3) | 2) + _uvarint(len(raw)) + raw
        elif kind == "fixed32":
            if v == 0:
                continue
            out += _uvarint((num << 3) | 5) + struct.pack("<I", v)
        else:
            raise NotImplementedError(f"protowire: kind {kind}")
    return bytes(out)


def decode_message(
    buf: bytes, schema: dict[int, tuple[str, str]]
) -> tuple[dict[str, object], int]:
    """Walk the wire format with ``{number: (name, kind)}``; fields not
    in the schema are SKIPPED by wire type. Returns (record with proto3
    defaults for absent fields, count of unknown fields skipped)."""
    defaults = {"int": 0, "sint": 0, "double": 0.0, "string": "", "bytes": b"", "fixed32": 0}
    rec = {name: defaults[kind] for name, kind in schema.values()}
    pos, skipped = 0, 0
    while pos < len(buf):
        tag, pos = _read_uvarint(buf, pos)
        num, wt = tag >> 3, tag & 0x07
        known = schema.get(num)
        if wt == 0:
            raw, pos = _read_uvarint(buf, pos)
        elif wt == 1:
            raw = buf[pos : pos + 8]
            pos += 8
            if len(raw) < 8:
                raise ValueError("protowire: truncated fixed64")
        elif wt == 2:
            ln, pos = _read_uvarint(buf, pos)
            raw = buf[pos : pos + ln]
            pos += ln
            if len(raw) < ln:
                raise ValueError("protowire: truncated length-delimited")
        elif wt == 5:
            raw = buf[pos : pos + 4]
            pos += 4
            if len(raw) < 4:
                raise ValueError("protowire: truncated fixed32")
        else:
            raise ValueError(f"protowire: reserved wire type {wt}")
        if known is None:
            skipped += 1
            continue
        name, kind = known
        if kind == "int":
            if wt != 0:
                raise ValueError("protowire: int must be varint")
            # proto3 int32/int64 put negatives on the wire as the
            # 64-bit two's complement — reinterpret, or encode(-5)
            # decodes to 2^64-5 (encode_message masks with & (2^64-1))
            rec[name] = raw - (1 << 64) if raw >= (1 << 63) else raw
        elif kind == "sint":
            rec[name] = _unzigzag(raw)
        elif kind == "double":
            if wt != 1:
                raise ValueError("protowire: double must be fixed64")
            rec[name] = struct.unpack("<d", raw)[0]
        elif kind == "string":
            rec[name] = raw.decode("utf-8")
        elif kind == "bytes":
            rec[name] = bytes(raw)
        elif kind == "fixed32":
            rec[name] = struct.unpack("<I", raw)[0]
    return rec, skipped
