"""Property-based tests (hypothesis) for the expression library: each
property generates a batch of adversarial strings/numbers and checks
the Spark Column expression against an independent Python model in ONE
job per example set (Spark per-example round-trips would be too slow).

Alphabet note: Java's ``\\s`` is ASCII-only while Python's
``str.split()`` splits on unicode whitespace — a real engine-vs-model
divergence. The text alphabet below therefore includes unicode LETTERS
but only ASCII whitespace; the divergence itself is documented at the
definition site (functions/text.tokens).
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_integration_project_spark.functions.cleaning import (
    cast_default,
    collapse_whitespace,
    digits_only,
    nullify_blank,
)
from data_integration_project_spark.functions.text import char_fold_hash

_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "S"),
        include_characters=" \t",
    ),
    max_size=60,
)

_SETTINGS = dict(max_examples=8, deadline=None)


def _one_job(spark, values, expr_fn):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, s string")
    return {r["i"]: r["out"] for r in df.select("i", expr_fn(F.col("s")).alias("out")).collect()}


@settings(**_SETTINGS)
@given(st.lists(_TEXT, min_size=1, max_size=40))
def test_collapse_whitespace_model(spark, values):
    got = _one_job(spark, values, collapse_whitespace)
    for i, s in enumerate(values):
        # collapse (ASCII \s, Java semantics) then space-only trim
        expected = re.sub(r"[ \t\r\n\x0b\x0c]+", " ", s).strip(" ")
        assert got[i] == expected, (s,)


@settings(**_SETTINGS)
@given(st.lists(_TEXT, min_size=1, max_size=40))
def test_digits_only_model(spark, values):
    got = _one_job(spark, values, digits_only)
    for i, s in enumerate(values):
        assert got[i] == "".join(c for c in s if c in "0123456789"), (s,)


@settings(**_SETTINGS)
@given(st.lists(_TEXT, min_size=1, max_size=40))
def test_nullify_blank_model(spark, values):
    got = _one_job(spark, values, nullify_blank)
    for i, s in enumerate(values):
        # SQL trim strips SPACES only (tabs survive — callers that need
        # full whitespace handling collapse first; see collapse_whitespace)
        t = s.strip(" ")
        assert got[i] == (t if t else None), (s,)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.integers(-10**6, 10**6).map(str),
            st.floats(
                allow_nan=False, allow_infinity=False, width=32, min_value=-1e6, max_value=1e6
            ).map(repr),
            _TEXT,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cast_default_total(spark, values):
    """cast_default never nulls and parses everything float() parses
    that try_cast also accepts; garbage lands on the default."""
    got = _one_job(spark, values, lambda c: cast_default(c, "double", 0.0))
    for i, s in enumerate(values):
        assert got[i] is not None
        try:
            expected = float(s)
        except ValueError:
            expected = 0.0
        # try_cast accepts a subset of float()'s grammar; when it parses,
        # it must agree — when it rejects, the default must appear.
        # NaN needs its own arm: `in` compares by equality and
        # NaN != NaN, so a drawn 'nan' string would flake the test
        # even though the engine's NaN is exactly right (found by the
        # round-8 widened fuzz; the deterministic edge test pins the
        # NaN variants).
        if expected != expected:
            assert got[i] != got[i] or got[i] == 0.0, (s, got[i])
        else:
            assert got[i] in (expected, 0.0), (s, got[i])


def test_cast_default_python_grammar_edges(spark):
    """Deterministic pins for the grammar-gate edge cases the generic
    property can't assert (NaN compares unequal to itself): signed nan
    parses like Python (ADVICE r7 — try_cast alone nulls '-nan'),
    underscore separators strip, Java-suffixed literals fall to the
    default, and the two DOCUMENTED residual narrowings (non-ASCII
    digits, beyond-int64 integers) fall to the default too."""
    import math

    cases = {
        "nan": "nan", "-nan": "nan", "+nan": "nan", "-NaN": "nan",
        "+inf": math.inf, "-infinity": -math.inf, "Infinity": math.inf,
        "1_000.5": 1000.5, "1_0e1_0": 1e11, "-.5": -0.5,
        "1D": 0.0, "2F": 0.0, "1e3d": 0.0, "": 0.0, "x": 0.0,
        "١٢٣": 0.0,  # documented narrowing: non-ASCII digits
    }
    vals = list(cases)
    got = _one_job(spark, vals, lambda c: cast_default(c, "double", 0.0))
    for i, s in enumerate(vals):
        want = cases[s]
        if want == "nan":
            assert got[i] != got[i], (s, got[i])
        else:
            assert got[i] == want, (s, got[i])
    # beyond-int64 integer literal: Python int() parses it, the bigint
    # column can't hold it — documented to fall to the default
    got_int = _one_job(
        spark, ["99999999999999999999", "7", "-1_2"],
        lambda c: cast_default(c, "bigint", 0),
    )
    assert [got_int[i] for i in range(3)] == [0, 7, -12]


@settings(**_SETTINGS)
@given(st.lists(_TEXT, min_size=1, max_size=30))
def test_char_fold_hash_model(spark, values):
    """The portable hash's Python model: fold (acc*31 + codepoint) mod P
    — ``ascii()`` in both engines returns the full codepoint of the
    first character, not just ASCII."""
    got = _one_job(spark, values, char_fold_hash)
    P = 2147483647
    for i, s in enumerate(values):
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % P
        assert got[i] == acc, (s,)


# ---------------------------------------------------------------------------
# Codec roundtrips: every byte string must survive encode->decode for
# the dependency-free PNG (all five filters + DEFLATE) and GIF (LZW)
# implementations — pure Python, no Spark job per example.
# ---------------------------------------------------------------------------

_BYTES = st.binary(min_size=0, max_size=4000)


@settings(max_examples=40, deadline=None)
@given(_BYTES)
def test_png_roundtrip_property(raw):
    from data_integration_project_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    d = decode_png(encode_png(raw))
    n = min(len(raw), 3 * 16 * 64)
    height = max(1, -(-n // 48))
    padded = raw[:n] + b"\x00" * (48 * height - n)
    assert (d["width"], d["height"]) == (16, height)
    assert d["mean_r"] == sum(padded[0::3]) / (16 * height)
    assert d["mean_g"] == sum(padded[1::3]) / (16 * height)
    assert d["mean_b"] == sum(padded[2::3]) / (16 * height)


@settings(max_examples=40, deadline=None)
@given(_BYTES)
def test_gif_lzw_roundtrip_property(raw):
    from data_integration_project_spark.operators.multimodal import (
        _gif_lzw_compress,
        _gif_lzw_decompress,
        decode_gif,
        encode_gif,
    )

    assert _gif_lzw_decompress(_gif_lzw_compress(raw)) == raw
    d = decode_gif(encode_gif(raw))
    n = min(len(raw), 16 * 64)
    height = max(1, -(-n // 16))
    padded = raw[:n] + b"\x00" * (16 * height - n)
    assert (d["width"], d["height"]) == (16, height)
    assert d["mean_r"] == d["mean_g"] == d["mean_b"] == sum(padded) / (16 * height)


@settings(max_examples=40, deadline=None)
@given(_BYTES)
def test_flac_roundtrip_property(raw):
    """Every byte string survives FLAC encode->decode bit-exactly (the
    MD5 check inside decode_flac enforces it; the stats re-derive it)."""
    import struct

    from data_integration_project_spark.operators.multimodal import (
        decode_flac,
        encode_flac,
    )

    d = decode_flac(encode_flac(raw))
    data = raw[:4096]
    data = data[: len(data) - (len(data) & 1)]
    vals = struct.unpack(f"<{len(data) // 2}h", data)
    assert d["n_frames"] == len(vals)
    assert d["sum_abs"] == sum(abs(v) for v in vals)
    assert d["peak_abs"] == max((abs(v) for v in vals), default=0)
    assert d["md5_ok"] == 1


def test_flac_rejects_corruption():
    """A single flipped bit anywhere in a frame must fail CRC/MD5 — the
    decoder cannot emit silently wrong samples."""
    import pytest as _pytest

    from data_integration_project_spark.operators.multimodal import (
        decode_flac,
        encode_flac,
    )

    enc = encode_flac(bytes(range(256)) * 4)
    for where in (50, len(enc) // 2, len(enc) - 3):
        bad = bytearray(enc)
        bad[where] ^= 0x04
        with _pytest.raises((ValueError, NotImplementedError)):
            decode_flac(bytes(bad))


@settings(max_examples=40, deadline=None)
@given(_BYTES)
def test_jpeg_roundtrip_property(raw):
    """Constant-block JPEG (flat q=8) is bit-lossless: exact pixel sums
    and order-weighted checksums for every byte string."""
    from data_integration_project_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    d = decode_jpeg(encode_jpeg(raw))
    data = raw[:256] or b"\x00"
    assert d["n_blocks"] == len(data)
    assert d["sum_pixels"] == 64 * sum(data)
    assert d["dc_checksum"] == sum((i + 1) * b for i, b in enumerate(data))
    assert d["n_restarts"] == (len(data) - 1) // 4


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=256, max_size=256))
def test_jpeg_entropy_layer_exact(pixels):
    """The general lossy path: forward DCT + quantize + full run/size AC
    entropy coding. The entropy layer must be EXACTLY invertible — the
    decoder's quantized coefficient blocks equal the encoder's."""
    from data_integration_project_spark.operators.multimodal import (
        _decode_jpeg_blocks,
        _jpeg_fdct_block,
        _JPEG_ZIGZAG,
        encode_jpeg_raster,
    )

    W, H = 16, 16
    payload = encode_jpeg_raster(pixels, W)
    _, blocks, _ = _decode_jpeg_blocks(payload)
    exp = []
    for by in range(H // 8):
        for bx in range(W // 8):
            block = [pixels[(by * 8 + y) * W + bx * 8 + x] for y in range(8) for x in range(8)]
            coef = _jpeg_fdct_block(block)
            exp.append(
                [
                    (c + 4) // 8 if c >= 0 else -((-c + 4) // 8)
                    for c in (coef[_JPEG_ZIGZAG[k]] for k in range(64))
                ]
            )
    assert blocks == exp


def test_jpeg_rejects_structural_damage():
    """Truncation and marker corruption must raise, not emit pixels."""
    import pytest as _pytest

    from data_integration_project_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    enc = encode_jpeg(bytes(range(200)))
    with _pytest.raises((ValueError, IndexError)):
        decode_jpeg(enc[: len(enc) // 2])
    bad = bytearray(enc)
    bad[0] = 0x00
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-128, 127), min_size=1, max_size=40))
def test_jpeg_constant_scan_byte_identical(dcs):
    """The big-int fast packer for all-constant blocks must emit the
    exact bytes of the general per-bit scan writer (restart markers,
    byte stuffing, 1-bit padding included)."""
    from data_integration_project_spark.operators.multimodal import (
        _jpeg_encode_scan_constant,
        _jpeg_encode_scan_general,
    )

    qblocks = [[dc] + [0] * 63 for dc in dcs]
    assert _jpeg_encode_scan_constant(dcs) == _jpeg_encode_scan_general(qblocks)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-1024, 1024), min_size=64, max_size=64),
        min_size=1,
        max_size=6,
    )
)
def test_jpeg_idct_batch_matches_scalar(blocks):
    """The einsum-batched IDCT must equal the from-spec scalar quadruple
    loop pixel-for-pixel (both round half-to-even after the /4)."""
    import numpy as np

    from data_integration_project_spark.operators.multimodal import (
        _jpeg_idct_batch,
        _jpeg_idct_block,
    )

    # force the general path in the scalar twin (it has a DC-only branch)
    blocks = [b if any(b[1:]) else b[:1] + [1] + b[2:] for b in blocks]
    got = _jpeg_idct_batch(np.asarray(blocks, dtype=np.int64))
    exp = np.asarray([_jpeg_idct_block(b) for b in blocks], dtype=np.int64)
    assert (got == exp).all()


@settings(max_examples=40, deadline=None)
@given(_BYTES)
def test_avi_keyframe_sampling_property(raw):
    """Index-seeked AVI samples match the direct byte formula for every
    input: frame f's image row r is byte[8f+r] (0 past end)."""
    from data_integration_project_spark.operators.multimodal import (
        decode_avi_samples,
        encode_avi,
    )

    data = raw[:2048]
    n = len(data)
    n_frames = max(1, (n + 7) // 8)
    k = min(4, n_frames)
    out = decode_avi_samples(encode_avi(raw))
    assert [d["slot"] for d in out] == list(range(k))
    for d in out:
        f = d["frame_idx"]
        assert f == (d["slot"] * n_frames) // k
        vals = [data[8 * f + r] if 8 * f + r < n else 0 for r in range(8)]
        assert d["frame_sum"] == 24 * sum(vals)
        assert d["row_checksum"] == sum((r + 1) * v for r, v in enumerate(vals))


def test_avi_rejects_broken_index():
    """A corrupted idx1 offset must raise — seeks cannot silently read
    the wrong chunk."""
    import pytest as _pytest

    from data_integration_project_spark.operators.multimodal import (
        decode_avi_samples,
        encode_avi,
    )

    enc = bytearray(encode_avi(bytes(range(100))))
    at = bytes(enc).rfind(b"idx1")
    # entry 0's dwChunkOffset field (ckid 4 + flags 4 bytes in)
    off_pos = at + 8 + 8
    enc[off_pos] ^= 0xFF
    with _pytest.raises(ValueError):
        decode_avi_samples(bytes(enc))


@settings(max_examples=60, deadline=None)
@given(
    st.integers(0, 2**63 - 1),
    st.text(max_size=40),
    st.floats(allow_nan=False, allow_infinity=False),
    st.integers(-(2**62), 2**62),
    st.binary(max_size=32),
)
def test_protowire_roundtrip_property(i, s, d, z, b):
    """Every (varint, string, fixed64, zigzag, bytes) tuple round-trips
    the proto3 wire format exactly, including default omission."""
    from data_integration_project_spark.operators.protowire import (
        decode_message,
        encode_message,
    )

    msg = encode_message(
        {1: ("int", i), 2: ("string", s), 3: ("double", d), 4: ("sint", z), 6: ("bytes", b)}
    )
    schema = {
        1: ("i", "int"), 2: ("s", "string"), 3: ("d", "double"),
        4: ("z", "sint"), 6: ("b", "bytes"),
    }
    rec, skipped = decode_message(msg, schema)
    assert skipped == 0
    assert rec["i"] == i and rec["s"] == s and rec["z"] == z and rec["b"] == b
    # 0.0 and -0.0 both omit (proto3 default); else bit-exact
    if d == 0.0:
        assert rec["d"] == 0.0
    else:
        import struct as _st

        assert _st.pack("<d", rec["d"]) == _st.pack("<d", d)


def test_protowire_truncation_raises():
    import pytest as _pytest

    from data_integration_project_spark.operators.protowire import (
        decode_message,
        encode_message,
    )

    msg = encode_message({1: ("int", 300), 2: ("string", "hello"), 3: ("double", 1.5)})
    schema = {1: ("i", "int"), 2: ("s", "string"), 3: ("d", "double")}
    for cut in range(1, len(msg)):
        try:
            decode_message(msg[:cut], schema)
        except ValueError:
            continue  # truncation detected — good
        rec, _ = decode_message(msg[:cut], schema)  # or decoded a clean prefix
        assert rec["i"] in (0, 300)
    with _pytest.raises(ValueError):
        decode_message(b"\x07", schema)  # reserved wire type 7


def test_warc_framing_roundtrip_and_errors():
    """The WARC reader must honor Content-Length exactly: a clean pair
    round-trips; any truncation, a corrupted length, or a missing
    record terminator raises instead of drifting."""
    import pytest

    from data_integration_project_spark.operators.warc import (
        encode_warc_pair,
        parse_warc,
    )

    body = "hello warc é\r\nwith crlf inside".encode()
    buf = encode_warc_pair(42, body)
    recs = parse_warc(buf)
    assert [r["type"] for r in recs] == ["request", "response"]
    assert recs[1]["body"] == body
    assert recs[1]["uri"] == "http://example.com/42"

    # truncated mid-body
    with pytest.raises(ValueError):
        parse_warc(buf[:-10])
    # corrupt the Content-Length digit of the response record
    at = buf.rindex(b"Content-Length: ")
    bad = bytearray(buf)
    bad[at + len(b"Content-Length: ")] = ord("9")
    with pytest.raises(ValueError):
        parse_warc(bytes(bad))
    # clobber the record terminator
    bad2 = bytearray(buf)
    bad2[-1] = ord("X")
    with pytest.raises(ValueError):
        parse_warc(bytes(bad2))
    # concatenation of many pairs parses record-by-record
    many = b"".join(encode_warc_pair(i, f"doc {i}".encode()) for i in range(5))
    assert len(parse_warc(many)) == 10


def _jpeg_qblocks_payload(qblocks):
    from data_integration_project_spark.operators.multimodal import (
        _jpeg_container,
        _jpeg_encode_scan,
    )

    return _jpeg_container(_jpeg_encode_scan(qblocks), 8, 8 * len(qblocks))


def _jpeg_expected_stats(qblocks):
    """Reference pixel stats from the SCALAR from-spec IDCT — what
    decode_jpeg's einsum path must reproduce exactly."""
    from data_integration_project_spark.operators.multimodal import (
        _JPEG_Q,
        _JPEG_ZIGZAG,
        _jpeg_idct_block,
    )

    sums, means = [], []
    for zz in qblocks:
        deq = [c * _JPEG_Q for c in zz]
        raster = [0] * 64
        for k in range(64):
            raster[_JPEG_ZIGZAG[k]] = deq[k]
        px = _jpeg_idct_block(raster)
        s = sum(px)
        sums.append(s)
        # decode_jpeg: DC-only means are the exact constant, AC means s//64
        means.append(px[0] if not any(raster[1:]) else s // 64)
    return (
        sum(sums),
        sum((i + 1) * m for i, m in enumerate(means)),
    )


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-255, 255),  # DC
            st.lists(  # sparse nonzero ACs at random zigzag slots
                st.tuples(
                    st.integers(1, 63),
                    st.integers(-300, 300).filter(lambda v: v != 0),
                ),
                max_size=6,
            ),
        ),
        min_size=1,
        max_size=11,  # > 2×DRI: restart resync with AC blocks present
    )
)
def test_jpeg_general_coefficient_roundtrip(spec):
    """The last untested quadrant of the JPEG codec (VERDICT r4 item
    8): GENERAL coefficient blocks — nonzero ACs, ZRL runs, EOB-less
    blocks, restart boundaries with live AC state — must (a) entropy
    round-trip to the exact quantized coefficients and (b) produce
    einsum-IDCT pixel stats equal to the scalar from-spec reference
    through the REAL decode_jpeg path."""
    from data_integration_project_spark.operators.multimodal import (
        _JPEG_DRI,
        _decode_jpeg_blocks,
        decode_jpeg,
    )

    qblocks = []
    for dc, acs in spec:
        zz = [0] * 64
        zz[0] = dc
        for pos, val in acs:
            zz[pos] = val
        qblocks.append(zz)
    payload = _jpeg_qblocks_payload(qblocks)
    _, blocks, restarts = _decode_jpeg_blocks(payload)
    assert blocks == qblocks
    assert restarts == (len(qblocks) - 1) // _JPEG_DRI
    d = decode_jpeg(payload)
    exp_sum, exp_checksum = _jpeg_expected_stats(qblocks)
    assert d["n_blocks"] == len(qblocks)
    assert d["sum_pixels"] == exp_sum
    assert d["dc_checksum"] == exp_checksum


def test_jpeg_general_coefficient_adversarial_shapes():
    """Deterministic worst cases the fuzz above may not always draw:
    a 16-zero run (ZRL), a 32-zero run (double ZRL), a nonzero at
    slot 63 (no EOB emitted), an all-zero block between AC blocks,
    and a mixed stream crossing two restart boundaries."""
    from data_integration_project_spark.operators.multimodal import (
        _decode_jpeg_blocks,
        decode_jpeg,
    )

    zrl = [10] + [0] * 16 + [7] + [0] * 46
    zrl2 = [-3] + [0] * 32 + [-1] + [0] * 30
    tail63 = [0] * 63 + [5]
    allzero = [0] * 64
    dense = [1] * 64
    qblocks = [zrl, allzero, zrl2, tail63, dense] * 2  # 10 blocks, 2 restarts
    payload = _jpeg_qblocks_payload(qblocks)
    _, blocks, restarts = _decode_jpeg_blocks(payload)
    assert blocks == qblocks
    assert restarts == 2
    d = decode_jpeg(payload)
    exp_sum, exp_checksum = _jpeg_expected_stats(qblocks)
    assert d["sum_pixels"] == exp_sum
    assert d["dc_checksum"] == exp_checksum


# ---------------------------------------------------------------------------
# corpus_curriculum_phases: the arithmetic NTILE reproduction
# ---------------------------------------------------------------------------


@given(st.integers(min_value=1, max_value=500), st.integers(min_value=1, max_value=8))
@settings(max_examples=60, deadline=None)
def test_arithmetic_ntile_matches_duckdb(n, k):
    """The sort-free NTILE formula used by corpus_curriculum_phases
    (histogram-rank decomposition; plans/corpus_q.py) must reproduce
    SQL NTILE(k) for EVERY (n, k), including the remainder split where
    the first (n % k) buckets get one extra row. Checked against
    DuckDB's ntile directly — the same engine the query's oracle runs
    on — in pure Python (no Spark session needed)."""
    import duckdb

    expected = [
        r[0]
        for r in duckdb.sql(
            f"SELECT ntile({k}) OVER (ORDER BY i) FROM range({n}) t(i) ORDER BY i"
        ).fetchall()
    ]
    size_big = (n + k - 1) // k
    n_big = n % k
    cut = n_big * size_big
    size_small = max(n // k, 1)
    got = [
        (rank - 1) // size_big + 1
        if rank <= cut
        else n_big + (rank - 1 - cut) // size_small + 1
        for rank in range(1, n + 1)
    ]
    assert got == expected, (n, k, got[:20], expected[:20])
