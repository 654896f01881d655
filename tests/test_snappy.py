"""Raw snappy block codec vs the official snappy-java implementation.

snappycodec.py implements the public snappy format description in pure
Python; Spark's classpath ships snappy-java (used for shuffle
compression), so the cross-implementation tests compress/decompress in
BOTH directions against ``org.xerial.snappy.Snappy`` via py4j.
"""

from __future__ import annotations

import os
import random

import pytest

from flexcalc_spark.sources import snappycodec as sn


def _cases() -> list[bytes]:
    rng = random.Random(42)
    return [
        b"",
        b"a",
        b"abc",  # below the 4-byte match minimum
        b"abcd" * 100,
        bytes(range(256)) * 300,
        b"the quick brown fox " * 5000,  # > 64 KiB, compressible
        os.urandom(200_000),  # incompressible, multi-fragment
        b"\x00" * 100_000,  # maximal overlapping copies
        bytes(rng.choices(b"abc", k=150_000)),
    ]


def test_roundtrip_all_cases():
    for i, c in enumerate(_cases()):
        z = sn.compress(c)
        assert sn.decompress(z) == c, i


def test_compression_actually_compresses():
    c = b"the quick brown fox " * 5000
    assert len(sn.compress(c)) < len(c) // 10


def test_one_byte_offset_and_four_byte_literal_decode():
    """Our compressor only emits 2-byte-offset copies and short
    literals; the reference can emit 1-byte-offset copies and 2-4-byte
    literal lengths — hand-craft those forms so the decoder's full
    surface is pinned without Java."""
    # literal "ab", then copy len=5 off=2 with a 1-byte offset tag
    body = bytes([1 << 2]) + b"ab" + bytes([((5 - 4) << 2) | 1 | (0 << 5), 2])
    data = sn._varint_encode(7) + body
    assert sn.decompress(data) == b"abababa"
    # a 70000-byte literal needs a 3-byte (tag 62) length encoding
    lit = os.urandom(70_000)
    data = sn._varint_encode(len(lit)) + bytes([62 << 2]) + (
        len(lit) - 1
    ).to_bytes(3, "little") + lit
    assert sn.decompress(data) == lit


def test_corrupt_raises():
    good = sn.compress(b"hello world " * 100)
    with pytest.raises(ValueError):
        sn.decompress(good[:-3])  # truncated
    with pytest.raises(ValueError):
        # preamble length lie
        sn.decompress(sn._varint_encode(999) + good[1:])
    with pytest.raises(ValueError):
        # copy offset beyond output start
        sn.decompress(sn._varint_encode(4) + bytes([((4 - 4) << 2) | 1, 9]))


def test_java_cross_implementation(spark):
    S = spark._jvm.org.xerial.snappy.Snappy
    for i, c in enumerate(_cases()):
        if not c:
            continue  # snappy-java rejects empty input arrays
        assert bytes(S.uncompress(bytearray(sn.compress(c)))) == c, i
        assert sn.decompress(bytes(S.compress(bytearray(c)))) == c, i


def test_corruption_fuzz_raises_only_valueerror():
    """Parity with the zstd/avro/warc mutation sweeps: every
    truncation, bit flip, or byte edit must either decode or raise
    ValueError — never an untyped slice/index error."""
    rng = random.Random(0xEE)
    base = sn.compress(b"the quick brown fox " * 3000)
    for _ in range(300):
        m = bytearray(base)
        op = rng.randrange(3)
        if op == 0 and len(m) > 4:
            del m[rng.randrange(2, len(m)):]
        elif op == 1:
            m[rng.randrange(len(m))] ^= 1 << rng.randrange(8)
        else:
            m[rng.randrange(len(m))] = rng.randrange(256)
        try:
            sn.decompress(bytes(m))
        except ValueError:
            pass  # the contract
        # any OTHER exception type propagates and fails the test


def test_output_capped_at_declared_length_mid_decode():
    """Same posture as the zstd decoder (ADVICE r11 class): output past
    the length preamble must fail at the offending op, not after the
    whole stream expands."""
    # preamble says 4 bytes, first literal already emits 10, and a
    # second op follows so the mid-decode check (not the frame-end
    # equality check) is what fires
    crafted = sn._varint_encode(4)
    crafted += bytes([(10 - 1) << 2]) + b"ABCDEFGHIJ"   # literal(10)
    crafted += bytes([0 << 2]) + b"Z"                    # literal(1)
    with pytest.raises(ValueError, match="exceeds declared length"):
        sn.decompress(crafted)
