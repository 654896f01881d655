"""Zstandard (RFC 8878) codec vs the official zstd-jni implementation.

zstdcodec.py implements the full RFC 8878 decompression grammar plus
an encoder (chain-and-lazy LZ77, Huffman literals with direct or
FSE-coded weights, predefined-FSE sequences, raw/RLE store fallback)
in pure Python; Spark's classpath ships zstd-jni
(used for shuffle/parquet compression), so the cross-implementation
tests run BOTH directions against ``com.github.luben.zstd.Zstd`` via
py4j — the same standard snappycodec/avrocodec are held to. Reference
frames at levels 1/3/9/19/22 exercise every literals mode (raw, RLE, Huffman
1/4-stream, treeless), every sequence-table mode (predefined, RLE,
FSE-compressed, repeat), repeat offsets, and xxh64 content checksums.
"""

from __future__ import annotations

import os
import random

import pytest

from flexcalc_spark.sources import zstdcodec as zc


def _cases() -> dict[str, bytes]:
    rng = random.Random(7)
    return {
        "text": b"the quick brown fox jumps over the lazy dog. " * 4000,
        "json": b'{"user": 123, "event": "click", "value": 4.5}\n' * 3000,
        "rand": random.Random(11).randbytes(100_000),
        "zeros": b"\x00" * 200_000,
        "lowent": bytes(rng.choices(b"ab", k=120_000)),
        "mixed": (random.Random(5).randbytes(5_000) + b"A" * 50_000
                  + random.Random(6).randbytes(5_000) + b"pattern" * 8000),
        "short": b"abc",
        "one": b"x",
        "empty": b"",
        "utf": "héllo wörld ünïcode ".encode() * 6000,
        # few-match ASCII: exercises the encoder's Huffman-literals
        # path (and the decoder's 4-stream read of our own frames)
        "ascii_nomatch": bytes(rng.choices(b"abcdefgh", k=80_000)),
        "skewed": bytes(rng.choices(
            b"aaaaaaaaaaaaaaaabcdefghijklmnopqrstuvwxyz0123", k=90_000)),
        # high-byte alphabets (highest literal > 128): the encoder must
        # emit FSE-COMPRESSED Huffman weights (direct 4-bit form caps
        # at 128 weight positions) — the UTF-8 corpus shape
        "cyrillic": _cyrillic_text(),
        "high_bytes": bytes(random.Random(13).choices(
            bytes(range(120, 250)), k=80_000)),
    }


def _cyrillic_text() -> bytes:
    r = random.Random(9)
    return "".join(
        chr(0x430 + r.randrange(32)) if i % 7 else " "
        for i in range(40_000)
    ).encode("utf-8")


def test_xxh64_spec_vector():
    # the published XXH64 test vector; non-empty inputs are pinned by
    # every checksummed frame in the JNI tests below
    assert zc.xxh64(b"") == 0xEF46DB3751D8E999
    assert zc.xxh64(b"", seed=1) != zc.xxh64(b"")


def test_encoder_roundtrip():
    for name, c in _cases().items():
        for checksum in (True, False):
            assert zc.decompress(zc.compress(c, checksum=checksum)) == c, (
                name, checksum)
        assert zc.decompress(zc.compress(c, store=True)) == c, name


def test_encoder_actually_compresses():
    c = b'{"user": 123, "event": "click", "value": 4.5}\n' * 3000
    z = zc.compress(c)
    assert len(z) < len(c) // 2
    # store mode must NOT entropy-code (raw/RLE blocks only)
    assert len(zc.compress(c, store=True)) > len(c)
    # incompressible input falls back to raw blocks (no expansion
    # beyond the fixed frame overhead)
    r = _cases()["rand"]
    assert len(zc.compress(r)) <= len(r) + 64


def test_multiblock_and_rle():
    # > 128 KiB forces multiple blocks; a constant chunk takes the RLE
    # block path (4 bytes instead of 128K)
    c = b"\x07" * 300_000
    z = zc.compress(c)
    assert len(z) < 64
    assert zc.decompress(z) == c
    c2 = os.urandom(200_000)
    assert zc.decompress(zc.compress(c2)) == c2


def test_multi_frame_and_skippable():
    a, b = b"hello ", b"world"
    skippable = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(
        4, "little") + b"xyz"
    data = zc.compress(a) + skippable + zc.compress(b)
    assert zc.decompress(data) == a + b


def test_known_reference_frames_decode():
    """Byte-pinned zstd-jni level-3 frames (captured once) so the
    decoder's sequence/FSE/repeat-offset paths are exercised without a
    JVM — the Java test below regenerates these live."""
    for hexs, want in [
        ("28b52ffd60e8024d00001000000100e32b8005", b"\x00" * 1000),
        ("28b52ffd6058014d0000106162010053aa1c16", b"ab" * 300),
        ("28b52ffd603001ad0000707b2275736572223a203132337d0a01001fa29a4a",
         b'{"user": 123}\n' * 40),
    ]:
        assert zc.decompress(bytes.fromhex(hexs)) == want


def test_corrupt_raises():
    good = zc.compress(b"hello world " * 100)
    with pytest.raises(ValueError):
        zc.decompress(good[:-3])  # truncated
    with pytest.raises(ValueError):
        zc.decompress(b"\x00\x00\x00\x00" + good[4:])  # bad magic
    with pytest.raises(ValueError):
        zc.decompress(b"")
    # checksum mismatch: flip a content byte inside a checksummed frame
    framed = bytearray(zc.compress(b"payload-bytes-here"))
    framed[-6] ^= 0xFF
    with pytest.raises(ValueError):
        zc.decompress(bytes(framed))
    # dictionary id refused (typed boundary, not silence)
    with_dict = bytearray(zc.compress(b"x"))
    with_dict[4] |= 1  # Dictionary_ID_flag = 1
    with_dict.insert(5, 7)  # nonzero 1-byte dict id (before the FCS byte)
    with pytest.raises(ValueError):
        zc.decompress(bytes(with_dict))


def test_java_cross_implementation(spark):
    """Both directions vs the official implementation, all levels."""
    Z = spark._jvm.com.github.luben.zstd.Zstd
    cases = _cases()
    for lvl in (1, 3, 9, 19, 22):
        for name, c in cases.items():
            if not c:
                continue
            jc = bytes(Z.compress(bytearray(c), lvl))
            assert zc.decompress(jc) == c, (lvl, name)
    for name, c in cases.items():
        if not c:
            continue
        for kw in ({}, {"store": True}, {"level": 1}):
            got = bytes(Z.decompress(bytearray(zc.compress(c, **kw)),
                                     len(c)))
            assert got == c, (name, kw)
    # long-offset and >64K-match shapes the mixed cases may not hit
    for c in (bytes(random.Random(3).randbytes(50)) * 4000,
              b"X" * 70_000 + b"Y" + b"X" * 70_000):
        assert bytes(Z.decompress(bytearray(zc.compress(c)), len(c))) == c


def test_java_checksummed_frames(spark):
    """Reference frames WITH content checksums: decoding them verifies
    our xxh64 against the reference's on real payloads (and the
    reference verifies ours on every store-mode frame, which always
    carries a checksum)."""
    ctx = spark._jvm.com.github.luben.zstd.ZstdCompressCtx()
    ctx.setLevel(3)
    ctx.setChecksum(True)
    for name, c in _cases().items():
        if not c:
            continue
        jc = bytes(ctx.compress(bytearray(c)))
        assert zc.decompress(jc) == c, name


def test_large_frame_uses_bounded_window(spark):
    """Frames past 1 MiB must declare a 128 KiB window descriptor, not
    Single_Segment (whose implied window = content size would exceed
    default decoder window limits at real shard sizes -- r11 review
    finding). Pinned structurally AND by the reference decoder."""
    data = (b"some log line with request id 12345 and a payload\n"
            * 40_000)  # ~2 MB
    framed = zc.compress(data)
    fhd = framed[4]
    assert (fhd >> 5) & 1 == 0  # Single_Segment off
    assert framed[5] == 7 << 3  # window descriptor: 2^17 = 128 KiB
    assert zc.decompress(framed) == data
    Z = spark._jvm.com.github.luben.zstd.Zstd
    assert bytes(Z.decompress(bytearray(framed), len(data))) == data
    small = zc.compress(b"tiny")
    assert (small[4] >> 5) & 1 == 1  # small frames stay Single_Segment


def test_multiblock_rep_history_carries_across_blocks():
    """The repeat-offset history is per FRAME, not per block (RFC 8878
    §3.1.1.5): an encoder that reset it per block emitted rep codes
    that decode to wrong offsets in block 2+ of varied multi-block
    input (r11 review finding; silent corruption with checksum=False).
    This corpus reproduces the failure shape: ~540 KB / 5 blocks of
    varied JSONL."""
    import json

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa", "request", "response",
             "click", "view", "purchase"]
    rows = [json.dumps({
        "id": i, "user": rng.randrange(10_000),
        "event": rng.choice(words),
        "msg": " ".join(rng.choices(words, k=rng.randrange(3, 18))),
        "value": rng.randrange(10**6) / 100,
    }, sort_keys=True) for i in range(4000)]
    payload = ("\n".join(rows) + "\n").encode()
    assert len(payload) > 4 * 128 * 1024  # genuinely multi-block
    for lvl in (1, 3):
        for checksum in (True, False):
            z = zc.compress(payload, checksum=checksum, level=lvl)
            assert zc.decompress(z) == payload, (lvl, checksum)


def test_roundtrip_property_fuzz():
    """Hypothesis-style structured fuzz without the JVM: random
    payloads across the encoder's structural breakpoints (empty /
    sub-min-match / single-block / exactly-one-block / multi-block /
    RLE runs / high-byte alphabets), both levels, both checksum
    settings — every frame must round-trip through our decoder."""
    rng = random.Random(0xC0DEC)
    sizes = [0, 1, 3, 4, 5, 63, 64, 1023, 1024,
             128 * 1024 - 1, 128 * 1024, 128 * 1024 + 1, 300_001]
    alphabets = [bytes([7]), b"ab", b"abcdefgh",
                 bytes(range(256)), bytes(range(128, 256))]
    for size in sizes:
        for alpha in alphabets:
            payload = bytes(rng.choices(alpha, k=size))
            for lvl in (1, 3):
                for checksum in (True, False):
                    z = zc.compress(payload, level=lvl,
                                    checksum=checksum)
                    assert zc.decompress(z) == payload, (
                        size, alpha[:4], lvl, checksum)


def test_corruption_fuzz_raises_only_valueerror():
    """The repo-wide codec contract: corrupt bytes raise ValueError so
    upstream readers can degrade PER ROW — an IndexError/KeyError
    leaking from any decode path breaks that silently (the r10 'leak
    through the ValueError contract' class). Deterministic sweep:
    truncations, bit flips, and byte edits over frames that exercise
    every block/literals/sequence shape; each mutation must either
    decode (a mutation may land in an ignored field) or raise
    ValueError specifically."""
    rng = random.Random(0xFADE)
    bases = [
        zc.compress(b'{"user": 123, "event": "click"}\n' * 2000),  # LZ
        zc.compress(bytes(rng.choices(b"abcdefgh", k=40_000))),  # Huffman
        zc.compress(bytes(rng.choices(bytes(range(128, 250)),
                                      k=40_000))),  # FSE weights
        zc.compress(random.Random(1).randbytes(10_000)),  # raw blocks
        zc.compress(b"\x07" * 50_000),  # RLE block
        # pinned reference frame (predefined sequence tables)
        bytes.fromhex("28b52ffd60e8024d00001000000100e32b8005"),
    ]
    checked = 0
    for base in bases:
        for _ in range(120):
            mutated = bytearray(base)
            op = rng.randrange(3)
            if op == 0 and len(mutated) > 8:  # truncate
                del mutated[rng.randrange(4, len(mutated)):]
            elif op == 1:  # bit flip
                mutated[rng.randrange(len(mutated))] ^= 1 << rng.randrange(8)
            else:  # byte overwrite
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
            try:
                zc.decompress(bytes(mutated))
            except ValueError:
                pass  # the contract
            except AssertionError:
                raise
            # any OTHER exception type propagates and fails the test
            checked += 1
    assert checked == len(bases) * 120


def _frame_header(fcs_flag: int, window_desc: int | None,
                  fcs_bytes: bytes) -> bytearray:
    """Hand-build a non-single-segment frame header (no checksum)."""
    out = bytearray(zc.ZSTD_MAGIC.to_bytes(4, "little"))
    out.append(fcs_flag << 6)
    if window_desc is not None:
        out.append(window_desc)
    out += fcs_bytes
    return out


def _rle_block(size: int, byte: int, last: bool) -> bytes:
    return ((size << 3) | (1 << 1) | (1 if last else 0)).to_bytes(
        3, "little") + bytes([byte])


def test_output_bound_enforced_during_decode():
    """ADVICE r11: decompress() must cap output DURING block decode —
    a crafted frame of chained RLE blocks otherwise expands ~32768:1
    before any frame-end check fires (measured 806 B -> 25 MiB)."""
    # (a) declared window 1 KiB (wd=0) but an RLE block regenerating
    # 128 KiB violates Block_Maximum_Size = min(window, 128 KiB)
    attack = _frame_header(0, 0x00, b"")
    for i in range(200):
        attack += _rle_block(131072, 0x41, last=(i == 199))
    with pytest.raises(ValueError, match="Block_Maximum_Size"):
        zc.decompress(bytes(attack))
    # (b) max window: a raw block claiming > 128 KiB is still corrupt
    big_raw = _frame_header(0, 0xFF, b"")
    big_raw += ((131073 << 3) | 1).to_bytes(3, "little") + b"\x00" * 131073
    with pytest.raises(ValueError, match="Block_Maximum_Size"):
        zc.decompress(bytes(big_raw))
    # (c) output passing the declared FCS raises at the offending
    # block, not at frame end: fcs_flag=1 declares 256 bytes but the
    # chained RLE blocks regenerate 128 KiB each
    lying = _frame_header(1, 0xFF, (0).to_bytes(2, "little"))  # fcs=256
    for i in range(50):
        lying += _rle_block(131072, 0x42, last=(i == 49))
    with pytest.raises(ValueError, match="declared frame content size"):
        zc.decompress(bytes(lying))
    # legitimate highly-compressible frames still decode (multi-block
    # RLE path, 300 KiB from < 64 bytes)
    c = b"\x07" * 300_000
    assert zc.decompress(zc.compress(c)) == c


def test_ncount_writer_rejects_unnormalized_counts():
    """ADVICE r11: the normalized-counts precondition (violation =
    infinite loop) must survive python -O — ValueError, not assert."""
    with pytest.raises(ValueError, match="normalized"):
        zc._fse_write_ncount([3, 2, 1], 5)  # sums to 6, not 32


def _bomb_compressed_block(n_seq: int, last: bool) -> bytes:
    """A format-valid btype=2 block that regenerates ~65.5 KiB PER
    SEQUENCE from ~2 bytes of input each: empty raw literals, RLE
    sequence tables (0-bit state updates) with ll=0 / of_code=0
    (repeat-offset) / ML code 52 (base 65539, 16 extra bits, supplied
    as zeros in the backward bitstream)."""
    assert n_seq < 128
    body = bytearray()
    body.append(0x00)               # literals: raw, regenerated size 0
    body.append(n_seq)              # sequences count, 1-byte form
    body.append(0x54)               # scm: RLE mode for ll / of / ml
    body += bytes([0, 0, 52])       # RLE symbols: ll=0, of=0, ml=52
    body += b"\x00" * (2 * n_seq)   # 16 ml extra bits per sequence
    body.append(0x01)               # backward-bitstream sentinel
    return ((len(body) << 3) | (2 << 1) | (1 if last else 0)).to_bytes(
        3, "little") + bytes(body)


def test_compressed_block_bomb_capped_mid_decode():
    """ADVICE r12 (high): the output caps fired only BETWEEN blocks —
    _decode_block's sequence loop appended matches unbounded, so one
    <=128 KiB compressed block could regenerate ~8.5 GB before any
    check (verified PoC: 3 KB in -> 136 MB materialized). The limit
    must be enforced INSIDE the per-sequence loop: this frame's single
    compressed block would regenerate ~8.3 MB (127 seqs x 65539 B)
    against a 128 KiB Block_Maximum_Size, and must raise mid-decode
    at the offending sequence (the pre-fix code decodes everything and
    raises the post-hoc 'regenerates past' error instead)."""
    frame = _frame_header(0, 0xFF, b"")        # no FCS, max window
    frame += _rle_block(1000, 0x41, last=False)  # history for offsets
    frame += _bomb_compressed_block(127, last=True)
    with pytest.raises(ValueError, match="mid-decode"):
        zc.decompress(bytes(frame))
    # caller max_output binds tighter than Block_Maximum_Size when
    # smaller: same bomb, cap of 10 KB -> still the mid-decode error
    with pytest.raises(ValueError, match="mid-decode"):
        zc.decompress(bytes(frame), max_output=10_000)


def test_no_fcs_frame_bounded_by_caller_max_output():
    """A no-FCS streaming frame is format-legal at ~32768x expansion —
    untrusted-bytes callers pass max_output for a hard mid-decode
    ceiling (the jsonl.zst and Avro readers do)."""
    frame = _frame_header(0, 0xFF, b"")      # fcs_flag=0: no FCS field
    for i in range(1000):
        frame += _rle_block(100, 0x58, last=(i == 999))
    # uncapped: legal, decodes to 100 KB
    assert zc.decompress(bytes(frame)) == b"\x58" * 100_000
    # capped: fails at the offending block, not after full expansion
    with pytest.raises(ValueError, match="max_output"):
        zc.decompress(bytes(frame), max_output=50_000)
    # FCS-bearing frames are capped by their declaration even when the
    # caller bound is looser
    assert zc.decompress(zc.compress(b"ok" * 50), max_output=1 << 20) \
        == b"ok" * 50
