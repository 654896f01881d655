"""Baseline-JPEG codec tests.

Test-only ENCODER below, same epistemic contract as the TIFF LZW pair
(tests/test_sources.py): the container ships no reference JPEG library,
so the encoder is derived to stay in lockstep with the decoder
(flexcalc_spark/sources/jpegcodec.py) and the round-trips cross every
structural feature — gray + YCbCr, 4:4:4 / 4:2:2 / 4:2:0 sampling,
restart intervals, odd (non-multiple-of-8) dimensions, 8- and 16-bit
DQT precision, 0xFF byte stuffing. Shared-constant mistakes that a
self-consistent pair could hide (a wrong zigzag permutation inverts
itself; a transposed DCT basis cancels) are pinned separately against
INDEPENDENT constructions of the published definitions: zigzag by
anti-diagonal walk, the DCT-II basis by direct cosine evaluation and
orthonormality, huffman by the T.81 Annex C canonical recurrence.

The DC huffman tables are the T.81 Annex K typicals; the AC tables are
test-local valid canonical tables (all-8-bit and a multi-length
variant) — any compliant decoder reads tables from the DHT segment, so
the emitted files do not depend on Annex K AC transcription.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flexcalc_spark.sources import binaryfiles as bf
from flexcalc_spark.sources import jpegcodec as jc

# ---------------------------------------------------------------------------
# Shared constants pinned against independent constructions
# ---------------------------------------------------------------------------


def test_zigzag_matches_antidiagonal_walk():
    """Rebuild the zigzag order from its definition (walk anti-diagonals
    d = r+c in alternating direction) and compare element-wise."""
    order = []
    for d in range(15):
        rc = [(r, d - r) for r in range(8) if 0 <= d - r < 8]
        if d % 2 == 0:
            rc = rc[::-1]               # even diagonals run bottom-left->up
        order.extend(r * 8 + c for r, c in rc)
    assert order == jc.ZIGZAG
    assert sorted(jc.ZIGZAG) == list(range(64))


def test_dct_basis_is_orthonormal_and_matches_cosine():
    c = jc.dct_basis()
    assert np.allclose(c @ c.T, np.eye(8), atol=1e-12)
    # spot-check the defining formula at a few (u, x)
    for u, x in [(0, 0), (1, 0), (3, 5), (7, 7)]:
        alpha = np.sqrt(0.125) if u == 0 else 0.5
        assert c[u, x] == pytest.approx(
            alpha * np.cos((2 * x + 1) * u * np.pi / 16.0), abs=1e-15
        )


def test_huffman_canonical_recurrence():
    """build_huffman must implement Annex C: codes of one length are
    consecutive integers; moving up a length doubles the next code."""
    bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]  # Annex K DC
    vals = list(range(12))
    t = jc.build_huffman(bits, vals)
    codes = sorted((l, c) for (l, c) in t)
    # independent reconstruction
    expect, code = [], 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            expect.append((length, code))
            code += 1
        code <<= 1
    assert codes == sorted(expect)
    # prefix-free: no code is a prefix of a longer one
    for (l1, c1) in t:
        for (l2, c2) in t:
            if l1 < l2:
                assert (c2 >> (l2 - l1)) != c1


# ---------------------------------------------------------------------------
# Test-only encoder
# ---------------------------------------------------------------------------

# T.81 Annex K base quantization tables (natural row-major order).
QL_BASE = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QC_BASE = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, dtype=np.int64)

# Annex K typical DC tables (categories 0..11).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# All 162 baseline AC symbols: EOB, ZRL, and (run<<4 | size).
AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
# Test-local valid canonical AC tables (see module docstring).
AC_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
AC_MULTI_BITS = [0, 0, 2, 0, 6, 0, 26, 0, 128, 0, 0, 0, 0, 0, 0, 0]

# 12-bit (extended sequential / progressive) tables: DC categories run
# to 15 and AC sizes to 14 (T.81 F.1.2.1/F.1.2.2 for 12-bit source
# precision) — 226 AC symbols, still a valid all-8-bit canonical table.
DC12_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0]
DC12_VALS = list(range(16))
AC12_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 15)
]
AC12_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0]


def _encode_table(bits, vals):
    """{symbol: (code, length)} by the same canonical recurrence."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_tables(quality: int):
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((QL_BASE * scale + 50) // 100, 1, 255)
    qc = np.clip((QC_BASE * scale + 50) // 100, 1, 255)
    return ql, qc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)        # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.put(1, 1)                       # pad with 1-bits


def _fdct_quant(
    block: np.ndarray, q_nat: np.ndarray, shift: float = 128.0
) -> np.ndarray:
    """Level shift, forward DCT, quantize, zigzag-scan one 8x8 block."""
    c = jc.dct_basis()
    coef = c @ (block.astype(np.float64) - shift) @ c.T
    qn = np.round(coef / q_nat.reshape(8, 8)).astype(np.int64).ravel()
    return qn[jc.ZIGZAG]                          # natural -> scan order


def _put_block(w, scan_blk, pred, dc_tab, ac_tab):
    diff = int(scan_blk[0]) - pred
    s = int(abs(diff)).bit_length()
    code, length = dc_tab[s]
    w.put(code, length)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(scan_blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_tab[0xF0]
            w.put(zc, zl)
            run -= 16
        s = int(abs(v)).bit_length()
        code, length = ac_tab[(run << 4) | s]
        w.put(code, length)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ec, el = ac_tab[0x00]
        w.put(ec, el)
    return int(scan_blk[0])


def _pad_to(img: np.ndarray, ph: int, pw: int) -> np.ndarray:
    return np.pad(
        img, ((0, ph - img.shape[0]), (0, pw - img.shape[1])), mode="edge"
    )


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt(tid: int, q_nat: np.ndarray, wide: bool) -> bytes:
    q_scan = q_nat[jc.ZIGZAG]
    if wide:
        return _seg(0xDB, bytes([0x10 | tid])
                    + q_scan.astype(">u2").tobytes())
    return _seg(0xDB, bytes([tid]) + q_scan.astype(np.uint8).tobytes())


def _dht(tclass: int, tid: int, bits, vals) -> bytes:
    return _seg(0xC4, bytes([(tclass << 4) | tid]) + bytes(bits)
                + bytes(vals))


def encode_jpeg(
    y: np.ndarray,
    cb: np.ndarray | None = None,
    cr: np.ndarray | None = None,
    quality: int = 85,
    sampling: tuple[int, int] = (2, 2),
    restart_interval: int = 0,
    ac_bits=None,
    wide_dqt: bool = False,
    precision: int = 8,
) -> bytes:
    """Baseline/extended-sequential JFIF-less JPEG: gray (cb/cr None)
    or interleaved YCbCr with luma sampling ``sampling`` and 1x1
    chroma. Planes are uint8 (or uint16 when ``precision=12``)
    full-resolution; chroma is box-averaged down by the sampling
    factors."""
    h, w_img = y.shape
    color = cb is not None
    sh, sv = (sampling if color else (1, 1))
    ql, qc = _quality_tables(quality)
    shift = float(1 << (precision - 1))
    if precision == 12:
        dc_bits, dc_vals, ac_syms = DC12_BITS, DC12_VALS, AC12_SYMBOLS
        ac_bits = AC12_FLAT_BITS if ac_bits is None else ac_bits
    else:
        dc_bits, dc_vals, ac_syms = DC_BITS, DC_VALS, AC_SYMBOLS
        ac_bits = AC_FLAT_BITS if ac_bits is None else ac_bits
    mcux = -(-w_img // (8 * sh))
    mcuy = -(-h // (8 * sv))
    ypad = _pad_to(y, mcuy * 8 * sv, mcux * 8 * sh)
    if color:
        cbp = _pad_to(cb, mcuy * 8 * sv, mcux * 8 * sh)
        crp = _pad_to(cr, mcuy * 8 * sv, mcux * 8 * sh)
        # box-average chroma down to one 8x8 block per MCU axis unit
        cbs = cbp.reshape(mcuy * 8, sv, mcux * 8, sh).mean(axis=(1, 3))
        crs = crp.reshape(mcuy * 8, sv, mcux * 8, sh).mean(axis=(1, 3))

    out = bytearray(b"\xff\xd8")
    out += _dqt(0, ql, wide_dqt)
    if color:
        out += _dqt(1, qc, wide_dqt)
    comps = [(1, (sh << 4) | sv, 0)]
    if color:
        comps += [(2, 0x11, 1), (3, 0x11, 1)]
    sof = struct.pack(">BHHB", precision, h, w_img, len(comps))
    for cid, samp, tq in comps:
        sof += bytes([cid, samp, tq])
    out += _seg(0xC0, sof)
    out += _dht(0, 0, dc_bits, dc_vals)
    out += _dht(1, 0, ac_bits, ac_syms)
    if color:
        out += _dht(0, 1, dc_bits, dc_vals)
        out += _dht(1, 1, ac_bits, ac_syms)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _, tq in comps:
        sos += bytes([cid, (tq << 4) | tq])     # dc/ac selector = comp table
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_tab = _encode_table(dc_bits, dc_vals)
    ac_tab = _encode_table(ac_bits, ac_syms)
    wtr = _BitWriter()
    preds = [0, 0, 0]
    rst_n = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                preds = [0, 0, 0]
            for by in range(sv):
                for bx in range(sh):
                    r0 = (my * sv + by) * 8
                    c0 = (mx * sh + bx) * 8
                    blk = _fdct_quant(
                        ypad[r0 : r0 + 8, c0 : c0 + 8], ql, shift
                    )
                    preds[0] = _put_block(wtr, blk, preds[0], dc_tab, ac_tab)
            if color:
                for ci, plane in ((1, cbs), (2, crs)):
                    r0, c0 = my * 8, mx * 8
                    blk = _fdct_quant(
                        plane[r0 : r0 + 8, c0 : c0 + 8], qc, shift
                    )
                    preds[ci] = _put_block(
                        wtr, blk, preds[ci], dc_tab, ac_tab
                    )
            mcu_count += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Round-trips
# ---------------------------------------------------------------------------


def _smooth(h, w, seed=0):
    """Low-frequency test image: sum of 2-D cosines, well inside what
    quantization preserves."""
    yy, xx = np.mgrid[0:h, 0:w]
    rng = np.random.RandomState(seed)
    img = 128.0 + 60 * np.cos(xx / 19.0 + rng.rand()) * np.cos(
        yy / 23.0 + rng.rand()
    )
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def _decode(blob):
    h, w, dt, px = jc.decode_jpeg(blob, {})
    assert dt == "uint8"
    return np.frombuffer(px, dtype=np.uint8).reshape(h, w)


def test_gray_constant_block_exact():
    """A constant-128 image has all-zero coefficients (level shift makes
    it the DCT origin) and reconstructs EXACTLY at any quality; 137 is
    exact wherever its DC value survives the quant grid (quality 95:
    DC step 2 divides 72)."""
    img = np.full((16, 24), 128, dtype=np.uint8)
    got = _decode(encode_jpeg(img, quality=10))
    assert np.array_equal(got, img)
    img = np.full((16, 24), 137, dtype=np.uint8)
    got = _decode(encode_jpeg(img, quality=95))
    assert np.array_equal(got, img)


def test_gray_smooth_roundtrip_high_quality():
    img = _smooth(40, 56)
    got = _decode(encode_jpeg(img, quality=95))
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.max() <= 6 and err.mean() < 1.5


def test_gray_odd_dimensions_cropped():
    img = _smooth(21, 13, seed=3)
    got = _decode(encode_jpeg(img, quality=95))
    assert got.shape == (21, 13)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 8


@pytest.mark.parametrize("sampling", [(1, 1), (2, 1), (2, 2)])
def test_color_roundtrip_luma(sampling):
    """3-component YCbCr at each sampling mode: the decoder returns the
    full-resolution luma plane; chroma content must not disturb it."""
    y = _smooth(32, 48, seed=7)
    cb = _smooth(32, 48, seed=8)
    cr = np.full((32, 48), 128, dtype=np.uint8)
    got = _decode(encode_jpeg(y, cb, cr, quality=95, sampling=sampling))
    assert got.shape == (32, 48)
    err = np.abs(got.astype(int) - y.astype(int))
    assert err.max() <= 6 and err.mean() < 1.5


def test_restart_intervals():
    img = _smooth(48, 48, seed=11)
    blob = encode_jpeg(img, quality=95, restart_interval=2)
    assert b"\xff\xd0" in blob            # RST0 actually emitted
    got = _decode(blob)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 6


def test_multi_length_ac_table_and_16bit_dqt():
    img = _smooth(24, 24, seed=5)
    blob = encode_jpeg(
        img, quality=95, ac_bits=AC_MULTI_BITS, wide_dqt=True
    )
    got = _decode(blob)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 6


def test_byte_stuffing_no_bare_ff_in_scan():
    """Entropy data may contain 0xFF only as 0xFF00 (stuffed) or a
    restart marker."""
    img = _smooth(64, 64, seed=13)
    blob = encode_jpeg(img, quality=10, restart_interval=3)
    sos = blob.index(b"\xff\xda")
    scan = blob[sos + 2 + 2 + 6 : -2]     # past SOS header, before EOI
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00 or 0xD0 <= scan[i + 1] <= 0xD7
            i += 2
        else:
            i += 1


# ---------------------------------------------------------------------------
# Envelope behavior: unsupported variants degrade, corrupt bytes raise
# ---------------------------------------------------------------------------

# SOI + minimal SOF9 (arithmetic-coded) header: a variant we genuinely
# don't decode offline — must raise NotImplementedError (feeds the
# media_features NOT_DECODABLE degradation path). Progressive (SOF2)
# decodes for real since round 10, so it no longer serves as the
# unsupported-variant fixture.
ARITHMETIC_STUB = (
    b"\xff\xd8\xff\xc9" + struct.pack(">H", 11)
    + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
)


def test_arithmetic_raises_notimplemented():
    with pytest.raises(NotImplementedError, match="arithmetic"):
        jc.decode_jpeg(ARITHMETIC_STUB, {})


def test_corrupt_bytes_raise_valueerror():
    with pytest.raises(ValueError):
        jc.decode_jpeg(b"\xff\xd8 fake", {})
    with pytest.raises(ValueError):
        jc.decode_jpeg(b"not a jpeg at all", {})
    img = _smooth(16, 16)
    blob = encode_jpeg(img)
    with pytest.raises(ValueError):
        jc.decode_jpeg(blob[: len(blob) // 2], {})  # truncated scan


def test_16bit_precision_raises_notimplemented():
    """12-bit decodes for real now; the precision envelope boundary
    moves to values T.81's DCT modes don't define (e.g. 16)."""
    stub = (
        b"\xff\xd8\xff\xc0" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 16, 8, 8, 1) + bytes([1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError, match="16-bit"):
        jc.decode_jpeg(stub, {})


# ---------------------------------------------------------------------------
# 12-bit precision (extended sequential + progressive)
# ---------------------------------------------------------------------------


def _decode16(blob):
    h, w, dt, px = jc.decode_jpeg(blob, {})
    assert dt == "uint16"
    return np.frombuffer(px, dtype=np.uint16).reshape(h, w)


def _smooth12(h, w, seed=0):
    """12-bit analogue of _smooth: values around mid-scale 2048."""
    yy, xx = np.mgrid[0:h, 0:w]
    rng = np.random.RandomState(seed)
    img = 2048.0 + 960 * np.cos(xx / 19.0 + rng.rand()) * np.cos(
        yy / 23.0 + rng.rand()
    )
    return np.clip(np.round(img), 0, 4095).astype(np.uint16)


def test_12bit_gray_constant_exact():
    """Constant 2048 is the level-shift origin (all-zero coefficients,
    exact at any quality); 3000 is exact where the DC value survives
    the quant grid (8*(3000-2048) = 7616 = 476 * ql[0]=16)."""
    img = np.full((16, 24), 2048, dtype=np.uint16)
    assert np.array_equal(_decode16(encode_jpeg(img, quality=10,
                                                precision=12)), img)
    img = np.full((16, 24), 3000, dtype=np.uint16)
    assert np.array_equal(_decode16(encode_jpeg(img, quality=50,
                                                precision=12)), img)


def test_12bit_smooth_roundtrip():
    img = _smooth12(40, 56)
    got = _decode16(encode_jpeg(img, quality=95, precision=12))
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int))
    # 16x the 8-bit tolerances: the quant tables are unchanged, so the
    # absolute error scales with the 16x wider sample range
    assert err.max() <= 96 and err.mean() < 24


def test_12bit_extended_dc_categories_roundtrip():
    """Alternating 0/4095 blocks force DC diff categories ABOVE the
    8-bit limit of 11 — the part of the 12-bit envelope that is not
    just a wider level shift. Verify the extreme categories are really
    exercised, then decode against the independent dequant+IDCT of the
    encoder's own quantized grid."""
    img = np.zeros((16, 32), dtype=np.uint16)
    for b in range(4):
        if b % 2:
            img[:, b * 8 : b * 8 + 8] = 4095
    ql, _ = _quality_tables(95)
    # independent expected plane + category census from the grid
    max_cat = 0
    pred = 0
    expect = np.zeros((16, 32), dtype=np.uint16)
    c = jc.dct_basis()
    for gy in range(2):
        for gx in range(4):
            blk = _fdct_quant(
                img[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8].astype(
                    np.float64
                ),
                ql,
                2048.0,
            )
            # dequantize in natural order
            nat = np.zeros(64)
            for k in range(64):
                nat[jc.ZIGZAG[k]] = blk[k] * ql[jc.ZIGZAG[k]]
            pix = c.T @ nat.reshape(8, 8) @ c
            expect[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8] = np.clip(
                np.round(pix) + 2048.0, 0, 4095
            ).astype(np.uint16)
    # raster-order DC categories as the interleaved scan encodes them
    pred = 0
    for gy in range(2):
        for gx in range(4):
            blk = _fdct_quant(
                img[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8].astype(
                    np.float64
                ),
                ql,
                2048.0,
            )
            diff = int(blk[0]) - pred
            pred = int(blk[0])
            max_cat = max(max_cat, int(abs(diff)).bit_length())
    assert max_cat > 11, f"test image only reaches DC category {max_cat}"
    got = _decode16(encode_jpeg(img, quality=95, precision=12))
    assert np.array_equal(got, expect)


def test_12bit_progressive_equals_baseline():
    """The progressive path at 12-bit must accumulate the SAME
    quantized coefficients as the extended-sequential encoding —
    plane equality, the round-10 verification trick."""
    img = _smooth12(24, 40, seed=9)
    base = _decode16(encode_jpeg(img, quality=90, precision=12))
    prog = _decode16(
        encode_jpeg_progressive(img, quality=90, precision=12)
    )
    assert np.array_equal(base, prog)


# ---------------------------------------------------------------------------
# Lossless (SOF3) — exact round-trips, no tolerance anywhere
# ---------------------------------------------------------------------------

# Difference categories for lossless run to 16 (the special no-bits
# 32768 symbol); a valid canonical table over 17 symbols.
DCL_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0]
DCL_VALS = list(range(17))


def encode_jpeg_lossless(
    img: np.ndarray,
    precision: int,
    predictor: int = 1,
    pt: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Lossless JPEG (SOF3): single-component, huffman-coded predictor
    differences, modulo-2^16, in lockstep with the decoder (T.81
    H.1.2.2 restart convention: the sample after RSTn predicts the
    scan-start default and the rest of that line uses Ra)."""
    h, w_img = img.shape
    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", precision, h, w_img, 1) + bytes([1, 0x11, 0])
    out += _seg(0xC3, sof)
    out += _dht(0, 0, DCL_BITS, DCL_VALS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([1, 1, 0x00, predictor, 0, pt & 0x0F]))

    tab = _encode_table(DCL_BITS, DCL_VALS)
    wtr = _BitWriter()
    vals = (img.astype(np.int64) >> pt)
    default = 1 << (precision - pt - 1)
    rst_n = 0
    count = 0
    fresh = True
    for y in range(h):
        ra_line = y == 0
        for x in range(w_img):
            if restart_interval and count and count % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                fresh = True
                ra_line = True
                count = 0
            if fresh:
                p = default
                fresh = False
            elif ra_line:
                p = int(vals[y, x - 1])
            elif x == 0:
                p = int(vals[y - 1, 0])
            else:
                ra, rb, rc = (int(vals[y, x - 1]), int(vals[y - 1, x]),
                              int(vals[y - 1, x - 1]))
                p = [ra, rb, rc, ra + rb - rc, ra + ((rb - rc) >> 1),
                     rb + ((ra - rc) >> 1), (ra + rb) >> 1][predictor - 1]
            diff = (int(vals[y, x]) - p) & 0xFFFF
            if diff >= 32768:
                diff -= 65536            # re-center to -32768..32767
            if diff == -32768:
                code, length = tab[16]   # the special no-bits symbol
                wtr.put(code, length)
            else:
                s = int(abs(diff)).bit_length()
                code, length = tab[s]
                wtr.put(code, length)
                if s:
                    wtr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
            count += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_exact_all_predictors(predictor):
    """Random 12-bit image, every predictor: decode must return the
    input EXACTLY (that is the definition of the mode)."""
    rng = np.random.RandomState(predictor)
    img = rng.randint(0, 4096, size=(21, 17)).astype(np.uint16)
    h, w, dt, px = jc.decode_jpeg(
        encode_jpeg_lossless(img, 12, predictor=predictor), {}
    )
    assert (h, w, dt) == (21, 17, "uint16")
    assert np.array_equal(np.frombuffer(px, np.uint16).reshape(h, w), img)


@pytest.mark.parametrize("prec", [2, 8, 16])
def test_lossless_exact_precision_sweep(prec):
    rng = np.random.RandomState(prec)
    img = rng.randint(0, 1 << prec, size=(9, 13)).astype(np.uint16)
    h, w, dt, px = jc.decode_jpeg(
        encode_jpeg_lossless(img, prec, predictor=4), {}
    )
    expect_dt = "uint8" if prec <= 8 else "uint16"
    assert dt == expect_dt
    got = np.frombuffer(px, np.uint8 if prec <= 8 else np.uint16)
    assert np.array_equal(got.reshape(h, w), img)


def test_lossless_restart_and_point_transform():
    rng = np.random.RandomState(99)
    img = rng.randint(0, 4096, size=(8, 40)).astype(np.uint16)
    blob = encode_jpeg_lossless(img, 12, predictor=7, restart_interval=64)
    assert b"\xff\xd0" in blob
    h, w, dt, px = jc.decode_jpeg(blob, {})
    assert np.array_equal(np.frombuffer(px, np.uint16).reshape(h, w), img)
    # point transform drops Pt low bits; output is shifted back up
    blob = encode_jpeg_lossless(img, 12, predictor=1, pt=2)
    h, w, dt, px = jc.decode_jpeg(blob, {})
    got = np.frombuffer(px, np.uint16).reshape(h, w)
    assert np.array_equal(got, (img >> 2) << 2)


def test_lossless_restart_spec_literal_stream():
    """T.81 H.1.2.2 pinned by a hand-written byte stream (independent
    of the lockstep encoder's loop): after RSTn the first sample
    predicts the scan-start default and the REMAINDER of that line uses
    the 1-D Ra predictor, even though the scan header selects
    predictor 4. Predictions below are hand-computed constants."""
    img = np.array([[10, 20, 30, 40], [50, 60, 200, 70]], dtype=np.uint8)
    preds = [
        128,           # (0,0) scan start -> default          (H.1.2.3)
        10, 20, 30,    # (0,1..3) first line -> Ra            (H.1.2.2)
        10,            # (1,0) first column -> Rb
        50 + 20 - 10,  # (1,1) selected predictor 4 (Ra+Rb-Rc)
        # --- RST0: the 6-sample restart interval ends here ---
        128,           # (1,2) post-restart -> default        (H.1.2.3)
        200,           # (1,3) rest of the line -> Ra, NOT predictor 4
    ]
    flat = [int(v) for v in img.reshape(-1)]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xC3, struct.pack(">BHHB", 8, 2, 4, 1) + bytes([1, 0x11, 0]))
    out += _dht(0, 0, DCL_BITS, DCL_VALS)
    out += _seg(0xDD, struct.pack(">H", 6))
    out += _seg(0xDA, bytes([1, 1, 0x00, 4, 0, 0]))  # predictor 4
    tab = _encode_table(DCL_BITS, DCL_VALS)
    wtr = _BitWriter()
    for i, (v, p) in enumerate(zip(flat, preds)):
        if i == 6:  # restart marker between samples 5 and 6
            wtr.flush()
            wtr.out += bytes([0xFF, 0xD0])
        diff = v - p
        s = int(abs(diff)).bit_length()
        code, length = tab[s]
        wtr.put(code, length)
        if s:
            wtr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    h, w, dt, px = jc.decode_jpeg(bytes(out), {})
    assert (h, w, dt) == (2, 4, "uint8")
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(2, 4), img)


def test_lossless_restart_midline_all_predictors():
    """Round-trip with a restart landing MID-LINE for every predictor
    (interval 10 on a 13-wide image): the post-restart Ra line portion
    and the next-line predictor resumption must agree between the
    lockstep pair."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 4096, size=(6, 13)).astype(np.uint16)
    for predictor in range(1, 8):
        blob = encode_jpeg_lossless(
            img, 12, predictor=predictor, restart_interval=10
        )
        h, w, dt, px = jc.decode_jpeg(blob, {})
        assert np.array_equal(
            np.frombuffer(px, np.uint16).reshape(h, w), img
        ), predictor


def test_lossless_wraparound_difference():
    """A 0 -> 65535-range jump at 16-bit exercises the modulo-2^16
    difference arithmetic and the special category-16 symbol."""
    img = np.array([[0, 32768, 0, 65535]], dtype=np.uint16)
    h, w, dt, px = jc.decode_jpeg(encode_jpeg_lossless(img, 16), {})
    assert np.array_equal(np.frombuffer(px, np.uint16).reshape(1, 4), img)


def test_lossless_color_raises():
    sof = struct.pack(">BHHB", 12, 8, 8, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    stub = b"\xff\xd8" + _seg(0xC3, sof)
    with pytest.raises(NotImplementedError, match="component"):
        jc.decode_jpeg(stub, {})


# ---------------------------------------------------------------------------
# Through the Spark decode path
# ---------------------------------------------------------------------------


def test_media_features_decodes_jpeg(spark):
    """A jpeg blob in the media table must produce REAL features (not
    NOT_DECODABLE) through the vectorized feature pass — the format is
    no longer a stub anywhere in the pipeline."""
    import json

    img = np.full((16, 16), 128, dtype=np.uint8)  # exact at any quality
    media = spark.createDataFrame(
        [(9, "image", "jpeg", json.dumps({}),
          bytearray(encode_jpeg(img, quality=90)))],
        bf.MEDIA_SCHEMA,
    )
    feats = bf.media_features(media).collect()
    assert len(feats) == 1
    assert feats[0].mean_intensity == repr(128.0)
    assert (feats[0].thumb_h, feats[0].thumb_w) == (8, 8)


def test_decode_files_jpeg_through_spark(spark, tmp_path):
    imgs = {f"f{i}.jpg": _smooth(16, 16, seed=i) for i in range(3)}
    for name, img in imgs.items():
        (tmp_path / name).write_bytes(encode_jpeg(img, quality=95))
    df = bf.read_binary_dir(spark, str(tmp_path), "*.jpg")
    rows = {r.path.split("/")[-1]: r
            for r in bf.decode_files(df, "jpeg", {}).collect()}
    assert len(rows) == 3
    for name, img in imgs.items():
        r = rows[name]
        got = np.frombuffer(bytes(r.px), dtype=np.uint8).reshape(r.h, r.w)
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 6


def test_large_image_decodes_in_linear_time():
    """The bit reader must REPLACE its accumulator per byte, not append
    (an appending accumulator makes decode quadratic in scan size —
    minutes for a few hundred KB). 256x256 -> 1024 blocks decodes in
    seconds when linear."""
    import time

    img = _smooth(256, 256, seed=17)
    blob = encode_jpeg(img, quality=85)
    t0 = time.perf_counter()
    got = _decode(blob)
    assert time.perf_counter() - t0 < 30  # quadratic form took minutes
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 8


def test_truncated_segments_raise_valueerror():
    """struct/index errors from truncated SEGMENTS must surface as the
    documented ValueError, distinct from NotImplementedError."""
    short_dri = b"\xff\xd8\xff\xdd" + struct.pack(">H", 3) + b"\x00"
    with pytest.raises(ValueError):
        jc.decode_jpeg(short_dri, {})
    # SOS header claiming 2 scan components but carrying 1 byte
    short_sos = (
        b"\xff\xd8\xff\xc0" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        + b"\xff\xda" + struct.pack(">H", 4) + bytes([2, 1])
    )
    with pytest.raises(ValueError):
        jc.decode_jpeg(short_sos, {})
    # DHT with fewer than 16 bits-count bytes
    short_dht = b"\xff\xd8\xff\xc4" + struct.pack(">H", 6) + bytes([0, 0, 0, 0])
    with pytest.raises(ValueError):
        jc.decode_jpeg(short_dht, {})


def test_media_features_mixed_group_degrades_per_row(spark):
    """One arithmetic-coded JPEG among baseline ones IN THE SAME pandas
    group must flip only ITS row to NOT_DECODABLE — per-row, not
    per-group, degradation (else output depends on batch boundaries)."""
    import json

    img = np.full((16, 16), 128, dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (1, "image", "jpeg", json.dumps({}),
             bytearray(encode_jpeg(img, quality=90))),
            (2, "image", "jpeg", json.dumps({}), bytearray(ARITHMETIC_STUB)),
            (3, "image", "jpeg", json.dumps({}),
             bytearray(encode_jpeg(img, quality=90))),
        ],
        bf.MEDIA_SCHEMA,
    ).coalesce(1)                         # force one batch, one group
    feats = {r.media_id: r for r in bf.media_features(media).collect()}
    assert feats[1].mean_intensity == repr(128.0)
    assert feats[3].mean_intensity == repr(128.0)
    assert feats[2].mean_intensity == "NOT_DECODABLE"


def test_frame_sample_nonraw_raises(spark):
    """A decodable STILL format on a video row must raise, not silently
    emit zero frames (a still decoder succeeding is not video support)."""
    import json

    img = np.full((8, 8), 100, dtype=np.uint8)
    media = spark.createDataFrame(
        [(4, "video", "jpeg", json.dumps({}),
          bytearray(encode_jpeg(img, quality=90)))],
        bf.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|video container"):
        bf.media_frame_sample(media).collect()


# ---------------------------------------------------------------------------
# Progressive (SOF2) lockstep encoder + round-trips
# ---------------------------------------------------------------------------
#
# Same epistemic contract as the baseline encoder above: derived to stay
# in lockstep with the decoder's Annex G implementation. Exercises
# spectral selection (band scans), successive approximation (DC and AC
# first/refine with point transform), EOB-run coding, interleaved and
# single-component DC scans, and restart intervals. Because progressive
# files carry the SAME quantized coefficients as baseline files, the
# strongest check available offline is EQUALITY of the decoded planes:
# decode(progressive(img)) must match decode(baseline(img)) bit-for-bit.

# libjpeg's standard scan script shape: DC first at Al=1, AC bands at
# reduced precision, then refinements down to full precision.
# Progressive AC tables additionally need the EOBn symbols (r<<4 | 0,
# r = 1..14 — T.81 G.1.2.2 end-of-band run codes; EOB0 is baseline 0x00).
AC_PROG_SYMBOLS = AC_SYMBOLS + [r << 4 for r in range(1, 15)]
AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
# 12-bit progressive: the 226 sequential symbols + EOBn -> 240 codes,
# which no longer fit in 8 bits beside themselves; split across 8/9.
AC12_PROG_SYMBOLS = AC12_SYMBOLS + [r << 4 for r in range(1, 15)]
AC12_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 112, 0, 0, 0, 0, 0, 0, 0]

_PROG_SCRIPT_GRAY = [
    ([0], 0, 0, 0, 1),        # DC first, Al=1
    ([0], 1, 5, 0, 2),        # AC band 1-5 first, Al=2
    ([0], 6, 63, 0, 2),       # AC band 6-63 first, Al=2
    ([0], 1, 63, 2, 1),       # AC refine Al 2->1
    ([0], 0, 0, 1, 0),        # DC refine Al 1->0
    ([0], 1, 63, 1, 0),       # AC refine Al 1->0
]
_PROG_SCRIPT_COLOR = [
    ([0, 1, 2], 0, 0, 0, 1),  # interleaved DC first
    ([0], 1, 5, 0, 2),
    ([2], 1, 63, 0, 1),       # chroma scans (skipped by the decoder)
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0, 1, 2], 0, 0, 1, 0),  # interleaved DC refine
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),
]


def encode_jpeg_progressive(
    y: np.ndarray,
    cb: np.ndarray | None = None,
    cr: np.ndarray | None = None,
    quality: int = 85,
    sampling: tuple[int, int] = (2, 2),
    script: list | None = None,
    restart_interval: int = 0,
    ac_bits=None,
    precision: int = 8,
) -> bytes:
    """Progressive JPEG: scans per ``script`` entries
    (comp_indices, Ss, Se, Ah, Al)."""
    h, w_img = y.shape
    color = cb is not None
    sh, sv = (sampling if color else (1, 1))
    ql, qc = _quality_tables(quality)
    shift = float(1 << (precision - 1))
    if precision == 12:
        dc_bits, dc_vals = DC12_BITS, DC12_VALS
        ac_syms = AC12_PROG_SYMBOLS
        ac_bits = AC12_PROG_BITS if ac_bits is None else ac_bits
    else:
        dc_bits, dc_vals = DC_BITS, DC_VALS
        ac_syms = AC_PROG_SYMBOLS
        ac_bits = AC_PROG_BITS if ac_bits is None else ac_bits
    mcux = -(-w_img // (8 * sh))
    mcuy = -(-h // (8 * sv))

    # quantized coefficient grids, padded block dims (as baseline writes)
    def grid(plane: np.ndarray, by: int, bx: int, q) -> np.ndarray:
        g = np.zeros((by, bx, 64), dtype=np.int64)
        for gy in range(by):
            for gx in range(bx):
                g[gy, gx] = _fdct_quant(
                    plane[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8], q,
                    shift,
                )
        return g

    ypad = _pad_to(y, mcuy * 8 * sv, mcux * 8 * sh)
    grids = [grid(ypad, mcuy * sv, mcux * sh, ql)]
    samps = [(sh, sv)]
    if color:
        for plane in (cb, cr):
            p = _pad_to(plane, mcuy * 8 * sv, mcux * 8 * sh)
            ps = p.reshape(mcuy * 8, sv, mcux * 8, sh).mean(axis=(1, 3))
            grids.append(grid(ps, mcuy, mcux, qc))
            samps.append((1, 1))
    # TRUE block dims per component (non-interleaved scan geometry)
    true_dims = []
    for chs, cvs in samps:
        cw = -(-w_img * chs // sh)
        chh = -(-h * cvs // sv)
        true_dims.append((-(-chh // 8), -(-cw // 8)))

    if script is None:
        script = _PROG_SCRIPT_COLOR if color else _PROG_SCRIPT_GRAY

    out = bytearray(b"\xff\xd8")
    out += _dqt(0, ql, False)
    if color:
        out += _dqt(1, qc, False)
    comps_hdr = [(1, (sh << 4) | sv, 0)]
    if color:
        comps_hdr += [(2, 0x11, 1), (3, 0x11, 1)]
    sof = struct.pack(">BHHB", precision, h, w_img, len(comps_hdr))
    for cid, samp, tq in comps_hdr:
        sof += bytes([cid, samp, tq])
    out += _seg(0xC2, sof)
    out += _dht(0, 0, dc_bits, dc_vals)
    out += _dht(1, 0, ac_bits, ac_syms)
    if color:
        out += _dht(0, 1, dc_bits, dc_vals)
        out += _dht(1, 1, ac_bits, ac_syms)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    dc_tab = _encode_table(dc_bits, dc_vals)
    ac_tab = _encode_table(ac_bits, ac_syms)

    for comp_ids, ss, se, ah, al in script:
        out += _encode_prog_scan(
            grids, true_dims, (mcux, mcuy), samps, comp_ids, ss, se, ah,
            al, dc_tab, ac_tab, restart_interval,
        )
    out += b"\xff\xd9"
    return bytes(out)


def _encode_prog_scan(
    grids, true_dims, mcu_dims, samps, comp_ids, ss, se, ah, al,
    dc_tab, ac_tab, restart_interval,
) -> bytes:
    mcux, mcuy = mcu_dims
    sos = bytes([len(comp_ids)])
    for ci in comp_ids:
        td = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (td << 4) | td])
    sos += bytes([ss, se, (ah << 4) | al])
    seg = bytearray(_seg(0xDA, sos))

    w = _BitWriter()
    st = {"eobrun": 0, "be": []}       # pending EOB run + its buffered bits
    preds = [0] * len(grids)

    def flush_eobrun() -> None:
        if st["eobrun"]:
            n = st["eobrun"]
            nb = n.bit_length() - 1
            code, length = ac_tab[nb << 4]
            w.put(code, length)
            if nb:
                w.put(n - (1 << nb), nb)
            st["eobrun"] = 0
        for b in st["be"]:
            w.put(b, 1)
        st["be"] = []

    def dc_first(blk, ci) -> None:
        v = int(blk[0]) >> al          # DC point transform: arithmetic shift
        diff = v - preds[ci]
        preds[ci] = v
        s = abs(diff).bit_length()
        code, length = dc_tab[s]
        w.put(code, length)
        if s:
            w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)

    def dc_refine(blk) -> None:
        w.put((int(blk[0]) >> al) & 1, 1)

    def ac_first(blk) -> None:
        r = 0
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = abs(v) >> al           # AC point transform: magnitude shift
            if t == 0:
                r += 1
                continue
            flush_eobrun()
            while r > 15:
                zc, zl = ac_tab[0xF0]
                w.put(zc, zl)
                r -= 16
            s = t.bit_length()
            code, length = ac_tab[(r << 4) | s]
            w.put(code, length)
            tv = t if v > 0 else -t
            w.put(tv if tv >= 0 else tv + (1 << s) - 1, s)
            r = 0
        if r:
            st["eobrun"] += 1
            if st["eobrun"] == 0x7FFF:
                flush_eobrun()

    def ac_refine(blk) -> None:
        # the published Annex G reference algorithm (libjpeg
        # encode_mcu_AC_refine): BR buffers correction bits since the
        # last symbol; EOB-run blocks append theirs to the run buffer
        t = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eob = -1
        for i, tv in enumerate(t):
            if tv == 1:
                eob = i
        br: list[int] = []
        r = 0
        for i, tv in enumerate(t):
            if tv == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                flush_eobrun()
                zc, zl = ac_tab[0xF0]
                w.put(zc, zl)
                r -= 16
                for b in br:
                    w.put(b, 1)
                br = []
            if tv > 1:
                br.append(tv & 1)
                continue
            flush_eobrun()
            code, length = ac_tab[(r << 4) | 1]
            w.put(code, length)
            w.put(1 if int(blk[ss + i]) >= 0 else 0, 1)
            for b in br:
                w.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            st["eobrun"] += 1
            st["be"].extend(br)
            if st["eobrun"] == 0x7FFF or len(st["be"]) > 900:
                flush_eobrun()

    def do_block(blk, ci) -> None:
        if ss == 0:
            if ah == 0:
                dc_first(blk, ci)
            else:
                dc_refine(blk)
        elif ah == 0:
            ac_first(blk)
        else:
            ac_refine(blk)

    rst_n = 0
    units = 0

    def maybe_restart() -> int:
        nonlocal rst_n, preds
        if restart_interval and units and units % restart_interval == 0:
            flush_eobrun()
            w.flush()
            w.out += bytes([0xFF, 0xD0 + rst_n])
            rst_n = (rst_n + 1) % 8
            preds = [0] * len(grids)
        return 0

    if len(comp_ids) > 1:              # interleaved DC scan: MCU geometry
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for ci in comp_ids:
                    chs, cvs = samps[ci]
                    for by in range(cvs):
                        for bx in range(chs):
                            do_block(
                                grids[ci][my * cvs + by, mx * chs + bx], ci
                            )
                units += 1
    else:                              # single component: TRUE block dims
        ci = comp_ids[0]
        bty, btx = true_dims[ci]
        for gy in range(bty):
            for gx in range(btx):
                maybe_restart()
                do_block(grids[ci][gy, gx], ci)
                units += 1
    flush_eobrun()
    w.flush()
    seg += w.out
    return bytes(seg)


def test_progressive_gray_matches_baseline():
    """decode(progressive(img)) must equal decode(baseline(img))
    bit-for-bit: both carry identical quantized coefficients."""
    img = _smooth(40, 56, seed=21)
    base = _decode(encode_jpeg(img, quality=85))
    prog = _decode(encode_jpeg_progressive(img, quality=85))
    assert prog.shape == (40, 56)
    assert np.array_equal(prog, base)


def test_progressive_gray_odd_dimensions():
    img = _smooth(21, 13, seed=22)
    base = _decode(encode_jpeg(img, quality=95))
    prog = _decode(encode_jpeg_progressive(img, quality=95))
    assert np.array_equal(prog, base)


@pytest.mark.parametrize("sampling", [(1, 1), (2, 1), (2, 2)])
def test_progressive_color_matches_baseline(sampling):
    """Interleaved DC scan + skipped chroma AC scans: luma must match
    the baseline decode exactly at every sampling mode."""
    y = _smooth(32, 48, seed=23)
    cb = _smooth(32, 48, seed=24)
    cr = np.full((32, 48), 90, dtype=np.uint8)
    base = _decode(encode_jpeg(y, cb, cr, quality=85, sampling=sampling))
    prog = _decode(
        encode_jpeg_progressive(y, cb, cr, quality=85, sampling=sampling)
    )
    assert np.array_equal(prog, base)


def test_progressive_restart_intervals():
    img = _smooth(48, 48, seed=25)
    blob = encode_jpeg_progressive(img, quality=85, restart_interval=3)
    assert b"\xff\xd0" in blob
    base = _decode(encode_jpeg(img, quality=85))
    assert np.array_equal(_decode(blob), base)


def test_progressive_spectral_only_script():
    """Pure spectral selection (no successive approximation): every
    scan at Al=0, bands split three ways."""
    img = _smooth(24, 40, seed=26)
    script = [
        ([0], 0, 0, 0, 0),
        ([0], 1, 2, 0, 0),
        ([0], 3, 20, 0, 0),
        ([0], 21, 63, 0, 0),
    ]
    base = _decode(encode_jpeg(img, quality=85))
    prog = _decode(encode_jpeg_progressive(img, quality=85, script=script))
    assert np.array_equal(prog, base)


def test_progressive_rough_image_heavy_refinement():
    """High-frequency noise exercises ZRL-in-refine, EOB-run folding,
    and correction-bit buffering; deep Al chain."""
    rng = np.random.RandomState(27)
    img = rng.randint(0, 256, size=(32, 32)).astype(np.uint8)
    script = [
        ([0], 0, 0, 0, 2),
        ([0], 0, 0, 2, 1),
        ([0], 0, 0, 1, 0),
        ([0], 1, 63, 0, 3),
        ([0], 1, 63, 3, 2),
        ([0], 1, 63, 2, 1),
        ([0], 1, 63, 1, 0),
    ]
    base = _decode(encode_jpeg(img, quality=50))
    prog = _decode(encode_jpeg_progressive(img, quality=50, script=script))
    assert np.array_equal(prog, base)


def test_progressive_truncated_scan_raises():
    img = _smooth(24, 24, seed=28)
    blob = encode_jpeg_progressive(img, quality=85)
    with pytest.raises(ValueError):
        jc.decode_jpeg(blob[: len(blob) * 2 // 3], {})


def test_media_features_decodes_progressive_jpeg(spark):
    """Progressive JPEG through the vectorized Spark feature pass —
    real features, and equal to the baseline encoding of the same
    image."""
    import json

    img = _smooth(24, 24, seed=29)
    media = spark.createDataFrame(
        [
            (1, "image", "jpeg", json.dumps({}),
             bytearray(encode_jpeg(img, quality=90))),
            (2, "image", "jpeg", json.dumps({}),
             bytearray(encode_jpeg_progressive(img, quality=90))),
        ],
        bf.MEDIA_SCHEMA,
    ).coalesce(1)
    feats = {r.media_id: r for r in bf.media_features(media).collect()}
    assert feats[2].mean_intensity == feats[1].mean_intensity
    assert feats[2].mean_intensity not in ("NOT_DECODABLE", "CORRUPT")


def test_progressive_refine_missing_table_raises_valueerror():
    """An AC REFINE scan referencing an absent DHT must raise the
    documented ValueError, not KeyError — refine scans huffman-decode
    run/size symbols too (r10 review finding)."""
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    ql, _ = _quality_tables(85)
    blob = (
        b"\xff\xd8" + _dqt(0, ql, False) + _seg(0xC2, sof)
        + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))   # Ss=1 Se=63 Ah=1 Al=0
    )
    with pytest.raises(ValueError, match="missing huffman"):
        jc.decode_jpeg(blob, {})


def test_oversized_frame_dims_raise_before_allocation():
    """A bit-flipped SOF dimension must raise ValueError instead of
    allocating a multi-GB coefficient grid (bulk-ingest DoS guard)."""
    sof = struct.pack(">BHHB", 8, 65535, 65535, 1) + bytes([1, 0x11, 0])
    blob = b"\xff\xd8" + _seg(0xC0, sof)
    with pytest.raises(ValueError, match="2\\^28"):
        jc.decode_jpeg(blob, {})
    zero = struct.pack(">BHHB", 8, 0, 16, 1) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="zero frame"):
        jc.decode_jpeg(b"\xff\xd8" + _seg(0xC0, zero), {})


def test_mutation_fuzz_never_escapes_the_exception_contract():
    """Deterministic mutation fuzz over valid baseline AND progressive
    files: flipping any single byte must either still decode or raise
    ValueError/NotImplementedError — never another exception class,
    never a hang (the per-row degradation contract catches these two
    classes; anything else would become a batch-killer in bulk
    ingest). Also a pure-random-bytes sweep."""
    img = _smooth(16, 24, seed=31)
    blobs = [
        encode_jpeg(img, quality=85),
        encode_jpeg_progressive(img, quality=85),
    ]
    rng = np.random.RandomState(31)
    for blob in blobs:
        arr = bytearray(blob)
        # flip ~120 deterministic positions spread over the file
        for pos in rng.choice(len(arr), size=min(120, len(arr)),
                              replace=False):
            orig = arr[pos]
            arr[pos] = orig ^ (1 << int(rng.randint(8)))
            try:
                jc.decode_jpeg(bytes(arr), {})
            except (ValueError, NotImplementedError):
                pass
            arr[pos] = orig
    for n in (0, 1, 7, 64, 1024):
        junk = bytes(rng.randint(0, 256, size=n, dtype=np.uint8))
        try:
            jc.decode_jpeg(b"\xff\xd8" + junk, {})
        except (ValueError, NotImplementedError):
            pass
