"""Binary-source tests: raw-file stack ingest roundtrip + multimodal
feature extraction incl. the NOT_DECODABLE degradation path."""

from __future__ import annotations

import json

import numpy as np
import pytest

from flexcalc_spark import ct
from flexcalc_spark.sources import binaryfiles as bf


def test_read_stack_raw_roundtrip(spark, tmp_path):
    """Write slice files as raw float32 blobs, ingest via binaryFile ->
    decode -> slice table, and recover the original volume."""
    rng = np.random.RandomState(3)
    vol = rng.uniform(0, 1, size=(5, 6, 7)).astype(np.float32)
    d = tmp_path / "stack"
    d.mkdir()
    for i in range(vol.shape[0]):
        (d / f"slice_{i:04d}.raw").write_bytes(vol[i].tobytes())
    df = bf.read_stack(
        spark, str(d), "scan1", "raw",
        {"h": 6, "w": 7, "dtype": "float32"}, glob="*.raw",
    )
    back = ct.array_from_slices(df)
    assert np.array_equal(back, vol)


def test_decode_unsupported_variant_raises(spark, tmp_path):
    """Out-of-envelope variants (arithmetic-coded JPEG — baseline r9 and
    progressive r10 decode for real, png/wav in r6) must raise
    NotImplementedError through Spark; corrupt bytes raise ValueError."""
    from test_jpeg import ARITHMETIC_STUB

    (tmp_path / "img.jpg").write_bytes(ARITHMETIC_STUB)
    df = bf.read_binary_dir(spark, str(tmp_path), "*.jpg")
    decoded = bf.decode_files(df, "jpeg", {})
    with pytest.raises(Exception, match="NotImplementedError|arithmetic"):
        decoded.collect()


def test_decode_malformed_tiff_raises(spark, tmp_path):
    (tmp_path / "img.tif").write_bytes(b"II*\x00fake")
    df = bf.read_binary_dir(spark, str(tmp_path), "*.tif")
    decoded = bf.decode_files(df, "tiff", {})
    with pytest.raises(Exception):
        decoded.collect()


def _write_tiff(path, arr: np.ndarray, endian: str = "<") -> None:
    """Minimal uncompressed single-strip grayscale TIFF writer (test
    fixture for the pure-Python reader; supports uint8/16/32, float32/64,
    both byte orders)."""
    import struct

    kindmap = {"u": 1, "i": 2, "f": 3}
    h, w = arr.shape
    dt = arr.dtype
    bps = dt.itemsize * 8
    data = arr.astype(dt.newbyteorder(endian)).tobytes()
    n_tags = 8
    # layout: header(8) + IFD(2 + n*12 + 4) + strip data
    ifd_off = 8
    data_off = ifd_off + 2 + n_tags * 12 + 4
    bo = b"II" if endian == "<" else b"MM"

    def tag(tid, typ, cnt, val):
        code = {3: "H", 4: "I"}[typ]
        raw = struct.pack(endian + code, val)
        raw += b"\x00" * (4 - len(raw))
        return struct.pack(endian + "HHI", tid, typ, cnt) + raw

    ifd = struct.pack(endian + "H", n_tags)
    ifd += tag(256, 4, 1, w)                      # ImageWidth
    ifd += tag(257, 4, 1, h)                      # ImageLength
    ifd += tag(258, 3, 1, bps)                    # BitsPerSample
    ifd += tag(259, 3, 1, 1)                      # Compression = none
    ifd += tag(273, 4, 1, data_off)               # StripOffsets
    ifd += tag(277, 3, 1, 1)                      # SamplesPerPixel
    ifd += tag(279, 4, 1, len(data))              # StripByteCounts
    ifd += tag(339, 3, 1, kindmap[dt.kind])       # SampleFormat
    ifd += struct.pack(endian + "I", 0)           # next IFD = none
    with open(path, "wb") as fh:
        fh.write(bo + struct.pack(endian + "H", 42)
                 + struct.pack(endian + "I", ifd_off) + ifd + data)


@pytest.mark.parametrize(
    "dtype,endian",
    [("float32", "<"), ("uint16", ">"), ("uint8", "<"), ("float64", ">")],
)
def test_read_stack_tiff_roundtrip(spark, tmp_path, dtype, endian):
    """R1: a directory of UNCOMPRESSED TIFF slices round-trips through
    the pure-Python decoder into the slice table, both byte orders."""
    rng = np.random.RandomState(7)
    vol = (rng.uniform(0, 100, size=(3, 5, 4))).astype(dtype)
    d = tmp_path / "tstack"
    d.mkdir()
    for i in range(vol.shape[0]):
        _write_tiff(str(d / f"s_{i:03d}.tif"), vol[i], endian)
    df = bf.read_stack(spark, str(d), "scanT", "tiff", {}, glob="*.tif")
    back = ct.array_from_slices(df)
    assert back.dtype == np.dtype(dtype)
    assert np.array_equal(back, vol)


def test_media_features_decodes_tiff(spark):
    """A media table holding tiff blobs must produce real features (not
    NOT_DECODABLE) through the vectorized feature pass."""
    img = np.arange(24, dtype=np.float32).reshape(4, 6)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        fp = os.path.join(td, "m.tif")
        _write_tiff(fp, img, "<")
        blob = open(fp, "rb").read()
    media = spark.createDataFrame(
        [(1, "image", "tiff", "{}", bytearray(blob))], bf.MEDIA_SCHEMA
    )
    feats = bf.media_features(media).collect()
    assert len(feats) == 1
    assert feats[0].mean_intensity == repr(float(img.mean()))
    assert (feats[0].thumb_h, feats[0].thumb_w) == (2, 3)


def test_media_frame_sample(spark):
    """A raw 'video' blob of n concatenated frames yields every k-th
    frame as its own row, bytes intact."""
    frames = np.arange(6 * 2 * 2, dtype=np.float32).reshape(6, 2, 2)
    rows = [
        (7, "video", "raw",
         json.dumps({"n_frames": 6, "h": 2, "w": 2, "dtype": "float32"}),
         frames.tobytes()),
    ]
    media = spark.createDataFrame(rows, bf.MEDIA_SCHEMA)
    out = sorted(bf.media_frame_sample(media, every_k=2).collect(),
                 key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in out] == [0, 2, 4]
    got = np.frombuffer(out[1].px, dtype=np.float32).reshape(2, 2)
    assert np.array_equal(got, frames[2])


def test_media_resize_preserves_mean(spark):
    arr = np.arange(16, dtype=np.float32).reshape(4, 4)
    rows = [(3, "image", "raw",
             json.dumps({"h": 4, "w": 4, "dtype": "float32"}), arr.tobytes())]
    media = spark.createDataFrame(rows, bf.MEDIA_SCHEMA)
    r = bf.media_resize(media).collect()[0]
    assert (r.rh, r.rw) == (2, 2)
    assert float(r.resized_mean) == float(arr.astype(np.float64).mean())


def test_media_features_mixed_decodability(spark):
    """Decodable raw/png blobs yield features; unsupported format
    VARIANTS (arithmetic-coded JPEG — baseline/progressive decode for
    real since r9/r10) degrade to flagged rows without failing the
    batch."""
    from test_jpeg import ARITHMETIC_STUB

    png = _png_encode(
        np.array([[0, 2], [4, 6]], dtype=np.uint8), 8, filters=[0, 2]
    )
    rows = [
        (1, "image", "raw", json.dumps({"h": 2, "w": 2, "dtype": "float32"}),
         np.arange(4, dtype=np.float32).tobytes()),
        (2, "image", "jpeg", json.dumps({}), ARITHMETIC_STUB),
        (3, "image", "png", json.dumps({}), png),
    ]
    media = spark.createDataFrame(rows, bf.MEDIA_SCHEMA)
    feats = {r.media_id: r for r in bf.media_features(media).collect()}
    assert feats[1].mean_intensity == repr(1.5)
    assert feats[1].thumb_h == 1 and feats[1].thumb_w == 1
    assert feats[2].mean_intensity == "NOT_DECODABLE"
    assert feats[2].thumb_h == -1
    assert feats[3].mean_intensity == repr(3.0)
    assert feats[3].thumb_h == 1 and feats[3].thumb_w == 1


def test_media_features_corrupt_blob_degrades_per_row(spark):
    """A bit-flipped/truncated blob among good ones IN THE SAME pandas
    group flips only ITS row to CORRUPT — one bad file must never fail
    a bulk batch (ADVICE r9). Covers the header-ful path (truncated
    tiff -> decoder ValueError) and the raw path (wrong blob length)."""
    img = np.arange(24, dtype=np.float32).reshape(4, 6)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        fp = os.path.join(td, "m.tif")
        _write_tiff(fp, img, "<")
        blob = open(fp, "rb").read()
    rows = [
        (1, "image", "tiff", "{}", bytearray(blob)),
        (2, "image", "tiff", "{}", bytearray(blob[:10])),   # truncated
        (3, "image", "tiff", "{}", bytearray(blob)),
        (4, "image", "raw", json.dumps({"h": 2, "w": 2, "dtype": "float32"}),
         bytearray(np.arange(4, dtype=np.float32).tobytes())),
        (5, "image", "raw", json.dumps({"h": 2, "w": 2, "dtype": "float32"}),
         bytearray(b"\x00\x01")),                           # wrong length
    ]
    media = spark.createDataFrame(rows, bf.MEDIA_SCHEMA).coalesce(1)
    feats = {r.media_id: r for r in bf.media_features(media).collect()}
    assert feats[1].mean_intensity == repr(float(img.mean()))
    assert feats[2].mean_intensity == "CORRUPT"
    assert feats[2].thumb_h == -1
    assert feats[3].mean_intensity == repr(float(img.mean()))
    assert feats[4].mean_intensity == repr(1.5)
    assert feats[5].mean_intensity == "CORRUPT"
    res = {r.media_id: r for r in bf.media_resize(media).collect()}
    assert res[2].resized_mean == "CORRUPT" and res[2].rh == -1
    assert res[5].resized_mean == "CORRUPT"
    assert float(res[1].resized_mean) == float(img.astype(np.float64).mean())


# ---------------------------------------------------------------------------
# Compressed-TIFF round-trips (LZW / PackBits / predictor)
# ---------------------------------------------------------------------------
# Test-only encoders: the engine only DECODES (real slice stacks arrive
# already compressed); these encoders exist to synthesize fixtures. The
# decoder's width-change points (bump at table length 2^n - 1, the TIFF
# 6.0 "early change") match the constants published decoders use; the
# encoder is derived to stay in lockstep (bump at next_code == 2^n) and
# the round-trips below cross every width boundary to prove the pairing.


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j < n - 1 and data[j] == data[j + 1] and j - i < 127:
            j += 1
        if j > i:                               # run of >= 2
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
        else:                                   # literal run
            j = i
            while j < n and j - i < 128:
                if j < n - 2 and data[j] == data[j + 1] == data[j + 2]:
                    break
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    cur, curbits, nbits = 0, 0, 9

    def emit(code: int) -> None:
        nonlocal cur, curbits
        cur = (cur << nbits) | code
        curbits += nbits
        while curbits >= 8:
            curbits -= 8
            out.append((cur >> curbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        if next_code >= (1 << nbits) and nbits < 12:
            nbits += 1
        if next_code == 4093:                   # table nearly full
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code, nbits = 258, 9
        w = c
    if w:
        emit(table[w])
    emit(EOI)
    if curbits:
        out.append((cur << (8 - curbits)) & 0xFF)
    return bytes(out)


def _write_tiff_ex(
    path,
    arr: np.ndarray,
    endian: str = "<",
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    planar: int = 1,
) -> None:
    """General TIFF writer: grayscale (h, w) or chunky RGB (h, w, 3),
    multi-strip, Compression in {1, 5, 8, 32946, 32773}, optional
    per-channel
    horizontal predictor (integer dtypes)."""
    import struct

    kindmap = {"u": 1, "i": 2, "f": 3}
    h, w = arr.shape[:2]
    spp = arr.shape[2] if arr.ndim == 3 else 1
    dt = arr.dtype
    bps = dt.itemsize * 8
    rps = rows_per_strip or h
    work = arr
    if predictor == 2:
        work = work.copy()
        work[:, 1:] = (work[:, 1:] - work[:, :-1]).astype(dt)
    import zlib

    enc = {1: lambda b: b, 5: _lzw_encode, 8: zlib.compress,
           32946: zlib.compress, 32773: _packbits_encode}[compression]
    if planar == 2:
        # separate-plane layout: one strip per channel (rps = h)
        rps = h
        strips = [
            enc(work[:, :, c].astype(dt.newbyteorder(endian)).tobytes())
            for c in range(spp)
        ]
    else:
        strips = [
            enc(work[r : r + rps].astype(dt.newbyteorder(endian)).tobytes())
            for r in range(0, h, rps)
        ]
    n_strips = len(strips)
    n_tags = 10 + (1 if planar != 1 else 0)
    ifd_off = 8
    # value area holds the strip offset/count arrays when n_strips > 1
    val_off = ifd_off + 2 + n_tags * 12 + 4
    arrays_sz = (2 * 4 * n_strips) if n_strips > 1 else 0
    data_off = val_off + arrays_sz
    offs = []
    pos = data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)

    def tag(tid, typ, cnt, val):
        code = {3: "H", 4: "I"}[typ]
        raw = struct.pack(endian + code, val)
        raw += b"\x00" * (4 - len(raw))
        return struct.pack(endian + "HHI", tid, typ, cnt) + raw

    ifd = struct.pack(endian + "H", n_tags)
    ifd += tag(256, 4, 1, w)
    ifd += tag(257, 4, 1, h)
    ifd += tag(258, 3, 1, bps)
    ifd += tag(259, 3, 1, compression)
    if n_strips > 1:
        ifd += tag(273, 4, n_strips, val_off)
    else:
        ifd += tag(273, 4, 1, offs[0])
    ifd += tag(277, 3, 1, spp)
    if planar != 1:
        ifd += tag(284, 3, 1, planar)
    ifd += tag(278, 4, 1, rps)
    if n_strips > 1:
        ifd += tag(279, 4, n_strips, val_off + 4 * n_strips)
    else:
        ifd += tag(279, 4, 1, len(strips[0]))
    ifd += tag(317, 3, 1, predictor)
    ifd += tag(339, 3, 1, kindmap[dt.kind])
    ifd += struct.pack(endian + "I", 0)
    body = b""
    if n_strips > 1:
        body += struct.pack(f"{endian}{n_strips}I", *offs)
        body += struct.pack(
            f"{endian}{n_strips}I", *(len(s) for s in strips)
        )
    bo = b"II" if endian == "<" else b"MM"
    with open(path, "wb") as fh:
        fh.write(
            bo
            + struct.pack(endian + "H", 42)
            + struct.pack(endian + "I", ifd_off)
            + ifd
            + body
            + b"".join(strips)
        )


@pytest.mark.parametrize(
    "compression,predictor,dtype,endian,rps",
    [
        (5, 1, "uint8", "<", None),
        (5, 2, "uint8", "<", 3),
        (5, 2, "uint16", ">", 4),
        (32773, 1, "uint8", "<", None),
        (32773, 1, "uint16", ">", 2),
        (1, 2, "uint16", "<", None),
        # Deflate strips: stdlib zlib is the independent reference
        (8, 1, "uint8", "<", None),
        (8, 2, "uint16", ">", 3),
        (32946, 1, "uint16", "<", 4),
    ],
)
def test_tiff_compressed_roundtrip(compression, predictor, dtype, endian, rps):
    """LZW / PackBits / predictor TIFFs round-trip bit-exactly through
    the pure-Python decoder (smooth gradient data — compressible)."""
    rng = np.random.RandomState(11)
    base = np.cumsum(rng.randint(0, 3, size=(10, 9)), axis=1)
    img = base.astype(dtype)
    import io, tempfile, os

    fd, fp = tempfile.mkstemp(suffix=".tif")
    os.close(fd)
    try:
        _write_tiff_ex(
            fp, img, endian, compression=compression,
            predictor=predictor, rows_per_strip=rps or img.shape[0],
        )
        with open(fp, "rb") as fh:
            content = fh.read()
        h, w, dt, px = bf._decode_tiff(content, {})
        back = np.frombuffer(px, dtype=dt).reshape(h, w)
        assert back.dtype == img.dtype
        assert np.array_equal(back, img)
    finally:
        os.unlink(fp)


def test_lzw_wide_codes_roundtrip():
    """Incompressible data pushes the LZW table through every code width
    (9->12 bits) and past the clear threshold — the width-change pairing
    between encoder and decoder is what this proves."""
    rng = np.random.RandomState(13)
    data = rng.randint(0, 256, size=200_000, dtype=np.uint8).tobytes()
    assert bf._lzw_decode(_lzw_encode(data)) == data


def test_packbits_long_runs_roundtrip():
    data = b"\x00" * 300 + bytes(range(256)) * 2 + b"\xff" * 129
    assert bf._packbits_decode(_packbits_encode(data)) == data


def test_tiff_rgb_luma(tmp_path):
    """Chunky RGB TIFF collapses to the BT.601 integer luma plane —
    across codecs, the per-channel predictor, byte orders and strip
    splits."""
    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    expect = (
        (299 * rgb[..., 0].astype(np.int64)
         + 587 * rgb[..., 1].astype(np.int64)
         + 114 * rgb[..., 2].astype(np.int64) + 500) // 1000
    ).astype(np.uint8)
    for comp, pred, endian, rps in [
        (1, 1, "<", None), (5, 2, "<", 3), (32773, 1, ">", 2),
        (8, 2, ">", 3),
    ]:
        path = tmp_path / f"rgb_{comp}_{pred}_{rps}.tif"
        _write_tiff_ex(path, rgb, endian=endian, compression=comp,
                       predictor=pred, rows_per_strip=rps)
        h, w, dt, px = bf._decode_tiff(path.read_bytes(), {})
        assert (h, w, dt) == (7, 5, "uint8")
        assert np.array_equal(np.frombuffer(px, "u1").reshape(7, 5), expect)
    # 16-bit RGB keeps uint16 luma
    rgb16 = rng.integers(0, 65536, size=(3, 4, 3), dtype=np.uint16)
    path = tmp_path / "rgb16.tif"
    _write_tiff_ex(path, rgb16, endian=">", compression=5, predictor=2)
    h, w, dt, px = bf._decode_tiff(path.read_bytes(), {})
    assert dt == "uint16"
    expect16 = (
        (299 * rgb16[..., 0].astype(np.int64)
         + 587 * rgb16[..., 1].astype(np.int64)
         + 114 * rgb16[..., 2].astype(np.int64) + 500) // 1000
    ).astype(np.uint16)
    assert np.array_equal(np.frombuffer(px, "=u2").reshape(3, 4), expect16)


def test_tiff_planar_rgb_luma(tmp_path):
    """Separate-plane (PlanarConfiguration=2) RGB: strips are
    plane-major; predictor integrates within each plane."""
    rng = np.random.default_rng(31)
    rgb = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    expect = (
        (299 * rgb[..., 0].astype(np.int64)
         + 587 * rgb[..., 1].astype(np.int64)
         + 114 * rgb[..., 2].astype(np.int64) + 500) // 1000
    ).astype(np.uint8)
    for comp, pred, endian in [(1, 1, "<"), (5, 2, ">"), (32773, 1, "<"),
                               (8, 1, ">")]:
        path = tmp_path / f"planar_{comp}_{pred}.tif"
        _write_tiff_ex(path, rgb, endian=endian, compression=comp,
                       predictor=pred, planar=2)
        h, w, dt, px = bf._decode_tiff(path.read_bytes(), {})
        assert (h, w, dt) == (6, 5, "uint8")
        assert np.array_equal(
            np.frombuffer(px, "u1").reshape(6, 5), expect
        ), (comp, pred)


def test_tiff_unsupported_codec_raises():
    """JPEG-in-TIFF (Compression=7) must raise the documented
    NotImplementedError, not garbage-decode."""
    img = np.zeros((4, 4), dtype=np.uint8)
    import os, tempfile

    fd, fp = tempfile.mkstemp(suffix=".tif")
    os.close(fd)
    try:
        _write_tiff_ex(fp, img, "<", compression=1)
        with open(fp, "rb") as fh:
            content = bytearray(fh.read())
        # Compression tag (259) value: patch 1 -> 7 in place
        idx = content.find(b"\x03\x01\x03\x00\x01\x00\x00\x00\x01\x00")
        assert idx > 0
        content[idx + 8] = 7
        with pytest.raises(NotImplementedError):
            bf._decode_tiff(bytes(content), {})
    finally:
        os.unlink(fp)


def test_read_stack_lzw_tiff_roundtrip(spark, tmp_path):
    """R1 ingest path with LZW-compressed slices end-to-end through
    read_stack (binaryFile source -> mapInPandas decode)."""
    rng = np.random.RandomState(17)
    vol = np.cumsum(
        rng.randint(0, 5, size=(3, 6, 5)), axis=2
    ).astype("uint16")
    d = tmp_path / "lzwstack"
    d.mkdir()
    for i in range(vol.shape[0]):
        _write_tiff_ex(
            str(d / f"s_{i:03d}.tif"), vol[i], "<",
            compression=5, predictor=2, rows_per_strip=2,
        )
    df = bf.read_stack(spark, str(d), "scanL", "tiff", {}, glob="*.tif")
    back = ct.array_from_slices(df)
    assert back.dtype == vol.dtype
    assert np.array_equal(back, vol)


# --- PNG decoder (round-6: pure-Python zlib path) -----------------------


def _png_filter_rows(pix_rows, stride, bpp, filters):
    """Apply the REAL per-row filter math so decode must invert it."""
    out = bytearray()
    prev = bytearray(stride)
    for y, row_b in enumerate(pix_rows):
        row = bytearray(row_b)
        ft = filters[y % len(filters)]
        enc = bytearray(row)
        if ft == 1:
            for i in range(stride - 1, bpp - 1, -1):
                enc[i] = (row[i] - row[i - bpp]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                enc[i] = (row[i] - prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                enc[i] = (row[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (row[i] - pr) & 0xFF
        out.append(ft)
        out.extend(enc)
        prev = row
    return out


def _png_pack_rows(arr, bitdepth, channels):
    """(h, w[, channels]) int array -> list of per-row packed bytes."""
    import numpy as np

    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, _ = arr.shape
    rows = []
    for y in range(h):
        if bitdepth == 16:
            rows.append(arr[y].astype(">u2").tobytes())
        elif bitdepth == 8:
            rows.append(arr[y].astype("u1").tobytes())
        else:
            bits = ((arr[y, :, 0:1].astype(np.uint8)[..., None]
                     >> np.arange(bitdepth - 1, -1, -1)) & 1)
            flat = bits.reshape(-1)
            rows.append(np.packbits(flat).tobytes())
    return rows


def _png_encode(arr, bitdepth=8, filters=None, colortype=0, palette=None,
                interlace=0, extra_chunks=()):
    """Minimal PNG writer for tests: any color type, per-row filter
    choice, optional Adam7 interlacing."""
    import struct
    import zlib

    import numpy as np

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[colortype]
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w = arr.shape[:2]
    filters = filters or [0]
    bits_px = channels * bitdepth
    bpp = max(1, bits_px // 8)

    def pass_bytes(sub):
        stride = (sub.shape[1] * bits_px + 7) // 8
        return _png_filter_rows(
            _png_pack_rows(sub, bitdepth, channels), stride, bpp, filters
        )

    body = bytearray()
    if interlace == 0:
        body += pass_bytes(arr)
    else:
        adam7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                 (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        for x0, y0, dx, dy in adam7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                body += pass_bytes(sub)

    def chunk(ctype, cbody):
        return (
            struct.pack(">I", len(cbody))
            + ctype
            + cbody
            + struct.pack(">I", zlib.crc32(ctype + cbody) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, colortype, 0, 0,
                       interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    for ctype, cbody in extra_chunks:
        out += chunk(ctype, cbody)
    if colortype == 3:
        out += chunk(b"PLTE", bytes(palette))
    out += chunk(b"IDAT", zlib.compress(bytes(body))) + chunk(b"IEND", b"")
    return out


def test_png_decode_roundtrip_all_filters():
    import numpy as np

    from flexcalc_spark.sources import binaryfiles as bf

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    # one row per filter type, plus an extra None row
    content = _png_encode(arr, 8, filters=[0, 1, 2, 3, 4])
    h, w, dt, px = bf._decode_png(content, {})
    assert (h, w, dt) == (5, 9, "uint8")
    assert np.array_equal(np.frombuffer(px, "u1").reshape(5, 9), arr)


def test_png_decode_16bit_big_endian():
    import numpy as np

    from flexcalc_spark.sources import binaryfiles as bf

    arr = np.arange(12, dtype=np.uint16).reshape(3, 4) * 4097
    content = _png_encode(arr, 16, filters=[0, 2, 4])
    h, w, dt, px = bf._decode_png(content, {})
    assert (h, w, dt) == (3, 4, "uint16")
    assert np.array_equal(np.frombuffer(px, "=u2").reshape(3, 4), arr)


def _luma(rgb):
    import numpy as np

    r, g, b = (rgb[..., i].astype(np.int64) for i in range(3))
    return (299 * r + 587 * g + 114 * b + 500) // 1000


def test_png_truecolor_luma():
    import numpy as np

    from flexcalc_spark.sources import binaryfiles as bf

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    h, w, dt, px = bf._decode_png(
        _png_encode(rgb, 8, filters=[0, 1, 2, 3, 4], colortype=2), {}
    )
    assert (h, w, dt) == (6, 5, "uint8")
    assert np.array_equal(
        np.frombuffer(px, "u1").reshape(6, 5), _luma(rgb).astype(np.uint8)
    )
    # 16-bit RGB -> uint16 luma
    rgb16 = rng.integers(0, 65536, size=(3, 4, 3), dtype=np.uint16)
    h, w, dt, px = bf._decode_png(_png_encode(rgb16, 16, colortype=2), {})
    assert dt == "uint16"
    assert np.array_equal(
        np.frombuffer(px, "=u2").reshape(3, 4),
        _luma(rgb16).astype(np.uint16),
    )


def test_png_palette_and_subbyte_gray():
    import numpy as np

    from flexcalc_spark.sources import binaryfiles as bf

    rng = np.random.default_rng(5)
    # 4-bit palette image, 7 columns (odd -> padded final byte per row)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(5, 7), dtype=np.uint8)
    h, w, dt, px = bf._decode_png(
        _png_encode(idx, 4, colortype=3, palette=pal.tobytes(),
                    filters=[0, 2]),
        {},
    )
    assert (h, w, dt) == (5, 7, "uint8")
    expect = _luma(pal[idx]).astype(np.uint8)
    assert np.array_equal(np.frombuffer(px, "u1").reshape(5, 7), expect)
    # 1-bit and 2-bit grayscale expand exactly to 0..255
    for d in (1, 2):
        g = rng.integers(0, 1 << d, size=(4, 11), dtype=np.uint8)
        h, w, dt, px = bf._decode_png(_png_encode(g, d, colortype=0), {})
        assert dt == "uint8"
        assert np.array_equal(
            np.frombuffer(px, "u1").reshape(4, 11),
            (g.astype(np.int64) * 255 // ((1 << d) - 1)).astype(np.uint8),
        )


def test_png_alpha_dropped():
    import numpy as np

    from flexcalc_spark.sources import binaryfiles as bf

    rng = np.random.default_rng(3)
    ga = rng.integers(0, 256, size=(4, 6, 2), dtype=np.uint8)
    h, w, dt, px = bf._decode_png(
        _png_encode(ga, 8, colortype=4, filters=[4]), {}
    )
    assert np.array_equal(np.frombuffer(px, "u1").reshape(4, 6), ga[..., 0])
    rgba = rng.integers(0, 256, size=(4, 6, 4), dtype=np.uint8)
    h, w, dt, px = bf._decode_png(
        _png_encode(rgba, 8, colortype=6, filters=[3]), {}
    )
    assert np.array_equal(
        np.frombuffer(px, "u1").reshape(4, 6),
        _luma(rgba[..., :3]).astype(np.uint8),
    )


def test_png_adam7_interlace():
    import numpy as np

    from flexcalc_spark.sources import binaryfiles as bf

    rng = np.random.default_rng(9)
    # odd dims exercise the empty/partial pass edges
    for shape in [(9, 13), (1, 1), (2, 3), (8, 8)]:
        g = rng.integers(0, 256, size=shape, dtype=np.uint8)
        h, w, dt, px = bf._decode_png(
            _png_encode(g, 8, colortype=0, interlace=1,
                        filters=[0, 1, 2, 3, 4]),
            {},
        )
        assert (h, w) == shape
        assert np.array_equal(np.frombuffer(px, "u1").reshape(shape), g)
    # interlaced truecolor too
    rgb = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    h, w, dt, px = bf._decode_png(
        _png_encode(rgb, 8, colortype=2, interlace=1, filters=[2, 4]), {}
    )
    assert np.array_equal(
        np.frombuffer(px, "u1").reshape(11, 7), _luma(rgb).astype(np.uint8)
    )


def test_png_apng_decodes_default_image_and_corrupt_palette():
    import numpy as np
    import pytest

    from flexcalc_spark.sources import binaryfiles as bf

    # APNG: the ancillary acTL/fcTL/fdAT chunks must be IGNORED and the
    # default image (ordinary IDAT) decoded — the spec's designed
    # fallback for still consumers. fdAT placed after IDAT like real
    # encoders emit it.
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    blob = _png_encode(
        g, 8, colortype=0,
        extra_chunks=((b"acTL", b"\x00" * 8),
                      (b"fcTL", b"\x00" * 26)),
    )
    # splice an fdAT chunk in front of IEND
    import struct
    import zlib as _z

    iend = blob.rindex(b"IEND") - 4
    fdat_body = b"\x00\x00\x00\x01" + b"not-frame-pixels"
    fdat = (struct.pack(">I", len(fdat_body)) + b"fdAT" + fdat_body
            + struct.pack(">I", _z.crc32(b"fdAT" + fdat_body)))
    blob = blob[:iend] + fdat + blob[iend:]
    h, w, dt, px = bf._decode_png(blob, {})
    assert (h, w, dt) == (3, 4, "uint8")
    assert np.array_equal(np.frombuffer(px, "u1").reshape(3, 4), g)
    # palette index past PLTE end
    idx = np.full((2, 2), 5, dtype=np.uint8)
    blob = _png_encode(idx, 8, colortype=3, palette=bytes(9))  # 3 entries
    with pytest.raises(ValueError, match="palette"):
        bf._decode_png(blob, {})


# --- WAV decoder --------------------------------------------------------


def test_wav_decode_roundtrip_stereo16():
    import io
    import wave

    import numpy as np

    from flexcalc_spark.sources import binaryfiles as bf

    rng = np.random.default_rng(11)
    samples = rng.integers(-30000, 30000, size=(100, 2), dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(samples.tobytes())
    n_ch, n_samp, dt, px = bf._decode_wav(buf.getvalue(), {})
    assert (n_ch, n_samp, dt) == (2, 100, "int16")
    assert np.array_equal(
        np.frombuffer(px, "=i2").reshape(100, 2), samples
    )


def _wav_bytes(fmt_body, data):
    import struct

    return (
        b"RIFF" + struct.pack("<I", 20 + len(fmt_body) + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_wav_float_pcm_roundtrip():
    import struct

    import numpy as np

    from flexcalc_spark.sources import binaryfiles as bf

    rng = np.random.default_rng(13)
    for bits, np_dt in [(32, "<f4"), (64, "<f8")]:
        samples = rng.standard_normal((50, 2)).astype(np_dt)
        fmt = struct.pack("<HHIIHH", 3, 2, 8000, 8000 * bits // 4,
                          bits // 4, bits)
        n_ch, n_samp, dt, px = bf._decode_wav(
            _wav_bytes(fmt, samples.tobytes()), {}
        )
        assert (n_ch, n_samp) == (2, 50)
        assert dt == ("float32" if bits == 32 else "float64")
        assert np.array_equal(
            np.frombuffer(px, dt).reshape(50, 2), samples
        )


def test_wav_24bit_widens_to_int32_vs_stdlib_wave():
    """stdlib wave writes 24-bit PCM (sampwidth=3) — an independent
    producer; our decoder must widen each sample to int32 << 8."""
    import io
    import wave

    import numpy as np

    from flexcalc_spark.sources import binaryfiles as bf

    rng = np.random.default_rng(17)
    vals = rng.integers(-(2**23), 2**23, size=60, dtype=np.int32)
    le = vals.astype("<i4").tobytes()
    frames = b"".join(le[i * 4 : i * 4 + 3] for i in range(60))  # low 3 bytes
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(3)
        wv.setframerate(8000)
        wv.writeframes(frames)
    n_ch, n_samp, dt, px = bf._decode_wav(buf.getvalue(), {})
    assert (n_ch, n_samp, dt) == (1, 60, "int32")
    assert np.array_equal(np.frombuffer(px, "=i4"), vals << 8)


def test_wav_extensible_wrapper():
    import struct

    import numpy as np

    from flexcalc_spark.sources import binaryfiles as bf

    samples = (np.arange(40, dtype=np.int16) - 20).astype("<i2")
    # WAVE_FORMAT_EXTENSIBLE wrapping integer PCM (GUID starts 0x0001)
    guid = struct.pack("<H", 1) + b"\x00\x00" + bytes(12)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    fmt += struct.pack("<HHI", 22, 16, 0x4) + guid
    n_ch, n_samp, dt, px = bf._decode_wav(
        _wav_bytes(fmt, samples.tobytes()), {}
    )
    assert (n_ch, n_samp, dt) == (1, 40, "int16")
    assert np.array_equal(np.frombuffer(px, "=i2"), samples)


def test_wav_compressed_raises():
    import struct

    import pytest

    from flexcalc_spark.sources import binaryfiles as bf

    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 4000, 1, 4)  # MS ADPCM
    with pytest.raises(NotImplementedError):
        bf._decode_wav(_wav_bytes(fmt, b""), {})


# --- archive member expansion -------------------------------------------


def test_expand_archives_tar_zip_mixed(spark, tmp_path):
    """A directory mixing .tar, .tar.gz and .zip archives expands to
    one row per member with exact bytes (magic-byte dispatch)."""
    import io
    import tarfile
    import zipfile

    from flexcalc_spark.sources import binaryfiles as bf

    files = {f"d/{i}.bin": bytes([i]) * (i + 1) for i in range(5)}
    # plain tar
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in list(files.items())[:2]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    (tmp_path / "a.tar").write_bytes(buf.getvalue())
    # gzipped tar
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name, data in list(files.items())[2:4]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    (tmp_path / "b.tgz").write_bytes(buf.getvalue())
    # zip with a directory entry that must be skipped
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("d/", "")
        for name, data in list(files.items())[4:]:
            zf.writestr(name, data)
    (tmp_path / "c.zip").write_bytes(buf.getvalue())

    rows = bf.expand_archives(
        spark.read.format("binaryFile").load(str(tmp_path))
    ).collect()
    got = {r.member: bytes(r.content) for r in rows}
    assert got == files
    assert all(r.archive.rsplit("/", 1)[-1] in ("a.tar", "b.tgz", "c.zip")
               for r in rows)


def test_expand_archives_corrupt_raises(spark, tmp_path):
    """Every corrupt-input exception class must surface as the
    documented ValueError: plain garbage (ReadError), a TRUNCATED
    .tar.gz (EOFError — not an OSError!), and a zip whose deflate
    payload is bit-flipped (zlib.error) — the round-10 'leaks through
    the ValueError contract' class, second review pass."""
    import io
    import os
    import tarfile
    import zipfile

    from flexcalc_spark.sources import binaryfiles as bf

    def expand_one(name, data):
        d = tmp_path / name
        d.mkdir()
        (d / name).write_bytes(data)
        return bf.expand_archives(
            spark.read.format("binaryFile").load(str(d))
        ).collect()

    with pytest.raises(Exception, match="unreadable"):
        expand_one("bad.tar", b"definitely not a tar archive")
    # truncated gzip tar -> caught by the bounded pre-decompression
    # (round 12: the stream is inflated under the cap BEFORE tarfile)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        info = tarfile.TarInfo(name="x.bin")
        info.size = 4096
        tf.addfile(info, io.BytesIO(b"a" * 4096))
    with pytest.raises(Exception, match="unreadable|truncated"):
        expand_one("trunc.tgz", buf.getvalue()[: len(buf.getvalue()) // 2])
    # zip with corrupted deflate payload -> zlib.error from zf.read
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("y.bin", os.urandom(4096))
    blob = bytearray(buf.getvalue())
    blob[60] ^= 0xFF  # inside the first member's compressed data
    with pytest.raises(Exception, match="unreadable"):
        expand_one("corrupt.zip", bytes(blob))


def test_q_source_archive_matches_oracle(spark, duck):
    from flexcalc_spark.registry import ORACLES, QUERIES
    from tests.conftest import SF_DIR

    got = {
        tuple(r)
        for r in QUERIES["q_source_archive"](spark, SF_DIR).collect()
    }
    exp = {
        tuple(r) for r in duck.execute(ORACLES["q_source_archive"]).fetchall()
    }
    assert got == exp and len(got) > 0


def test_g711_tables_match_audioop_exactly():
    """All 512 expansion-table entries must equal the stdlib audioop
    reference implementation (an independent implementation of the
    same G.711 analytic definition)."""
    import numpy as np
    import pytest

    from flexcalc_spark.sources import binaryfiles as bf

    # audioop is REMOVED in Python 3.13+ (not merely deprecated): keep
    # the suite green on upgraded interpreters, run the entry-exact
    # check wherever the reference still ships
    audioop = pytest.importorskip("audioop")
    codes = bytes(range(256))
    ref_u = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    assert np.array_equal(bf._ULAW_TABLE, ref_u.astype(np.int16))
    assert np.array_equal(bf._ALAW_TABLE, ref_a.astype(np.int16))


def test_wav_g711_decode():
    import numpy as np

    from flexcalc_spark.sources import binaryfiles as bf

    rng = np.random.default_rng(23)
    codes = rng.integers(0, 256, size=120, dtype=np.uint8).tobytes()
    import struct

    for fmtcode, table in ((7, bf._ULAW_TABLE), (6, bf._ALAW_TABLE)):
        fmt = struct.pack("<HHIIHH", fmtcode, 2, 8000, 16000, 2, 8)
        n_ch, n_samp, dt, px = bf._decode_wav(_wav_bytes(fmt, codes), {})
        assert (n_ch, n_samp, dt) == (2, 60, "int16")
        expect = table[np.frombuffer(codes, "u1")]
        assert np.array_equal(np.frombuffer(px, "=i2"), expect)


def test_atomic_write_bytes_driver_side(tmp_path):
    """The designated safe-write primitive outside a TaskContext:
    publishes the full content under the final name, leaves no temp
    file behind, and two sequential writers to the same path each end
    with a complete (never interleaved) payload."""
    import os

    p = str(tmp_path / "out.bin")
    bf.atomic_write_bytes(p, b"A" * 4096)
    assert open(p, "rb").read() == b"A" * 4096
    bf.atomic_write_bytes(p, b"B" * 1024)
    assert open(p, "rb").read() == b"B" * 1024  # last writer wins, whole
    leftovers = [f for f in os.listdir(tmp_path) if f != "out.bin"]
    assert leftovers == []  # temp names are replaced away, not leaked


def test_tiff_corrupt_deflate_strip_raises(tmp_path):
    """A bit-flipped Deflate strip must surface as ValueError (the
    typed corrupt-bytes contract), never leak zlib.error."""
    img = np.cumsum(np.ones((6, 8), dtype=np.uint8), axis=1)
    path = tmp_path / "d.tif"
    _write_tiff_ex(path, img, compression=8)
    blob = bytearray(path.read_bytes())
    blob[-3] ^= 0xFF  # inside the (trailing) strip data
    with pytest.raises(ValueError):
        bf._decode_tiff(bytes(blob), {})


def _write_tiff_tiled(
    path, arr, endian="<", compression=1, predictor=1, tw=8, tl=4,
    planar=1,
):
    """Tiled TIFF writer (tags 322-325): row-major edge-padded tiles,
    per-tile horizontal differencing, gray or chunky RGB."""
    import struct
    import zlib

    kindmap = {"u": 1, "i": 2, "f": 3}
    h, w = arr.shape[:2]
    spp = arr.shape[2] if arr.ndim == 3 else 1
    a3 = arr.reshape(h, w, spp)
    dt = arr.dtype
    bps = dt.itemsize * 8
    enc = {1: lambda b: b, 5: _lzw_encode, 8: zlib.compress,
           32773: _packbits_encode}[compression]
    ta = -(-w // tw)
    td = -(-h // tl)
    padded = np.zeros((td * tl, ta * tw, spp), dtype=dt)
    padded[:h, :w] = a3
    tiles = []
    for ty in range(td):
        for tx in range(ta):
            t = padded[ty * tl:(ty + 1) * tl, tx * tw:(tx + 1) * tw].copy()
            if predictor == 2:
                t[:, 1:] = (t[:, 1:] - t[:, :-1]).astype(dt)
            tiles.append(enc(t.astype(dt.newbyteorder(endian)).tobytes()))
    n = len(tiles)
    n_tags = 11 + (1 if planar != 1 else 0)
    ifd_off = 8
    val_off = ifd_off + 2 + n_tags * 12 + 4
    arrays_sz = 2 * 4 * n if n > 1 else 0
    data_off = val_off + arrays_sz
    offs = []
    pos = data_off
    for t in tiles:
        offs.append(pos)
        pos += len(t)

    def tag(tid, typ, cnt, val):
        code = {3: "H", 4: "I"}[typ]
        raw = struct.pack(endian + code, val)
        raw += b"\x00" * (4 - len(raw))
        return struct.pack(endian + "HHI", tid, typ, cnt) + raw

    ifd = struct.pack(endian + "H", n_tags)
    ifd += tag(256, 4, 1, w)
    ifd += tag(257, 4, 1, h)
    ifd += tag(258, 3, 1, bps)
    ifd += tag(259, 3, 1, compression)
    ifd += tag(277, 3, 1, spp)
    if planar != 1:
        ifd += tag(284, 3, 1, planar)
    ifd += tag(317, 3, 1, predictor)
    ifd += tag(322, 4, 1, tw)
    ifd += tag(323, 4, 1, tl)
    if n > 1:
        ifd += tag(324, 4, n, val_off)
        ifd += tag(325, 4, n, val_off + 4 * n)
    else:
        ifd += tag(324, 4, 1, offs[0])
        ifd += tag(325, 4, 1, len(tiles[0]))
    ifd += tag(339, 3, 1, kindmap[dt.kind])
    ifd += struct.pack(endian + "I", 0)
    body = b""
    if n > 1:
        body += struct.pack(f"{endian}{n}I", *offs)
        body += struct.pack(f"{endian}{n}I", *(len(t) for t in tiles))
    bo = b"II" if endian == "<" else b"MM"
    with open(path, "wb") as fh:
        fh.write(
            bo
            + struct.pack(endian + "H", 42)
            + struct.pack(endian + "I", ifd_off)
            + ifd
            + body
            + b"".join(tiles)
        )


@pytest.mark.parametrize(
    "compression,predictor,dtype,endian,tw,tl",
    [
        (1, 1, "uint8", "<", 8, 4),    # multi-tile with edge padding
        (1, 2, "uint16", ">", 4, 4),
        (5, 2, "uint8", "<", 4, 8),
        (8, 1, "uint16", "<", 8, 8),
        (8, 2, "uint8", ">", 4, 4),
        (32773, 1, "uint16", ">", 16, 16),  # single padded tile
    ],
)
def test_tiff_tiled_roundtrip(tmp_path, compression, predictor, dtype,
                              endian, tw, tl):
    """Tiled TIFFs (TIFF 6.0 §15) round-trip bit-exactly: row-major
    grid, edge tiles padded then cropped, per-tile predictor, every
    supported codec."""
    rng = np.random.RandomState(13)
    img = np.cumsum(rng.randint(0, 3, size=(10, 9)), axis=1).astype(dtype)
    path = tmp_path / f"t_{compression}_{predictor}_{tw}x{tl}.tif"
    _write_tiff_tiled(path, img, endian=endian, compression=compression,
                      predictor=predictor, tw=tw, tl=tl)
    h, w, dt, px = bf._decode_tiff(path.read_bytes(), {})
    assert (h, w, dt) == (10, 9, dtype)
    assert np.array_equal(np.frombuffer(px, dtype).reshape(h, w), img)


def test_tiff_tiled_rgb_luma(tmp_path):
    """Tiled chunky RGB collapses to the BT.601 integer luma plane."""
    rng = np.random.default_rng(17)
    rgb = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    expect = (
        (299 * rgb[..., 0].astype(np.int64)
         + 587 * rgb[..., 1].astype(np.int64)
         + 114 * rgb[..., 2].astype(np.int64) + 500) // 1000
    ).astype(np.uint8)
    path = tmp_path / "rgb_tiled.tif"
    _write_tiff_tiled(path, rgb, endian=">", compression=8, predictor=2,
                      tw=4, tl=4)
    h, w, dt, px = bf._decode_tiff(path.read_bytes(), {})
    assert (h, w, dt) == (9, 7, "uint8")
    assert np.array_equal(np.frombuffer(px, "u1").reshape(9, 7), expect)


def test_tiff_tiled_error_paths(tmp_path):
    """Tiled planar raises the named NotImplementedError; a tile-count
    mismatch raises ValueError."""
    img = np.ones((8, 8), dtype=np.uint8)
    rgb = np.ones((8, 8, 3), dtype=np.uint8)
    path = tmp_path / "p.tif"
    _write_tiff_tiled(path, rgb, tw=4, tl=4, planar=2)
    with pytest.raises(NotImplementedError, match="planar"):
        bf._decode_tiff(path.read_bytes(), {})
    path2 = tmp_path / "m.tif"
    _write_tiff_tiled(path2, img, tw=4, tl=4)
    blob = bytearray(path2.read_bytes())
    # corrupt TileWidth (tag 322 value) to force a grid mismatch
    import struct
    i = blob.find(struct.pack("<HHI", 322, 4, 1))
    struct.pack_into("<I", blob, i + 8, 64)
    with pytest.raises(ValueError, match="tile"):
        bf._decode_tiff(bytes(blob), {})


def _write_tiff_multipage(path, pages, endian="<"):
    """Chained-IFD multi-page TIFF (uncompressed gray, one strip per
    page) — the slice-stack container some CT archives ship as one
    file."""
    import struct

    bo = b"II" if endian == "<" else b"MM"
    out = bytearray(
        bo + struct.pack(endian + "H", 42) + b"\x00\x00\x00\x00"
    )
    next_ptr = 4  # header's first-IFD pointer, patched per page
    for arr in pages:
        h, w = arr.shape
        data = arr.astype(arr.dtype.newbyteorder(endian)).tobytes()
        n_tags = 8
        ifd_off = len(out)
        struct.pack_into(endian + "I", out, next_ptr, ifd_off)
        data_off = ifd_off + 2 + n_tags * 12 + 4

        def tag(tid, typ, cnt, val):
            code = {3: "H", 4: "I"}[typ]
            raw = struct.pack(endian + code, val)
            raw += b"\x00" * (4 - len(raw))
            return struct.pack(endian + "HHI", tid, typ, cnt) + raw

        ifd = struct.pack(endian + "H", n_tags)
        ifd += tag(256, 4, 1, w)
        ifd += tag(257, 4, 1, h)
        ifd += tag(258, 3, 1, arr.dtype.itemsize * 8)
        ifd += tag(259, 3, 1, 1)
        ifd += tag(273, 4, 1, data_off)
        ifd += tag(277, 3, 1, 1)
        ifd += tag(279, 4, 1, len(data))
        ifd += tag(339, 3, 1, 1)
        next_ptr = ifd_off + 2 + n_tags * 12
        ifd += b"\x00\x00\x00\x00"  # next-IFD terminator (patched)
        out += ifd + data
    path_bytes = bytes(out)
    with open(path, "wb") as fh:
        fh.write(path_bytes)


def test_tiff_multipage_pages_decode(tmp_path):
    """Every page of a chained-IFD stack decodes via meta['page'];
    tiff_page_count drives the fan-out; page 0 stays the default
    (still-consumer behavior); past-the-end raises."""
    rng = np.random.RandomState(3)
    pages = [
        rng.randint(0, 4096, size=(5 + i, 7)).astype(np.uint16)
        for i in range(3)
    ]
    path = tmp_path / "stack.tif"
    _write_tiff_multipage(path, pages, endian=">")
    blob = path.read_bytes()
    assert bf.tiff_page_count(blob) == 3
    for i, img in enumerate(pages):
        h, w, dt, px = bf._decode_tiff(blob, {"page": i})
        assert (h, w, dt) == (img.shape[0], 7, "uint16")
        assert np.array_equal(
            np.frombuffer(px, np.uint16).reshape(h, w), img
        )
    # default = first page
    h, w, _, px = bf._decode_tiff(blob, {})
    assert np.array_equal(
        np.frombuffer(px, np.uint16).reshape(h, w), pages[0]
    )
    with pytest.raises(ValueError, match="page"):
        bf._decode_tiff(blob, {"page": 3})


# ---------------------------------------------------------------------------
# .jsonl.zst shard source (q_source_jsonl_zst)
# ---------------------------------------------------------------------------


def test_q_source_jsonl_zst_matches_oracle(spark, duck):
    from flexcalc_spark.registry import ORACLES, QUERIES
    from tests.conftest import SF_DIR

    got = {
        tuple(r)
        for r in QUERIES["q_source_jsonl_zst"](spark, SF_DIR).collect()
    }
    exp = {
        tuple(r)
        for r in duck.execute(ORACLES["q_source_jsonl_zst"]).fetchall()
    }
    assert got == exp and len(got) > 0


def test_read_jsonl_zst_entropy_coded_shard(spark, tmp_path):
    """The read path must accept REAL zstd frames, not just our
    store-mode writes: one shard is compressed by the official zstd-jni
    at level 3 (Huffman literals + FSE sequences), one by our store
    mode, and both must parse to the same relation."""
    import json

    from flexcalc_spark.operators.sinks import read_jsonl_zst
    from flexcalc_spark.sources import zstdcodec

    rows = [
        {"doc_id": i, "text": None if i % 7 == 0 else f"döc {i} " * 20,
         "lang": ["en", "de", "fr"][i % 3], "source": "web",
         "n_chars": i * 3}
        for i in range(500)
    ]
    half = len(rows) // 2
    payload_a = ("\n".join(
        json.dumps(r, ensure_ascii=False, sort_keys=True,
                   separators=(",", ":")) for r in rows[:half]
    ) + "\n").encode("utf-8")
    payload_b = ("\n".join(
        json.dumps(r, ensure_ascii=False, sort_keys=True,
                   separators=(",", ":")) for r in rows[half:]
    ) + "\n").encode("utf-8")
    jzc = spark._jvm.com.github.luben.zstd.Zstd
    (tmp_path / "a.jsonl.zst").write_bytes(
        bytes(jzc.compress(bytearray(payload_a), 3)))
    (tmp_path / "b.jsonl.zst").write_bytes(zstdcodec.compress(payload_b))
    got = read_jsonl_zst(
        spark, str(tmp_path),
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).collect()
    got_rows = sorted(
        (r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in got
    )
    want_rows = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
        for r in rows
    )
    assert got_rows == want_rows


def test_read_jsonl_zst_unicode_line_separators(spark, tmp_path):
    """json.dumps(ensure_ascii=False) legally leaves U+2028/U+2029/
    U+0085 unescaped inside string values; the reader must split
    records on newline framing ONLY (splitlines() would shatter such a
    record into unparseable fragments -- r11 review finding). CRLF
    framing from external writers is also accepted."""
    import json

    from flexcalc_spark.operators.sinks import read_jsonl_zst
    from flexcalc_spark.sources import zstdcodec

    tricky = "line sep \u2028 and \u2029 and nel \u0085 end"
    rows = [
        {"doc_id": 1, "text": tricky,
         "lang": "en", "source": "web", "n_chars": 10},
        {"doc_id": 2, "text": "plain", "lang": "de", "source": "web",
         "n_chars": 5},
    ]
    body = "\r\n".join(
        json.dumps(r, ensure_ascii=False, sort_keys=True,
                   separators=(",", ":")) for r in rows
    ) + "\r\n"
    assert "\u2028" in body  # the hazard is actually present unescaped
    (tmp_path / "u.jsonl.zst").write_bytes(
        zstdcodec.compress(body.encode("utf-8")))
    got = sorted(
        (r.doc_id, r.text)
        for r in read_jsonl_zst(
            spark, str(tmp_path),
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        ).collect()
    )
    assert got == [(1, tricky), (2, "plain")]


def test_q_source_jsonl_zst_null_fields_round_trip(spark, duck, tmp_path):
    """Engineered micro-corpus with NULLs in every nullable column
    (lang/source/text/n_chars): str(None) would write the string
    "None" where the oracle groups under SQL NULL, and int(None)
    would crash the writer — every field must round-trip as JSON null
    (r11 review finding; the fixture currently has non-null lang and
    source, so only a regen would expose this without the pin)."""
    import duckdb as _duck
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flexcalc_spark.registry import ORACLES, QUERIES

    rows = {
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["alpha", None, "gamma", "delta", None],
        "lang": ["en", None, "en", None, "de"],
        "source": ["web", "web", None, None, "news"],
        "n_chars": [5, None, 5, 5, None],
    }
    pq.write_table(
        pa.table({
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "source": pa.array(rows["source"], pa.string()),
            "n_chars": pa.array(rows["n_chars"], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        tuple(r)
        for r in QUERIES["q_source_jsonl_zst"](spark,
                                               str(tmp_path)).collect()
    }
    con = _duck.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = {
        tuple(r)
        for r in con.execute(ORACLES["q_source_jsonl_zst"]).fetchall()
    }
    assert got == exp and len(got) == 5  # every (lang, source) combo


def test_png_huge_header_dims_raise_valueerror():
    """A crafted IHDR (w=h=2^24) with a tiny IDAT must fail the codec
    contract's ValueError BEFORE any dimension-driven allocation —
    previously bytearray(h*stride)/np.zeros sized from the header could
    raise MemoryError first (ADVICE r11 untrusted-bytes posture)."""
    import struct
    import zlib

    from flexcalc_spark.sources import binaryfiles as bf

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    for interlace in (0, 1):
        ihdr = struct.pack(">IIBBBBB", 1 << 24, 1 << 24, 8, 0, 0, 0,
                           interlace)
        png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(b"\x00" * 16))
               + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="decode bound"):
            bf._decode_png(png, {})
    # moderate dims that pass a byte-stream bound but widen to multi-GiB
    # int64 (the review bypass: 15000x15000 RGBA) must also refuse
    ihdr = struct.pack(">IIBBBBB", 15000, 15000, 8, 6, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"\x00" * 16))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="decode bound"):
        bf._decode_png(png, {})


def test_tiff_decompressors_capped_during_decode():
    """ADVICE r11 posture class: every TIFF codec bounds output DURING
    decode when the caller knows the expected size — LZW is otherwise a
    QUADRATIC bomb (entry length grows per code), deflate ~1000:1, and
    PackBits ~64:1, all before the caller-side length check runs."""
    import zlib

    from flexcalc_spark.sources import binaryfiles as bf

    with pytest.raises(ValueError, match="LZW output exceeds"):
        bf._lzw_decode(_lzw_encode(b"A" * 100_000), max_size=1000)
    with pytest.raises(ValueError, match="PackBits output exceeds"):
        bf._packbits_decode(b"\x81A", max_size=10)   # 128-byte run
    with pytest.raises(ValueError, match="deflate output exceeds"):
        bf._tiff_deflate_decode(zlib.compress(b"\x00" * 100_000),
                                max_size=100)
    # valid data under the cap still round-trips through each codec
    blob = bytes(range(256)) * 4
    assert bf._lzw_decode(_lzw_encode(blob), max_size=len(blob)) == blob
    assert bf._packbits_decode(_packbits_encode(blob),
                               max_size=len(blob)) == blob
    assert bf._tiff_deflate_decode(zlib.compress(blob),
                                   max_size=len(blob)) == blob


def test_tiff_huge_tile_dims_raise_valueerror():
    """Crafted TileWidth/TileLength (65535x65535 with one declared
    tile) must fail the ValueError contract BEFORE the padded plane is
    allocated from header fields (JPEG's SOF guard precedent)."""
    import struct

    from flexcalc_spark.sources import binaryfiles as bf

    entries = [(256, 8), (257, 4), (322, 65535), (323, 65535), (324, 200)]
    ifd = struct.pack("<H", len(entries))
    for tag, val in entries:
        ifd += struct.pack("<HHII", tag, 4, 1, val)
    ifd += struct.pack("<I", 0)
    tif = b"II" + struct.pack("<HI", 42, 8) + ifd + b"\x00" * 64
    with pytest.raises(ValueError, match="decode bound"):
        bf._decode_tiff(tif, {})


def test_packbits_truncated_runs_raise_valueerror():
    """A control byte whose run extends past the stream must raise the
    codec contract's ValueError, not IndexError (repeat) or silently
    truncate (literal)."""
    from flexcalc_spark.sources import binaryfiles as bf

    with pytest.raises(ValueError, match="truncated repeat"):
        bf._packbits_decode(b"\x81")          # repeat, no byte follows
    with pytest.raises(ValueError, match="truncated literal"):
        bf._packbits_decode(b"\x05AB")        # claims 6 literals, has 2


def test_image_audio_decoder_mutation_sweep(tmp_path):
    """The repo-wide typed-error contract, extended to the image/audio
    dispatch boundary (the zstd/snappy/WARC mutation-sweep precedent):
    every DECODERS entry must either decode a mutated file or raise
    exactly ValueError / NotImplementedError — struct.error, KeyError,
    ZeroDivisionError, zlib.error etc. from truncated or bit-flipped
    bytes are normalized by the _typed wrapper. Deterministic sweep:
    truncations, bit flips, byte overwrites over bases that exercise
    the PNG (plain + interlaced), TIFF (LZW + PackBits strips), and
    WAV (PCM16) paths."""
    import random
    import struct

    from flexcalc_spark.sources import binaryfiles as bf

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    p5 = tmp_path / "lzw.tif"
    p32773 = tmp_path / "pb.tif"
    _write_tiff_ex(p5, gray, compression=5, rows_per_strip=4)
    _write_tiff_ex(p32773, gray, compression=32773, rows_per_strip=4)
    pcm = (np.arange(400, dtype=np.int16) * 37 % 20000).tobytes()
    bases = [
        ("png", _png_encode(gray, 8, colortype=0)),
        ("png", _png_encode(rgb, 8, colortype=2, interlace=1,
                            filters=[2, 4])),
        ("tiff", p5.read_bytes()),
        ("tiff", p32773.read_bytes()),
        ("wav", _wav_bytes(struct.pack("<HHIIHH", 1, 2, 8000, 32000,
                                       4, 16), pcm)),
    ]
    mrng = random.Random(0xC0DEC)
    checked = 0
    for fmt, base in bases:
        dec = bf.DECODERS[fmt]
        for _ in range(150):
            mutated = bytearray(base)
            op = mrng.randrange(3)
            if op == 0 and len(mutated) > 8:      # truncate
                del mutated[mrng.randrange(4, len(mutated)):]
            elif op == 1:                          # bit flip
                mutated[mrng.randrange(len(mutated))] ^= \
                    1 << mrng.randrange(8)
            else:                                  # byte overwrite
                mutated[mrng.randrange(len(mutated))] = mrng.randrange(256)
            try:
                dec(bytes(mutated), {})
            except (ValueError, NotImplementedError):
                pass                               # the contract
            # any OTHER exception type propagates and fails the test
            checked += 1
    assert checked == len(bases) * 150


def test_tiff_huge_strip_dims_raise_valueerror():
    """The strip path needs the same 2^28-sample bound as the tile
    path: `expected` is header-derived, so crafted w/h would otherwise
    let LZW strips materialize multi-GB before the length check."""
    import struct

    from flexcalc_spark.sources import binaryfiles as bf

    entries = [(256, 100_000), (257, 100_000), (273, 200)]
    ifd = struct.pack("<H", len(entries))
    for tag, val in entries:
        ifd += struct.pack("<HHII", tag, 4, 1, val)
    ifd += struct.pack("<I", 0)
    tif = b"II" + struct.pack("<HI", 42, 8) + ifd + b"\x00" * 64
    with pytest.raises(ValueError, match="decode bound"):
        bf._decode_tiff(tif, {})


def test_archive_members_capped_at_untrusted_output_bound(monkeypatch):
    """Zip/tar bombs: cumulative DECLARED member sizes are capped by
    the shared untrusted-bytes ceiling before each member is read
    (policy monkeypatched small so no bomb is materialized)."""
    import io
    import tarfile
    import zipfile

    from flexcalc_spark.sources import binaryfiles as bf
    from flexcalc_spark.sources import zstdcodec

    monkeypatch.setattr(zstdcodec, "untrusted_max_output",
                        lambda n: 1000)
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("fat.bin", b"\x00" * 50_000)
    with pytest.raises(ValueError, match="output bound"):
        bf._expand_blob("bomb.zip", zbuf.getvalue())
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
        info = tarfile.TarInfo("fat.bin")
        info.size = 50_000
        tf.addfile(info, io.BytesIO(b"\x00" * 50_000))
    with pytest.raises(ValueError, match="output bound"):
        bf._expand_blob("bomb.tar.gz", tbuf.getvalue())
    # under the cap expansion is unchanged
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("a.txt", b"ok")
    assert bf._expand_blob("a.zip", zbuf.getvalue()) == [
        ("a.zip", "a.txt", b"ok")]


def test_tar_header_walk_bounded(monkeypatch):
    """A tar.gz of many ZERO-size members is a bomb whose payload
    sizes never trip the member-size cap — the lazy iteration bounds
    the decompressed header walk itself (review finding, round 12)."""
    import io
    import tarfile

    from flexcalc_spark.sources import binaryfiles as bf
    from flexcalc_spark.sources import zstdcodec

    monkeypatch.setattr(zstdcodec, "untrusted_max_output",
                        lambda n: 1000)
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
        for i in range(10):                      # walk ~10 KiB > cap
            info = tarfile.TarInfo(f"empty{i}")
            tf.addfile(info)
    with pytest.raises(ValueError, match="output bound"):
        bf._expand_blob("headers.tar.gz", tbuf.getvalue())


def test_tar_pax_pseudo_member_bounded(monkeypatch):
    """The REAL tar-bomb gulp site (round-12 review, measured): pax /
    GNU-longname pseudo-member data is materialized inside
    TarFile.next() — even during open() for the first member — where
    no member-loop check can fire. The decompressed stream is now
    pre-bounded before tarfile parses it, so a 50 KB pax record behind
    a 10 KB cap raises instead of being read whole. The match is
    pinned to the PRE-DECOMPRESSION message ('stream exceeds'): the
    old loop-check code also raised eventually, but only AFTER the
    gulp and with 'walk exceeds' — so this test fails on it."""
    import io
    import tarfile

    from flexcalc_spark.sources import binaryfiles as bf
    from flexcalc_spark.sources import zstdcodec

    monkeypatch.setattr(zstdcodec, "untrusted_max_output",
                        lambda n: 10_000)
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz",
                      format=tarfile.PAX_FORMAT) as tf:
        info = tarfile.TarInfo("x" * 50_000)   # forces a ~50 KB pax
        tf.addfile(info)                        # 'path' record
    with pytest.raises(ValueError, match="stream exceeds"):
        bf._expand_blob("paxbomb.tar.gz", tbuf.getvalue())


def test_tar_dataless_member_with_bogus_size_still_expands():
    """Regression pin for the round-12 false-positive: a symlink whose
    size FIELD is nonzero stores no data (tarfile parses it fine and
    seeks past nothing), so an extent-style check on declared sizes
    would wrongly reject the archive. It must expand normally."""
    import io
    import tarfile

    from flexcalc_spark.sources import binaryfiles as bf

    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        link = tarfile.TarInfo("link")
        link.type = tarfile.SYMTYPE
        link.linkname = "target"
        link.size = 50_000                      # bogus: no data follows
        tf.addfile(link)
        ok = tarfile.TarInfo("after.txt")
        ok.size = 2
        tf.addfile(ok, io.BytesIO(b"hi"))
    rows = bf._expand_blob("links.tar", tbuf.getvalue())
    assert rows == [("links.tar", "after.txt", b"hi")]


def test_tar_mode_r_colon_blocks_unsniffed_codecs(monkeypatch):
    """tarfile must never decompress anything itself (mode='r:'): with
    the default 'r:*' a legacy-LZMA (FORMAT_ALONE) container bypasses
    the pre-decompression cap entirely — measured 28 KB in, 608 MB
    materialized under a 10 KB cap inside open() (round-12 pass 6).
    Such containers are now rejected as unreadable, bounded."""
    import io
    import lzma
    import tarfile

    from flexcalc_spark.sources import binaryfiles as bf
    from flexcalc_spark.sources import zstdcodec

    monkeypatch.setattr(zstdcodec, "untrusted_max_output",
                        lambda n: 10_000)
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w",
                      format=tarfile.PAX_FORMAT) as tf:
        tf.addfile(tarfile.TarInfo("x" * 50_000))  # big pax record
    alone = lzma.compress(tbuf.getvalue(), format=lzma.FORMAT_ALONE)
    with pytest.raises(ValueError, match="unreadable"):
        bf._expand_blob("bomb.tar.lzma", alone)


def test_tar_first_member_named_like_codec_magic_expands():
    """A PLAIN tar whose first member name starts with a codec magic
    ('BZh...') must not be misdetected as bz2 — the block-0 header
    checksum gate routes it straight to tarfile (round-12 pass 6
    false-reject)."""
    import io
    import tarfile

    from flexcalc_spark.sources import binaryfiles as bf

    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        info = tarfile.TarInfo("BZh_notes.txt")
        info.size = 5
        tf.addfile(info, io.BytesIO(b"hello"))
    rows = bf._expand_blob("plain.tar", tbuf.getvalue())
    assert rows == [("plain.tar", "BZh_notes.txt", b"hello")]
