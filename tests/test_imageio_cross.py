"""Image codecs vs the JDK's official javax.imageio implementations.

The TIFF/PNG decoders (binaryfiles.py) and the JPEG codec
(jpegcodec.py) were verified by spec-literal streams and lockstep
encoders; this module raises them to the repo's cross-implementation
standard (the snappy/avro/zstd precedent — "check the classpath
FIRST"): JDK 17 ships ImageIO plugins for TIFF (with LZW / Deflate /
ZLib / PackBits writers), PNG, and baseline JPEG, reachable via py4j.

Directions covered:
- ImageIO-written TIFF (gray 8/16-bit, chunky RGB; every compression
  our decoder claims) -> our decoder, pixel-exact (lossless).
- OUR TIFF writer (the tests' spec-literal one, incl. the horizontal
  predictor) -> ImageIO reader, pixel-exact — which independently
  certifies the lockstep encoder the LZW round-trip tests lean on.
- ImageIO-written PNG (gray 8/16, RGB) -> our decoder, pixel-exact.
- ImageIO-written baseline JPEG -> our decoder, and OUR encoder ->
  ImageIO reader: lossy, so agreement is within the T.81 Annex-A IDCT
  tolerance (|diff| <= 1 per sample against the reference's own
  decode of the same bytes).

RGB collapses to the BT.601 integer luma plane on our side (the
single-plane decoder contract), so RGB expectations run through
binaryfiles._bt601_luma. BufferedImage data elements for
TYPE_3BYTE_BGR are band-ordered R,G,B (the BGR refers to the in-file
DataBuffer layout, not the API order) — probed, not assumed.
"""

from __future__ import annotations

import numpy as np
import pytest

from flexcalc_spark.sources import binaryfiles as bf
from flexcalc_spark.sources import jpegcodec as jc

from test_sources import _write_tiff_ex


def _rng():
    return np.random.RandomState(5)


def _luma(rgb: np.ndarray) -> np.ndarray:
    return bf._bt601_luma(
        rgb[:, :, 0].astype(np.int64),
        rgb[:, :, 1].astype(np.int64),
        rgb[:, :, 2].astype(np.int64),
    )


def _to_buffered(spark, arr: np.ndarray):
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    if arr.ndim == 3:
        h, w, _ = arr.shape
        bi = BI(w, h, BI.TYPE_3BYTE_BGR)
        bi.getRaster().setDataElements(0, 0, w, h, bytearray(arr.tobytes()))
    elif arr.dtype == np.uint16:
        h, w = arr.shape
        bi = BI(w, h, BI.TYPE_USHORT_GRAY)
        flat = arr.astype(np.int16).ravel()
        ja = spark._sc._gateway.new_array(jvm.short, len(flat))
        for i, v in enumerate(flat):
            ja[i] = int(v)
        bi.getRaster().setDataElements(0, 0, w, h, ja)
    else:
        h, w = arr.shape
        bi = BI(w, h, BI.TYPE_BYTE_GRAY)
        bi.getRaster().setDataElements(0, 0, w, h, bytearray(arr.tobytes()))
    return bi


def _java_write(spark, tmp_path, name, fmt, arr, compression=None,
                quality=None) -> bytes:
    jvm = spark._jvm
    IIO = jvm.javax.imageio.ImageIO
    bi = _to_buffered(spark, arr)
    path = str(tmp_path / name)
    wr = IIO.getImageWritersByFormatName(fmt).next()
    ios = IIO.createImageOutputStream(jvm.java.io.File(path))
    wr.setOutput(ios)
    param = wr.getDefaultWriteParam()
    if compression is not None:
        param.setCompressionMode(
            jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(compression)
    if quality is not None:
        param.setCompressionMode(
            jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(float(quality))
    wr.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.close()
    wr.dispose()
    with open(path, "rb") as fh:
        return fh.read()


def _java_read_gray8(spark, path: str) -> np.ndarray:
    jvm = spark._jvm
    bi = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
    w, h = bi.getWidth(), bi.getHeight()
    jarr = bi.getRaster().getDataElements(0, 0, w, h, None)
    return np.frombuffer(bytes(jarr), dtype=np.uint8).reshape(h, w)


# ---------------------------------------------------------------------------
# TIFF: reference writer -> our decoder
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("compression",
                         [None, "LZW", "PackBits", "Deflate", "ZLib"])
def test_java_tiff_gray8_to_ours(spark, tmp_path, compression):
    g8 = _rng().randint(0, 256, size=(23, 37), dtype=np.uint8)
    c = _java_write(spark, tmp_path, f"g8_{compression}.tif", "tiff", g8,
                    compression=compression)  # None -> writer default (raw)
    h, w, dt, px = bf._decode_tiff(c, {})
    got = np.frombuffer(px, dtype=dt).reshape(h, w)
    assert np.array_equal(got, g8)


@pytest.mark.parametrize("compression", ["LZW", "Deflate"])
def test_java_tiff_gray16_to_ours(spark, tmp_path, compression):
    g16 = _rng().randint(0, 65536, size=(19, 31), dtype=np.uint16)
    c = _java_write(spark, tmp_path, f"g16_{compression}.tif", "tiff", g16,
                    compression=compression)
    h, w, dt, px = bf._decode_tiff(c, {})
    got = np.frombuffer(px, dtype=dt).reshape(h, w)
    assert np.array_equal(got.astype(np.uint16), g16)


@pytest.mark.parametrize("compression", ["LZW", "PackBits", "Deflate"])
def test_java_tiff_rgb_to_ours(spark, tmp_path, compression):
    rgb = _rng().randint(0, 256, size=(17, 29, 3), dtype=np.uint8)
    c = _java_write(spark, tmp_path, f"rgb_{compression}.tif", "tiff", rgb,
                    compression=compression)
    h, w, dt, px = bf._decode_tiff(c, {})
    got = np.frombuffer(px, dtype=dt).reshape(h, w).astype(np.int64)
    assert np.array_equal(got, _luma(rgb))


# ---------------------------------------------------------------------------
# TIFF: our writer -> reference reader (certifies the lockstep encoder)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("compression,predictor",
                         [(1, 1), (5, 1), (5, 2), (8, 1), (32773, 1)])
def test_our_tiff_read_by_java(spark, tmp_path, compression, predictor):
    g8 = _rng().randint(0, 256, size=(23, 37), dtype=np.uint8)
    path = str(tmp_path / f"ours_{compression}_{predictor}.tif")
    _write_tiff_ex(path, g8, compression=compression, predictor=predictor)
    assert np.array_equal(_java_read_gray8(spark, path), g8)


# ---------------------------------------------------------------------------
# PNG: reference writer -> our decoder
# ---------------------------------------------------------------------------


def test_java_png_to_ours(spark, tmp_path):
    rng = _rng()
    g8 = rng.randint(0, 256, size=(23, 37), dtype=np.uint8)
    g16 = rng.randint(0, 65536, size=(19, 31), dtype=np.uint16)
    rgb = rng.randint(0, 256, size=(17, 29, 3), dtype=np.uint8)
    for name, arr in [("g8", g8), ("g16", g16), ("rgb", rgb)]:
        c = _java_write(spark, tmp_path, f"p_{name}.png", "png", arr)
        h, w, dt, px = bf._decode_png(c, {})
        got = np.frombuffer(px, dtype=dt).reshape(h, w)
        if name == "rgb":
            assert np.array_equal(got.astype(np.int64), _luma(arr)), name
        else:
            assert np.array_equal(got.astype(arr.dtype), arr), name


# ---------------------------------------------------------------------------
# JPEG: both directions within the T.81 IDCT tolerance
# ---------------------------------------------------------------------------


def _smooth_plane() -> np.ndarray:
    return (np.add.outer(np.arange(24) * 3, np.arange(40) * 2)
            % 200 + 20).astype(np.uint8)


def test_java_jpeg_to_ours(spark, tmp_path):
    plane = _smooth_plane()
    c = _java_write(spark, tmp_path, "j_g8.jpg", "jpeg", plane, quality=0.9)
    h, w, dt, px = jc.decode_jpeg(c, {})
    ours = np.frombuffer(px, dtype=dt).reshape(h, w).astype(np.int64)
    theirs = _java_read_gray8(spark, str(tmp_path / "j_g8.jpg")).astype(
        np.int64)
    assert (h, w) == theirs.shape
    # same bytes, two decoders: only IDCT rounding may differ
    assert np.abs(ours - theirs).max() <= 1


def test_our_jpeg_encoder_read_by_java(spark, tmp_path):
    from test_jpeg import encode_jpeg

    plane = _smooth_plane()
    blob = encode_jpeg(plane)
    path = str(tmp_path / "j_ours.jpg")
    with open(path, "wb") as fh:
        fh.write(blob)
    theirs = _java_read_gray8(spark, path).astype(np.int64)
    h, w, dt, px = jc.decode_jpeg(blob, {})
    ours = np.frombuffer(px, dtype=dt).reshape(h, w).astype(np.int64)
    assert theirs.shape == (h, w)
    assert np.abs(ours - theirs).max() <= 1


def test_our_rgb_tiff_read_by_java(spark, tmp_path):
    """Chunky-RGB LZW TIFF from our writer (with the per-channel
    horizontal predictor) must read back channel-exact under ImageIO."""
    jvm = spark._jvm
    rgb = _rng().randint(0, 256, size=(17, 29, 3), dtype=np.uint8)
    for pred in (1, 2):
        path = str(tmp_path / f"rgb_lzw_p{pred}.tif")
        _write_tiff_ex(path, rgb, compression=5, predictor=pred)
        bi = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
        w, h = bi.getWidth(), bi.getHeight()
        assert (h, w) == rgb.shape[:2]
        got = np.empty_like(rgb)
        for y in range(h):
            for x in range(w):
                argb = bi.getRGB(x, y)
                got[y, x] = ((argb >> 16) & 255, (argb >> 8) & 255,
                             argb & 255)
        assert np.array_equal(got, rgb), pred
