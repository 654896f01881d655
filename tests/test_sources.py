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


def test_decode_stub_format_raises(spark, tmp_path):
    """png has no offline decoder — the stub must raise through Spark."""
    (tmp_path / "img.png").write_bytes(b"\x89PNGfake")
    df = bf.read_binary_dir(spark, str(tmp_path), "*.png")
    decoded = bf.decode_files(df, "png", {})
    with pytest.raises(Exception, match="NotImplementedError|png"):
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
    """Decodable raw blobs yield features; stub formats degrade to
    flagged rows without failing the batch."""
    rows = [
        (1, "image", "raw", json.dumps({"h": 2, "w": 2, "dtype": "float32"}),
         np.arange(4, dtype=np.float32).tobytes()),
        (2, "image", "png", json.dumps({}), b"\x89PNG fake"),
    ]
    media = spark.createDataFrame(rows, bf.MEDIA_SCHEMA)
    feats = {r.media_id: r for r in bf.media_features(media).collect()}
    assert feats[1].mean_intensity == repr(1.5)
    assert feats[1].thumb_h == 1 and feats[1].thumb_w == 1
    assert feats[2].mean_intensity == "NOT_DECODABLE"
    assert feats[2].thumb_h == -1
