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


def test_decode_unavailable_raises(spark, tmp_path):
    (tmp_path / "img.tif").write_bytes(b"II*\x00fake")
    df = bf.read_binary_dir(spark, str(tmp_path), "*.tif")
    decoded = bf.decode_files(df, "tiff", {})
    with pytest.raises(Exception, match="NotImplementedError|tiff"):
        decoded.collect()


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
