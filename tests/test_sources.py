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
