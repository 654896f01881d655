"""Property tests for the CT slice-blob pipeline (flexcalc_spark/ct.py),
per SURVEY §5.2.5: invariants on a deterministic synthetic phantom.
"""

from __future__ import annotations

import numpy as np
import pytest

from flexcalc_spark import ct


def phantom(d=8, h=16, w=16, seed=7) -> np.ndarray:
    """Deterministic phantom: bright box on noise floor."""
    rng = np.random.RandomState(seed)
    vol = rng.uniform(0.0, 0.01, size=(d, h, w)).astype(np.float32)
    vol[2:6, 4:12, 5:11] += 1.0
    return vol


def test_roundtrip(spark):
    vol = phantom()
    df = ct.slices_from_array(spark, "p1", vol)
    back = ct.array_from_slices(df)
    assert np.array_equal(back, vol)


def test_preprocess_flat_identity(spark):
    """-log((I-dark)/(flat-dark)) with I == flat gives ~0 everywhere."""
    vol = phantom()
    flat = np.full(vol.shape[1:], 2.0, dtype=np.float32)
    dark = np.zeros(vol.shape[1:], dtype=np.float32)
    df = ct.slices_from_array(spark, "p1", np.broadcast_to(flat, vol.shape).copy())
    out = ct.array_from_slices(ct.preprocess(df, flat, dark))
    assert np.allclose(out, 0.0, atol=1e-5)


def test_preprocess_monotone(spark):
    """Higher intensity -> lower -log value (attenuation semantics)."""
    vol = phantom()
    flat = np.full(vol.shape[1:], 2.0, dtype=np.float32)
    dark = np.zeros(vol.shape[1:], dtype=np.float32)
    df = ct.slices_from_array(spark, "p1", vol)
    out = ct.array_from_slices(ct.preprocess(df, flat, dark))
    bright = out[2:6, 4:12, 5:11].mean()
    dim = out[:2].mean()
    assert bright < dim


def test_residual_rings_removes_stripe(spark):
    """A constant per-column stripe across all angles is removed."""
    vol = phantom() * 0 + 0.5
    vol[:, :, 3] += 0.4  # ring: same column bright in every projection
    df = ct.slices_from_array(spark, "p1", vol)
    out = ct.array_from_slices(ct.residual_rings(df))
    col_means = out.mean(axis=(0, 1))
    assert col_means.std() < 1e-5, "stripe should be flattened"


def test_bounding_box(spark):
    vol = phantom()
    df = ct.slices_from_array(spark, "p1", vol)
    bbox = ct.bounding_box(df, threshold=0.5).collect()[0]
    assert (bbox.z0, bbox.z1) == (2, 5)
    assert (bbox.y0, bbox.y1) == (4, 11)
    assert (bbox.x0, bbox.x1) == (5, 10)


def test_translate_beyond_frame_is_zero(spark):
    """Shifting by >= the slice dimension yields all-zero slices (was a
    broadcast-shape crash before the boundary guard)."""
    vol = phantom()
    df = ct.slices_from_array(spark, "p1", vol)
    out = ct.array_from_slices(ct.translate(df, 0, vol.shape[2]))
    assert np.all(out == 0.0)
    out2 = ct.array_from_slices(ct.translate(df, -vol.shape[1] - 5, 0))
    assert np.all(out2 == 0.0)


def test_translate_roundtrip(spark):
    vol = phantom()
    df = ct.slices_from_array(spark, "p1", vol)
    moved = ct.translate(df, 2, 3)
    back = ct.array_from_slices(ct.translate(moved, -2, -3))
    # interior preserved (borders zero-filled)
    assert np.allclose(back[:, 4:12, 5:11], vol[:, 4:12, 5:11], atol=1e-6)


def test_register_translation_recovers_shift(spark):
    """Moments registration recovers a known integer shift (R13)."""
    vol = phantom()
    fixed = ct.slices_from_array(spark, "fix", vol)
    moving = ct.translate(ct.slices_from_array(spark, "mov", vol), 3, -2)
    dz, dy, dx = ct.register_translation(fixed, moving)
    assert abs(dz) < 0.1
    assert abs(dy - (-3)) < 0.1
    assert abs(dx - 2) < 0.1


def test_append_tile_idempotent(spark):
    """Stitching two identical overlapping tiles reproduces the volume."""
    vol = phantom()
    a = ct.slices_from_array(spark, "tile", vol)
    b = ct.slices_from_array(spark, "tile", vol)
    out = ct.array_from_slices(ct.append_tile(a, b))
    assert np.allclose(out, vol, atol=1e-6)


def test_reconstruct_hook_raises(spark):
    vol = phantom()
    df = ct.slices_from_array(spark, "p1", vol)
    with pytest.raises(NotImplementedError):
        ct.reconstruct_hook(df, {})
