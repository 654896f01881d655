"""Property tests for the extended CT ops: cast2type (R10), hole
inpainting (R5), equivalent density LUT (R7), spectrum calibration
(R23), axis-offset sweep (R16)."""

from __future__ import annotations

import numpy as np
import pytest

from flexcalc_spark import ct


def phantom(d=4, h=10, w=10, seed=11):
    rng = np.random.RandomState(seed)
    vol = rng.uniform(0.0, 0.02, size=(d, h, w)).astype(np.float32)
    vol[1:3, 3:7, 3:7] += 1.0
    return vol


def test_cast2type_range_mapping(spark):
    vol = phantom()
    df = ct.slices_from_array(spark, "p", vol)
    out = ct.array_from_slices(ct.cast2type(df, "uint8"))
    assert out.min() >= 0.0 and out.max() <= 255.0
    assert out.max() > 250.0  # top of range reached (bounds inferred)
    # monotone: brightest input voxel maps to the max output
    assert out.flat[np.argmax(vol)] == out.max()


def test_interpolate_holes_fills_masked(spark):
    vol = np.ones((3, 8, 8), dtype=np.float32)
    mask = np.zeros((8, 8), dtype=bool)
    mask[4, 4] = True
    df = ct.slices_from_array(spark, "p", vol * 2.0)
    out = ct.array_from_slices(ct.interpolate_holes(df, mask))
    # masked pixel replaced by neighbor mean (2.0), rest untouched
    assert np.allclose(out, 2.0, atol=1e-6)


def test_equivalent_density_lut(spark):
    """LUT application inverts a known monotone mapping."""
    vol = phantom()
    xs = np.linspace(0.0, 2.0, 64)
    ys = xs ** 2  # density = intensity^2 on the grid
    df = ct.slices_from_array(spark, "p", vol)
    out = ct.array_from_slices(ct.equivalent_density(df, xs, ys))
    assert np.allclose(out, vol.astype(np.float64) ** 2, atol=1e-3)


def test_calibrate_spectrum_recovers_known(spark):
    """Synthesize intensities from a known 2-line spectrum; the
    regularized solve recovers the dominant weights."""
    energies = np.arange(5, dtype=np.float64)
    mu = np.array([0.2, 0.4, 0.6, 0.8, 1.0])
    w_true = np.array([0.0, 0.6, 0.0, 0.4, 0.0])
    L = np.linspace(0.1, 5.0, 200)
    I = (np.exp(-np.outer(L, mu)) @ w_true)
    pairs = spark.createDataFrame(
        [(float(l), float(i)) for l, i in zip(L, I)], "L double, I double"
    )
    w = ct.calibrate_spectrum_lite(pairs, energies, mu, reg=1e-6)
    assert abs(w.sum() - 1.0) < 1e-6
    # dominant bins recovered in the right order
    assert w[1] > 0.4 and w[3] > 0.2
    assert w[1] > w[3]


def test_sample_and_bin_slices(spark):
    """R8: skip-sampling keeps every k-th slice; 2x binning halves
    dimensions and preserves the mean."""
    vol = phantom(d=6)
    df = ct.slices_from_array(spark, "p", vol)
    sampled = ct.sample_slices(df, 2)
    assert sorted(r.idx for r in sampled.select("idx").collect()) == [0, 2, 4]
    binned = ct.array_from_slices(ct.bin_slices(df))
    assert binned.shape == (6, 5, 5)
    assert abs(binned.mean() - vol.astype(np.float64).mean()) < 1e-6


def test_find_marker_locates_ball(spark):
    """R22: a bright disk planted at a known (z, y, x) is found by the
    matched filter + global argmax."""
    rng = np.random.RandomState(9)
    vol = rng.uniform(0, 0.05, size=(5, 16, 16)).astype(np.float32)
    zz, yy, xx = 3, 10, 6
    ys, xs = np.mgrid[:16, :16]
    disk = ((ys - yy) ** 2 + (xs - xx) ** 2) <= 4
    vol[zz][disk] += 2.0
    df = ct.slices_from_array(spark, "mk", vol)
    z, y, x = ct.find_marker(df, radius=2)
    assert (z, y, x) == (zz, yy, xx)


def test_optimize_axis_offset_recovers_shift(spark):
    vol = phantom()
    fixed = ct.slices_from_array(spark, "fix", vol)
    moving = ct.translate(ct.slices_from_array(spark, "mov", vol), 0, 2)
    best = ct.optimize_axis_offset(fixed, moving, offsets=[-3, -2, -1, 0, 1, 2, 3])
    assert best == -2  # shifting back by 2 minimizes SSD


def test_fbp_reconstructs_phantom(spark):
    """q_ct_fbp must be a real reconstruction, not just self-consistent
    arithmetic: the recon must be materially brighter inside the unit
    disc than outside, and the offset square must rank above the
    background."""
    from flexcalc_spark import registry
    from tests.conftest import SF_DIR

    rows = registry.QUERIES["q_ct_fbp"](spark, SF_DIR).collect()
    inside, outside, square = [], [], []
    for r in rows:
        y, x, v = r.y, r.x, r.recon
        in_disc = (x - 16) ** 2 + (y - 16) ** 2 <= 64
        in_sq = 4 <= x < 10 and 20 <= y < 26
        if in_disc:
            inside.append(v)
        elif in_sq:
            square.append(v)
        elif (x - 16) ** 2 + (y - 16) ** 2 > 144:  # clear background
            outside.append(v)
    mi = sum(inside) / len(inside)
    mo = sum(outside) / len(outside)
    ms = sum(square) / len(square)
    assert mi > 5 * abs(mo) + 0.05, (mi, mo)
    assert ms > abs(mo) + 0.02, (ms, mo)
