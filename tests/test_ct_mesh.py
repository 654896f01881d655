"""Tests for R14 (geometry registration) and R17 (surface mesh + STL)."""

from __future__ import annotations

import struct

import numpy as np

from flexcalc_spark import ct


def test_register_geometries_recovers_transform():
    rng = np.random.RandomState(5)
    pf = rng.uniform(-1, 1, size=(20, 3))
    # known rotation (30 deg about z) + translation
    th = np.pi / 6
    r_true = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    t_true = np.array([0.5, -0.2, 1.0])
    # p_fix = R @ p_mov + T  =>  p_mov = R^T (p_fix - T)
    pm = (pf - t_true) @ r_true
    r, t = ct.register_geometries(pf, pm)
    assert np.allclose(r, r_true, atol=1e-9)
    assert np.allclose(t, t_true, atol=1e-9)


def test_surface_triangles_unit_cube(spark):
    """A single solid voxel yields exactly 12 triangles (6 faces x 2),
    the mesh is closed, the winding agrees with the declared outward
    normals, and the signed volume is +1 voxel."""
    vol = np.zeros((3, 3, 3), dtype=np.float32)
    vol[1, 1, 1] = 1.0
    df = ct.slices_from_array(spark, "cube", vol)
    tris = ct.surface_triangles(df, threshold=0.5).collect()
    assert len(tris) == 12
    normals = {(r.nx, r.ny, r.nz) for r in tris}
    assert len(normals) == 6
    signed_vol = 0.0
    for r in tris:
        a = np.array([r.ax, r.ay, r.az])
        b = np.array([r.bx, r.by, r.bz])
        c = np.array([r.cx, r.cy, r.cz])
        # winding normal must point the same way as the declared normal
        wn = np.cross(b - a, c - a)
        assert np.dot(wn, [r.nx, r.ny, r.nz]) > 0, "inverted winding"
        signed_vol += np.dot(a, np.cross(b, c)) / 6.0
    assert abs(signed_vol - 1.0) < 1e-9, f"signed volume {signed_vol} != 1"


def test_write_stl_binary(spark, tmp_path):
    vol = np.zeros((3, 4, 4), dtype=np.float32)
    vol[1, 1:3, 1:3] = 1.0  # 1x2x2 block -> 4 voxels
    df = ct.slices_from_array(spark, "blk", vol)
    tris = ct.surface_triangles(df, threshold=0.5)
    path = str(tmp_path / "mesh.stl")
    n = ct.write_stl(tris, path)
    raw = open(path, "rb").read()
    assert len(raw) == 80 + 4 + n * 50
    assert struct.unpack("<I", raw[80:84])[0] == n
    # surface area consistency: block 1x2x2 has 2*(1*2+1*2+2*2)=16 faces
    assert n == 16 * 2
