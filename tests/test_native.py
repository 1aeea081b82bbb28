"""Tests for the host-side C++ modules (marching tets, KD-tree, TSDF,
rasterizer) — verified against analytic shapes and numpy brute force."""

import numpy as np
import pytest

from i2sdf_tpu import native


@pytest.fixture(scope="module")
def lib():
    return native.get_lib()


def _sphere_grid(n=48, r=0.6, extent=1.0):
    xs = np.linspace(-extent, extent, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    grid = np.sqrt(X**2 + Y**2 + Z**2) - r
    spacing = xs[1] - xs[0]
    return grid.astype(np.float32), (-extent,) * 3, (spacing,) * 3


def test_marching_sphere_radius(lib):
    grid, origin, spacing = _sphere_grid()
    verts, tris = native.marching_cubes(grid, 0.0, origin, spacing)
    assert verts.shape[0] > 100 and tris.shape[0] > 100
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.01)
    assert radii.std() < 0.01
    assert tris.min() >= 0 and tris.max() < verts.shape[0]


def test_marching_orientation_outward(lib):
    grid, origin, spacing = _sphere_grid()
    verts, tris = native.marching_cubes(grid, 0.0, origin, spacing)
    v0, v1, v2 = (verts[tris[:, i]] for i in range(3))
    normals = np.cross(v1 - v0, v2 - v0)
    centers = (v0 + v1 + v2) / 3
    dots = np.sum(normals * centers, axis=1)  # outward = along +r
    assert (dots > 0).mean() > 0.99


def test_marching_watertight_sphere(lib):
    """Every edge of a closed surface must be shared by exactly 2 tris."""
    grid, origin, spacing = _sphere_grid(n=24)
    verts, tris = native.marching_cubes(grid, 0.0, origin, spacing)
    from collections import Counter

    edges = Counter()
    for t in tris:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edges[(min(a, b), max(a, b))] += 1
    counts = np.array(list(edges.values()))
    assert (counts == 2).mean() > 0.999


def test_marching_level_offset(lib):
    grid, origin, spacing = _sphere_grid()
    verts, _ = native.marching_cubes(grid, 0.2, origin, spacing)
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.8, atol=0.01)


def test_nn_distances_vs_bruteforce(lib):
    rng = np.random.default_rng(0)
    ref = rng.normal(size=(500, 3)).astype(np.float32)
    q = rng.normal(size=(200, 3)).astype(np.float32)
    d = native.nn_distances(ref, q)
    brute = np.sqrt(
        ((q[:, None, :] - ref[None, :, :]) ** 2).sum(-1)).min(axis=1)
    np.testing.assert_allclose(d, brute, rtol=1e-5, atol=1e-6)


def test_rasterize_single_triangle(lib):
    verts = np.array([[-1.0, -1.0, 2.0], [1.0, -1.0, 2.0], [0.0, 1.0, 2.0]],
                     np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    K = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    depth = native.rasterize_depth(verts, tris, K, w2c, 64, 64)
    # center of the triangle projects to ~(32, 32-ish); depth 2 there
    assert depth[32, 32] == pytest.approx(2.0, abs=1e-4)
    # corners of image are empty
    assert depth[0, 0] == 0.0 and depth[63, 63] == 0.0
    assert (depth > 0).sum() > 100


def test_rasterize_zbuffer_picks_nearest(lib):
    verts = np.array(
        [[-1, -1, 3.0], [1, -1, 3.0], [0, 1, 3.0],
         [-1, -1, 2.0], [1, -1, 2.0], [0, 1, 2.0]], np.float32)
    tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    K = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]], np.float32)
    depth = native.rasterize_depth(verts, tris, K, np.eye(4), 64, 64)
    assert depth[32, 32] == pytest.approx(2.0, abs=1e-4)


def test_tsdf_fuse_plane(lib):
    """Fuse synthetic depth of a wall at z=2; the fused surface must sit
    at z=2."""
    H = W = 64
    K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], np.float32)
    depth = np.full((H, W), 2.0, np.float32)
    vol = native.TSDFVolume(origin=(-1.5, -1.5, 0.5), dims=(48, 48, 48),
                            voxel_size=3.0 / 48, sdf_trunc=0.15)
    for _ in range(3):
        vol.integrate(depth, K, np.eye(4, dtype=np.float32))
    verts, tris = vol.extract_mesh()
    assert verts.shape[0] > 50
    np.testing.assert_allclose(verts[:, 2].mean(), 2.0, atol=0.05)
    assert verts[:, 2].std() < 0.05


def test_tsdf_roundtrip_with_rasterizer(lib):
    """Mesh -> depth renders -> TSDF refuse -> mesh stays in place."""
    grid, origin, spacing = _sphere_grid(n=32, r=0.6)
    verts, tris = native.marching_cubes(grid, 0.0, origin, spacing)

    H = W = 80
    K = np.array([[80.0, 0, 40], [0, 80.0, 40], [0, 0, 1]], np.float32)
    vol = native.TSDFVolume(origin=(-1.0, -1.0, -1.0), dims=(64, 64, 64),
                            voxel_size=2.0 / 64, sdf_trunc=0.1)
    for ang in np.linspace(0, 2 * np.pi, 8, endpoint=False):
        # camera at radius 2 looking at origin
        c, s = np.cos(ang), np.sin(ang)
        eye = np.array([2.0 * c, 0.0, 2.0 * s], np.float32)
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0], np.float32)
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
        w2c = np.linalg.inv(c2w)
        depth = native.rasterize_depth(verts, tris, K, w2c, H, W)
        vol.integrate(depth, K, w2c)
    fused_verts, _ = vol.extract_mesh()
    assert fused_verts.shape[0] > 100
    radii = np.linalg.norm(fused_verts, axis=1)
    np.testing.assert_allclose(np.median(radii), 0.6, atol=0.05)
