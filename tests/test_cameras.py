import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from i2sdf_tpu.utils import cameras


def _random_projection(seed=0):
    rng = np.random.default_rng(seed)
    K = np.array([[500.0, 2.0, 320.0], [0, 480.0, 240.0], [0, 0, 1.0]])
    # random rotation via QR
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    C = rng.normal(size=3) * 2.0
    Rt = np.concatenate([Q, (-Q @ C)[:, None]], axis=1)
    P = K @ Rt
    return P, K, Q, C


@pytest.mark.parametrize("seed", [0, 1, 2, 7])
def test_load_K_Rt_matches_construction(seed):
    P, K, R, C = _random_projection(seed)
    intr, pose = cameras.load_K_Rt_from_P(P)
    np.testing.assert_allclose(intr[:3, :3], K / K[2, 2], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(pose[:3, :3], R.T, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(pose[:3, 3], C, rtol=1e-4, atol=1e-5)


def test_load_K_Rt_matches_opencv():
    P, _, _, _ = _random_projection(3)
    intr, pose = cameras.load_K_Rt_from_P(P)
    out = cv2.decomposeProjectionMatrix(P.astype(np.float64))
    K_cv = out[0] / out[0][2, 2]
    R_cv = out[1]
    t_cv = (out[2][:3] / out[2][3]).ravel()
    np.testing.assert_allclose(intr[:3, :3], K_cv, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(pose[:3, :3], R_cv.T, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pose[:3, 3], t_cv, rtol=1e-4, atol=1e-4)


def test_lift_pinhole_inverse():
    K = jnp.array(
        [[[500.0, 0, 320, 0], [0, 480, 240, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]]])
    x = jnp.array([[320.0, 420.0]])
    y = jnp.array([[240.0, 140.0]])
    z = jnp.ones((1, 2))
    pts = cameras.lift(x, y, z, K)
    np.testing.assert_allclose(np.asarray(pts[0, 0]), [0, 0, 1, 1], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pts[0, 1]), [100.0 / 500, -100.0 / 480, 1, 1], atol=1e-6)


def test_get_camera_params_identity_pose():
    K = jnp.eye(4)[None].at[0, 0, 0].set(100.0).at[0, 1, 1].set(100.0)
    K = K.at[0, 0, 2].set(50.0).at[0, 1, 2].set(50.0)
    pose = jnp.eye(4)[None]
    uv = jnp.array([[[50.0, 50.0], [150.0, 50.0]]])
    dirs, loc = cameras.get_camera_params(uv, pose, K)
    np.testing.assert_allclose(np.asarray(loc[0]), [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dirs[0, 0]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dirs[0, 1]), [1, 0, 1], atol=1e-6)


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(5, 4))
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    q[q[:, 0] < 0] *= -1  # canonical w>0
    R = cameras.quat_to_rot(jnp.asarray(q))
    q2 = cameras.rot_to_quat(R)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-5)
    # rotations are orthonormal
    RtR = np.einsum("bij,bik->bjk", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (5, 3, 3)),
                               atol=1e-5)


def test_sphere_intersections():
    cam = jnp.array([[0.0, 0.0, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    inter, mask = cameras.get_sphere_intersections(cam, d, r=1.0)
    assert bool(mask[0])
    np.testing.assert_allclose(np.asarray(inter[0]), [1.0, 3.0], atol=1e-5)
    # ray missing the sphere -> mask False
    d2 = jnp.array([[1.0, 0.0, 0.0]])
    _, mask2 = cameras.get_sphere_intersections(cam, d2, r=1.0)
    assert not bool(mask2[0])


def test_depth_to_world_roundtrip():
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 100.0
    K[0, 2] = K[1, 2] = 50.0
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [1.0, 2.0, 3.0]
    uv = jnp.array([[50.0, 50.0], [60.0, 40.0]])
    depth = jnp.array([2.0, 4.0])
    world = cameras.depth_to_world(uv, jnp.asarray(K), jnp.asarray(pose), depth)
    w = np.asarray(world)
    w = w[:, :3] / w[:, 3:]
    np.testing.assert_allclose(w[0], [1.0, 2.0, 5.0], atol=1e-5)
    np.testing.assert_allclose(
        w[1], [1.0 + 0.1 * 4, 2.0 - 0.1 * 4, 3.0 + 4.0], atol=1e-4)


def test_general_sphere_intersections():
    center = jnp.array([1.0, 0.0, 0.0])
    cam = jnp.array([[1.0, 0.0, -3.0], [10.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    pts, normals, valid = cameras.get_general_sphere_intersections(
        cam, d, center, 1.0)
    assert bool(valid[0]) and not bool(valid[1])
    np.testing.assert_allclose(np.asarray(pts[0]), [1.0, 0.0, -1.0],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(normals[0]), [0.0, 0.0, -1.0],
                               atol=1e-5)
