"""Camera geometry: projection decomposition, ray generation, unprojection.

Capability parity with `/root/reference/utils/rend_util.py:57-227` —
OpenCV camera convention (x right, y down, z forward), intrinsics with
skew, pose as camera-to-world 4x4, quaternion pose support, and
bounding-sphere intersections. Device math is JAX; the one-off
projection-matrix decomposition is host-side NumPy (clean-room RQ
decomposition instead of cv2.decomposeProjectionMatrix).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Host-side (NumPy): P -> K, pose decomposition
# ---------------------------------------------------------------------------


def rq_decompose(M: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """RQ-decompose a 3x3 matrix: M = R_upper @ Q with Q a rotation.

    Implemented via QR of the antitransposed matrix. Signs are fixed so
    that R_upper has a non-negative diagonal.
    """
    # reverse rows/cols: M_rev = flip(M).T ; QR(M_rev) = q r
    P = np.flipud(np.eye(3))
    q, r = np.linalg.qr((P @ M).T)
    R_upper = P @ r.T @ P
    Q = P @ q.T
    # fix signs: make diag(R_upper) >= 0
    signs = np.sign(np.diag(R_upper))
    signs[signs == 0] = 1.0
    D = np.diag(signs)
    R_upper = R_upper @ D
    Q = D @ Q
    if np.linalg.det(Q) < 0:  # ensure proper rotation
        Q = -Q
        R_upper = -R_upper
    return R_upper, Q


def load_K_Rt_from_P(P: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decompose a 3x4 projection matrix into intrinsics and c2w pose.

    Matches the semantics of `/root/reference/utils/rend_util.py:57-78`:
    returns (intrinsics 4x4 with K normalized by K[2,2], pose 4x4 with
    pose[:3,:3] = R^T (camera-to-world rotation) and pose[:3,3] = camera
    center).
    """
    P = np.asarray(P, dtype=np.float64)[:3, :4]
    M = P[:, :3]
    K, R = rq_decompose(M)
    # camera center: null direction of P  (P @ [C;1] = 0)
    C = -np.linalg.inv(M) @ P[:, 3]

    K = K / K[2, 2]
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K.astype(np.float32)

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T.astype(np.float32)
    pose[:3, 3] = C.astype(np.float32)
    return intrinsics, pose


def load_K_Rt_from_file(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read a 3x4 (or 4-line) projection matrix text file and decompose."""
    lines = open(path).read().splitlines()
    if len(lines) == 4:
        lines = lines[1:]
    vals = [[float(w) for w in ln.split(" ")[:4]] for ln in lines]
    P = np.asarray(vals, dtype=np.float32).squeeze()
    return load_K_Rt_from_P(P)


# ---------------------------------------------------------------------------
# Device-side (JAX): ray generation and unprojection
# ---------------------------------------------------------------------------


def lift(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray):
    """Pixel coords (+depth z) -> homogeneous camera-space points.

    Accounts for skew; parity with `/root/reference/utils/rend_util.py:134-147`.
    `intrinsics`: (..., 4, 4) or (..., 3, 3); x/y/z: (..., N).
    """
    fx = intrinsics[..., 0, 0][..., None]
    fy = intrinsics[..., 1, 1][..., None]
    cx = intrinsics[..., 0, 2][..., None]
    cy = intrinsics[..., 1, 2][..., None]
    sk = intrinsics[..., 0, 1][..., None]

    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, y_lift, z, jnp.ones_like(z)], axis=-1)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalizes and converts (..., 4) wxyz quaternions to rotations."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    qr, qi, qj, qk = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (qj**2 + qk**2)
    r01 = 2 * (qj * qi - qk * qr)
    r02 = 2 * (qi * qk + qr * qj)
    r10 = 2 * (qj * qi + qk * qr)
    r11 = 1 - 2 * (qi**2 + qk**2)
    r12 = 2 * (qj * qk - qi * qr)
    r20 = 2 * (qk * qi - qj * qr)
    r21 = 2 * (qj * qk + qi * qr)
    r22 = 1 - 2 * (qi**2 + qj**2)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> wxyz quaternions (w > 0 branch)."""
    w = jnp.sqrt(jnp.clip(1.0 + R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2], 1e-12)) / 2
    x = (R[..., 2, 1] - R[..., 1, 2]) / (4 * w)
    y = (R[..., 0, 2] - R[..., 2, 0]) / (4 * w)
    z = (R[..., 1, 0] - R[..., 0, 1]) / (4 * w)
    return jnp.stack([w, x, y, z], axis=-1)


def get_camera_params(uv: jnp.ndarray, pose: jnp.ndarray, intrinsics: jnp.ndarray):
    """uv (B, N, 2) + pose + K -> (ray_dirs (B, N, 3) UNnormalized, cam_loc (B, 3)).

    Pose may be (B, 4, 4) camera-to-world matrices or (B, 7) quaternion+
    translation. Parity with `/root/reference/utils/rend_util.py:92-120`;
    ray_dirs are intentionally not normalized — their norm converts
    z-distance to euclidean depth downstream.
    """
    if pose.shape[-1] == 7:
        cam_loc = pose[..., 4:]
        R = quat_to_rot(pose[..., :4])
        p = jnp.zeros(pose.shape[:-1] + (4, 4), dtype=pose.dtype)
        p = p.at[..., :3, :3].set(R)
        p = p.at[..., :3, 3].set(cam_loc)
        p = p.at[..., 3, 3].set(1.0)
    else:
        cam_loc = pose[..., :3, 3]
        p = pose

    x_cam = uv[..., 0]
    y_cam = uv[..., 1]
    z_cam = jnp.ones_like(x_cam)

    pixel_points_cam = lift(x_cam, y_cam, z_cam, intrinsics)  # (B, N, 4)
    world_coords = jnp.einsum(
        "...ij,...nj->...ni", p, pixel_points_cam,
        precision=jax.lax.Precision.HIGHEST)[..., :3]
    ray_dirs = world_coords - cam_loc[..., None, :]
    return ray_dirs, cam_loc


def depth_to_world(
    uv: jnp.ndarray,
    intrinsics: jnp.ndarray,
    pose: jnp.ndarray,
    depth: jnp.ndarray,
) -> jnp.ndarray:
    """Unproject per-pixel z-depth to homogeneous world points (N, 4).

    Parity with `/root/reference/utils/rend_util.py:81-89` (masking is
    the caller's job — fixed shapes on TPU).
    """
    x_cam, y_cam = uv[..., 0], uv[..., 1]
    z_cam = jnp.ones_like(x_cam)
    xyz_view = lift(x_cam, y_cam, z_cam, intrinsics)
    xyz_view = xyz_view.reshape(-1, 4)
    xyz_view = xyz_view.at[:, :3].multiply(depth.reshape(-1, 1))
    return jnp.matmul(xyz_view, pose.T, precision=jax.lax.Precision.HIGHEST)


def get_sphere_intersections(
    cam_loc: jnp.ndarray, ray_directions: jnp.ndarray, r: float = 1.0
):
    """Near/far intersections of unit-norm rays with a sphere of radius r.

    Returns ((N, 2) clamped-to->=0 distances, (N,) validity mask). The
    reference hard-exits on a miss (`rend_util.py:220-222`); under `jit`
    we clamp the discriminant and surface the mask so callers/tests can
    assert on it outside the traced region.
    """
    ray_cam_dot = jnp.sum(ray_directions * cam_loc, axis=-1, keepdims=True)
    under_sqrt = ray_cam_dot**2 - (
        jnp.sum(cam_loc**2, axis=-1, keepdims=True) - r**2
    )
    mask = (under_sqrt > 0).squeeze(-1)
    sqrt_term = jnp.sqrt(jnp.maximum(under_sqrt, 0.0))
    sphere_intersections = (
        sqrt_term * jnp.asarray([-1.0, 1.0], dtype=cam_loc.dtype) - ray_cam_dot
    )
    return jnp.clip(sphere_intersections, 0.0), mask


def get_general_sphere_intersections(cam_loc, ray_directions, center, r):
    """Ray/sphere intersections for an arbitrary-center sphere.

    Fixed-shape version of `/root/reference/utils/rend_util.py:191-208`:
    instead of boolean-indexed compaction, returns per-ray
    (intersection points (N, 3), unit normals (N, 3), valid mask (N,))
    with arbitrary values where invalid.
    """
    rel = cam_loc - center[None, :]
    ray_cam_dot = jnp.sum(ray_directions * rel, axis=-1, keepdims=True)
    under_sqrt = ray_cam_dot**2 - (
        jnp.sum(rel**2, axis=-1, keepdims=True) - r**2)
    has_hit = (under_sqrt >= 0).squeeze(-1)
    sqrt_term = jnp.sqrt(jnp.maximum(under_sqrt, 0.0))
    t_near = -sqrt_term - ray_cam_dot
    t_far = sqrt_term - ray_cam_dot
    front = (t_near > 0).squeeze(-1) & (t_far > 0).squeeze(-1)
    valid = has_hit & front
    normals_raw = rel + ray_directions * t_near
    points = normals_raw + center[None, :]
    norms = jnp.maximum(
        jnp.linalg.norm(normals_raw, axis=-1, keepdims=True), 1e-8)
    return points, normals_raw / norms, valid


def add_depth_noise(key, depth, depth_mask, scale: float = 1.0):
    """Sensor-model depth-noise injection ablation.

    Parity with `/root/reference/utils/rend_util.py:229-233`.
    """
    mu = 0.0001125 * depth**2 + 0.0048875
    sigma = 0.002925 * depth**2 + 0.003325
    noise = jax.random.normal(key, depth.shape, dtype=depth.dtype) * sigma + mu
    return (depth + noise * scale) * depth_mask
