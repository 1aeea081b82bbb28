"""Mesh extraction and scoring.

Capability parity with `/root/reference/model/eval/recon.py:21-132`
(SDFMeshSystem) + `utils/mesh_util.py:12-115`:

* coarse 100^3 SDF grid -> marching cubes -> 10k surface samples -> PCA
  alignment (det-sign fixed) -> axis-aligned fine grid at `resolution`
  rotated back to world -> batched SDF eval -> marching cubes ->
  un-rotate + scale_mat -> binary PLY;
* `--score`: re-fuse pred and GT meshes through per-pose depth renders
  into a TSDF (C++ rasterizer + C++ TSDF instead of pyrender/open3d),
  then Chamfer Acc/Comp/Prec/Recall/F-score at 5 cm with 2 cm voxel
  downsample (C++ KD-tree instead of sklearn).

The SDF grid evaluation runs through the fused Pallas MLP kernel on TPU
(jit, 2M-point batches) — the reference's DataLoader with 32 worker
processes (`recon.py:87`) is unnecessary when the evaluator IS the
accelerator.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..models import mlp
from . import mesh_io


def _eval_sdf_grid(params, implicit_cfg, points: np.ndarray,
                   batch: int = 2_000_000, fused: bool | None = None):
    """Chunked SDF evaluation of (N, 3) host points -> (N,) numpy."""
    if fused is None:
        fused = jax.default_backend() not in ("cpu",)
    if fused:
        from ..ops.pallas.fused_mlp import fused_sdf_mlp

        def f(pts):
            return fused_sdf_mlp(params, implicit_cfg, pts)
    else:
        f = jax.jit(lambda pts: mlp.sdf_vals(params, implicit_cfg, pts)[:, 0])
    out = []
    for i in range(0, len(points), batch):
        chunk = jnp.asarray(points[i:i + batch], jnp.float32)
        out.append(np.asarray(f(chunk)))
    return np.concatenate(out)


def _uniform_grid(resolution: int, boundary):
    lo, hi = boundary
    xs = np.linspace(lo, hi, resolution, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    return pts, (xs, xs, xs)


def _aligned_grid(points: np.ndarray, resolution: int, eps: float = 0.1):
    """Axis ranges with equal spacing, densest along the shortest axis
    (parity plots.py get_grid:453-489)."""
    mn = points.min(0) - eps
    mx = points.max(0) + eps
    extents = mx - mn
    shortest = int(np.argmin(extents))
    axis = np.linspace(mn[shortest], mx[shortest], resolution,
                       dtype=np.float32)
    step = (axis[-1] - axis[0]) / (resolution - 1)
    ranges = []
    for d in range(3):
        if d == shortest:
            ranges.append(axis)
        else:
            ranges.append(np.arange(mn[d], mx[d] + step, step,
                                    dtype=np.float32))
    X, Y, Z = np.meshgrid(*ranges, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    return pts, tuple(ranges)


def extract_mesh(params, implicit_cfg, resolution: int = 512,
                 grid_boundary=(-1.5, 1.5), scale_mat: np.ndarray | None = None,
                 coarse_resolution: int = 100, fused: bool | None = None):
    """Full two-stage extraction; returns (verts, tris) in world scale or
    None when no surface crosses zero."""
    # stage 1: coarse grid -> PCA frame of the surface
    pts, (xs, ys, zs) = _uniform_grid(coarse_resolution, grid_boundary)
    z = _eval_sdf_grid(params, implicit_cfg, pts, fused=fused)
    grid = z.reshape(len(xs), len(ys), len(zs))
    if grid.min() > 0 or grid.max() < 0:
        return None
    verts_c, tris_c = native.marching_cubes(
        grid, 0.0, origin=(xs[0], ys[0], zs[0]),
        spacing=(xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0]))
    surf = mesh_io.sample_surface(verts_c, tris_c, 10_000)

    mean = surf.mean(0)
    cov = (surf - mean).T @ (surf - mean)
    _, eigvecs = np.linalg.eigh(cov)
    vecs = eigvecs.T[::-1].copy()  # rows = principal axes, major first
    if np.linalg.det(vecs) < 0:
        vecs[[1, 2]] = vecs[[2, 1]]  # parity recon.py:68-69 row swap

    aligned = (surf - mean) @ vecs.T

    # stage 2: fine grid in the aligned frame, rotated back to world
    pts_a, (ax, ay, az) = _aligned_grid(aligned, resolution)
    pts_w = pts_a @ vecs + mean
    z = _eval_sdf_grid(params, implicit_cfg, pts_w, fused=fused)
    grid = z.reshape(len(ax), len(ay), len(az))
    if grid.min() > 0 or grid.max() < 0:
        return None
    verts_a, tris = native.marching_cubes(
        grid, 0.0, origin=(ax[0], ay[0], az[0]),
        spacing=(ax[1] - ax[0], ay[1] - ay[0], az[1] - az[0]))
    verts = verts_a @ vecs + mean
    if scale_mat is not None:
        verts = mesh_io.transform_verts(verts, scale_mat)
    return verts.astype(np.float32), tris


def refuse(verts, tris, poses, K, H, W, far_clip: float = 5.0,
           voxel_length: float = 0.01):
    """Depth-render the mesh from every pose and TSDF-fuse it back
    (parity mesh_util.py:90-115). Returns (verts, tris)."""
    lo = verts.min(0) - 3 * voxel_length
    hi = verts.max(0) + 3 * voxel_length
    # keep the volume under 640^3 by coarsening the voxel, NOT by
    # clipping the region (clipping silently truncates the fused mesh)
    max_extent = float((hi - lo).max())
    if max_extent / voxel_length > 639:
        voxel_length = max_extent / 639.0
    dims = np.ceil((hi - lo) / voxel_length).astype(int) + 1
    vol = native.TSDFVolume(origin=lo, dims=dims, voxel_size=voxel_length,
                            sdf_trunc=3 * voxel_length, depth_max=far_clip)
    for pose in poses:
        w2c = np.linalg.inv(np.asarray(pose, np.float64)).astype(np.float32)
        depth = native.rasterize_depth(verts, tris, K, w2c, H, W)
        vol.integrate(depth, K, w2c)
    return vol.extract_mesh()


def depth2mesh(depths, poses, K, H, W, voxel_length: float = 0.01,
               far_clip: float = 5.0, origin=None, extent: float = 6.0):
    """TSDF-fuse raw depth maps into a mesh (parity mesh_util.py:117-135)."""
    if origin is None:
        origin = np.array([-extent / 2] * 3, np.float32)
    dims = np.minimum(int(np.ceil(extent / voxel_length)) + 1, 640)
    vol = native.TSDFVolume(origin=origin, dims=(dims,) * 3,
                            voxel_size=voxel_length,
                            sdf_trunc=3 * voxel_length, depth_max=far_clip)
    for depth, pose in zip(depths, poses):
        w2c = np.linalg.inv(np.asarray(pose, np.float64)).astype(np.float32)
        vol.integrate(np.asarray(depth, np.float32), K, w2c)
    return vol.extract_mesh()


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    """One representative point per occupied voxel (open3d parity)."""
    keys = np.floor(points / voxel).astype(np.int64)
    _, idx = np.unique(keys, axis=0, return_index=True)
    return points[np.sort(idx)]


def evaluate(verts_pred, verts_gt, threshold: float = 0.05,
             down_sample: float = 0.02) -> dict:
    """Chamfer Acc/Comp/Prec/Recall/F-score (parity mesh_util.py:25-52)."""
    p = np.asarray(verts_pred, np.float32)
    g = np.asarray(verts_gt, np.float32)
    if down_sample:
        p = voxel_downsample(p, down_sample)
        g = voxel_downsample(g, down_sample)
    dist_gt_to_pred = native.nn_distances(p, g)   # dist1 in the reference
    dist_pred_to_gt = native.nn_distances(g, p)   # dist2
    precision = float(np.mean(dist_pred_to_gt < threshold))
    recall = float(np.mean(dist_gt_to_pred < threshold))
    fscore = (2 * precision * recall / (precision + recall)
              if precision + recall > 0 else 0.0)
    return {
        "Acc": float(np.mean(dist_pred_to_gt)),
        "Comp": float(np.mean(dist_gt_to_pred)),
        "Prec": precision,
        "Recal": recall,
        "F-score": fscore,
    }


def run_mesh_eval(params, model_cfg, conf, exp_dir: str,
                  data_root: str = "data", resolution: int = 512,
                  score: bool = False, far_clip: float = 5.0,
                  fused: bool | None = None, material=None) -> str | None:
    """Full `--test_mode mesh` flow incl. optional scoring; returns the
    PLY path (parity recon.py:92-129).

    `material`: optional (params, MaterialNetConfig, Emitters) triple
    from `train.material.load_material_stage` — bakes the learned albedo
    as per-vertex colors into the exported PLY (beyond the reference)."""
    scan_id = conf.dataset.get("scan_id", 0)
    instance_dir = os.path.join(data_root, conf.dataset.data_dir,
                                f"scan{scan_id}")
    cams = np.load(os.path.join(instance_dir, "cameras_normalize.npz"))
    scale_mat = cams["scale_mat_0"]

    result = extract_mesh(
        params["implicit"], model_cfg.implicit, resolution=resolution,
        grid_boundary=tuple(conf.plot.grid_boundary), scale_mat=scale_mat,
        fused=fused)
    if result is None:
        print("[WARN] SDF has no zero crossing; no mesh extracted")
        return None
    verts, tris = result
    colors = None
    if material is not None:
        # the material field lives in NORMALIZED scene coordinates —
        # undo the scale_mat the mesher applied before evaluating kd
        import jax.numpy as jnp

        from ..models.material import material_net_apply

        mat_params, mat_cfg, _ = material
        inv = np.linalg.inv(np.asarray(scale_mat, np.float64))
        vn = (verts @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
        kds = []
        for s in range(0, len(vn), 262_144):
            kds.append(np.asarray(material_net_apply(
                mat_params["material"], mat_cfg,
                jnp.asarray(vn[s:s + 262_144]))["kd"]))
        colors = np.concatenate(kds)
        print("[INFO] baked learned albedo onto "
              f"{len(colors)} mesh vertices")
    mesh_dir = os.path.join(exp_dir, "eval", "mesh")
    os.makedirs(mesh_dir, exist_ok=True)
    ply_path = os.path.join(mesh_dir, f"scan{scan_id}.ply")
    mesh_io.write_ply(ply_path, verts, tris, colors=colors)
    print(f"[INFO] mesh saved to {ply_path} "
          f"({len(verts)} verts, {len(tris)} tris)")

    # inspect-in-browser artifact with training-camera frusta
    # (parity /root/reference/utils/plots.py:15-73,188-225)
    from ..train.artifacts import write_mesh_html
    from ..utils import imaging as _imaging
    from ..utils.cameras import load_K_Rt_from_P as _loadP

    n_imgs = len(_imaging.glob_imgs(os.path.join(instance_dir, "image")))
    poses_h, Ks_h = [], []
    for i in range(n_imgs):
        K_i, pose_i = _loadP(cams[f"world_mat_{i}"][:3, :])
        poses_h.append(pose_i)
        Ks_h.append(K_i)
    write_mesh_html(verts, tris,
                    os.path.join(mesh_dir, f"scan{scan_id}.html"),
                    poses=np.asarray(poses_h) if poses_h else None,
                    intrinsics=np.asarray(Ks_h) if Ks_h else None)

    if score:
        from ..utils import imaging
        from ..utils.cameras import load_K_Rt_from_P

        image_dir = os.path.join(instance_dir, "image")
        n_imgs = len(imaging.glob_imgs(image_dir))
        poses = []
        for i in range(n_imgs):
            K, pose = load_K_Rt_from_P(cams[f"world_mat_{i}"][:3, :])
            poses.append(pose)
        sample = imaging.load_rgb(imaging.glob_imgs(image_dir)[0])
        H, W = sample.shape[0], sample.shape[1]

        pv, pt = refuse(verts, tris, poses, K, H, W, far_clip)
        mesh_io.write_ply(os.path.join(
            mesh_dir, f"scan{scan_id}_refined.ply"), pv, pt)
        gt_path = os.path.join(instance_dir, "mesh.ply")
        if not os.path.exists(gt_path):
            print(f"[WARN] no GT mesh at {gt_path}; skipping score")
            return ply_path
        gv, gt_t = mesh_io.read_ply(gt_path)
        gv, gt_t = refuse(gv, gt_t, poses, K, H, W, far_clip)
        mesh_io.write_ply(os.path.join(
            mesh_dir, f"scan{scan_id}_gt.ply"), gv, gt_t)
        metrics = evaluate(pv, gv)
        with open(os.path.join(mesh_dir, "metrics.txt"), "w") as f:
            for k, v in metrics.items():
                f.write(f"{k.upper()}: {v}\n")
        print(f"[INFO] mesh metrics: {metrics}")
    return ply_path
