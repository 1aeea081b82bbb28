"""Novel-view-synthesis evaluation: render all (or selected) views,
write image artifacts, and report per-image + mean PSNR/SSIM/LPIPS.

Capability parity with `/root/reference/model/eval/recon.py:135-224`
(VolumeRenderSystem): world- and camera-space normal EXRs + PNGs,
pred|gt grid, pred PNG, depth colormap + raw, `metrics.txt` and
`metrics.npz`.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..data.plot import PlotData
from ..train import artifacts
from ..train.step import make_eval_render_fn
from ..train.trainer import lpips_fn
from ..utils.imaging import psnr, ssim


def run_render_eval(params, model_cfg, conf, exp_dir: str,
                    data_root: str = "data", indices=None,
                    is_val: bool = False, full_res: bool = False,
                    fused: bool | None = None) -> dict:
    dataset_conf = dict(conf.dataset)
    scan_id = dataset_conf.pop("scan_id", 0)
    ds = dataset_conf.pop("downsample", 1)  # always pop: also passed
    downsample = 1 if full_res else ds      # explicitly below
    dataset_conf.pop("data_root", None)
    pd = PlotData(scan_id=scan_id, data_root=data_root,
                  downsample=downsample, indices=indices, plot_nimgs=-1,
                  is_val=is_val, **dataset_conf)

    out_dir = os.path.join(exp_dir, "eval", "test" if is_val else "")
    for sub in ("rendering", "depth", "normal"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    render_image, _ = make_eval_render_fn(
        model_cfg, chunk_size=conf.train.get("split_n_pixels", 12000),
        fused_sampler=fused)

    lp = lpips_fn()
    H, W = pd.img_res
    rows = []
    ids = indices if indices is not None else range(pd.n_images)
    for row, idx in enumerate(ids):
        uv, K, pose, rgb_gt = pd.image_inputs(row)
        out = render_image(params, jnp.asarray(uv), jnp.asarray(K),
                           jnp.asarray(pose))
        pred = np.asarray(out["rgb_values"]).reshape(H, W, 3)
        gt = rgb_gt.reshape(H, W, 3)
        depth = np.asarray(out["depth_values"]).reshape(H, W)
        n_world = np.asarray(out["normal_map"]).reshape(H, W, 3)
        R = np.asarray(pose)[:3, :3]
        n_cam = n_world @ R  # world -> camera

        tag = f"{idx:04d}"
        artifacts.write_normal(f"{out_dir}/normal/{tag}w.npy", n_world)
        artifacts.write_normal(f"{out_dir}/normal/{tag}.npy", n_cam)
        artifacts.write_normal(f"{out_dir}/normal/{tag}.png", n_cam)
        artifacts.write_pred_gt_grid(f"{out_dir}/rendering/{tag}.png",
                                     pred, gt)
        artifacts.write_rgb(f"{out_dir}/rendering/{tag}_pred.png", pred)
        artifacts.write_depth(f"{out_dir}/depth/{tag}.png", depth,
                              raw_exr_path=f"{out_dir}/depth/{tag}.npy")

        m = {
            "psnr": float(psnr(pred, gt)),
            "ssim": float(ssim(pred[None], gt[None])),
        }
        if lp:
            # the metric column self-labels: true AlexNet weights report
            # as LPIPS; the random-feature proxy reports as LPIPS-RF so
            # it can never be mistaken for a published-comparable number
            m[getattr(lp, "name", "lpips")] = lp(pred, gt)
        rows.append(m)
        print(f"[{tag}] " + " ".join(f"{k}={v:.4g}" for k, v in m.items()))

    keys = rows[0].keys()
    means = {k: float(np.mean([r[k] for r in rows])) for k in keys}
    with open(os.path.join(out_dir, "metrics.txt"), "w") as f:
        f.write(f"# IMAGE RESOLUTION {pd.img_res}\n")
        if lp is not None:
            f.write(f"# LPIPS implementation: {getattr(lp, 'name', '?')}"
                    " (lpips-rf = deterministic random-feature proxy,"
                    " not comparable to published LPIPS)\n")
        for i, r in enumerate(rows):
            f.write(f"[{i:04d}] " + " ".join(
                f"[{k.upper()}]{v:.4g}" for k, v in r.items()) + "\n")
        f.write("[MEAN] " + " ".join(
            f"[{k.upper()}]{v:.4g}" for k, v in means.items()) + "\n")
    np.savez_compressed(
        os.path.join(out_dir, "metrics.npz"),
        **{k: np.array([r[k] for r in rows]) for k in keys})
    print(f"[MEAN] " + " ".join(f"{k}={v:.4g}" for k, v in means.items()))
    return means
