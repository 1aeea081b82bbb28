"""Full editing-pipeline demo: reconstruct -> learn materials -> relight
with an edited light.

This is the capability the reference paper demonstrates but whose code
was never released (`/root/reference/README.md:77-79`): after
reconstruction, a material field + emitter emission are optimized by
inverse Monte-Carlo rendering, and the scene is then re-rendered under
EDITED lighting. Writes a panel `gt | relit (learned light) |
relit (edited blue light) | learned kd` and asserts everything is
finite.

Usage: python scripts/demo_editing.py [--recon_steps 400]
       [--material_steps 300] [--out /tmp/i2sdf_edit_demo]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recon_steps", type=int, default=400)
    ap.add_argument("--material_steps", type=int, default=600)
    ap.add_argument("--out", default="/tmp/i2sdf_edit_demo")
    args = ap.parse_args()

    from i2sdf_tpu.config import CfgNode
    from i2sdf_tpu.data import ReconData, generate_synthetic_scene
    from i2sdf_tpu.eval.relight import Emitters, run_relight
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.models.losses import LossConfig
    from i2sdf_tpu.train import create_train_state, make_train_step
    from i2sdf_tpu.train.material import MaterialTrainer

    os.makedirs(args.out, exist_ok=True)
    data_root = os.path.join(args.out, "data")
    generate_synthetic_scene(os.path.join(data_root, "demo"),
                             n_images=6, img_res=(48, 64))

    conf = CfgNode({
        "train": {"split_n_pixels": 1024},
        "plot": {"plot_nimgs": 1, "grid_boundary": [-2.2, 2.2]},
        "dataset": {"data_dir": "demo", "img_res": [48, 64],
                    "downsample": 1},
        "model": {
            "feature_vector_size": 64,
            "scene_bounding_sphere": 4.0,
            "implicit_network": {
                "d_in": 3, "d_out": 1, "dims": [64, 64, 64, 64],
                "geometric_init": True, "bias": 0.6, "skip_in": [2],
                "weight_norm": True, "embed_type": "positional",
                "multires": 6,
            },
            "rendering_network": {
                "mode": "nerf", "d_in": 3, "d_out": 3, "dims": [64, 64],
                "weight_norm": True, "embed_type": "positional",
                "multires": 4,
            },
            "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
            "ray_sampler": {
                "near": 0.0, "N_samples": 16, "N_samples_eval": 32,
                "N_samples_extra": 8, "eps": 0.1, "beta_iters": 6,
                "max_total_iters": 3,
            },
        },
        "material": {
            # the measured-convergent recipe (scripts/
            # eval_material_recovery.py): smaller nets/batches underfit
            # — 64^3/multires-4/batch-512/spp-4 plateaus ~8 dB worse
            # even with perfect geometry and the true emitter
            "steps": args.material_steps, "batch_size": 1024, "spp": 8,
            "vis_steps": 12, "n_emitters": 1, "plot_freq": 0,
            "checkpoint_freq": 0, "min_weight_sum": 0.2,
            "learning_rate": 5.0e-3, "smooth_weight": 1.0e-4,
            "material_network": {"dims": [128, 128, 128, 128],
                                 "multires": 6},
        },
    })

    # ---- stage 1: reconstruction ------------------------------------------
    model_node = conf.model
    model_node.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)
    params = renderer.init(jax.random.PRNGKey(0), cfg)
    ds = ReconData("demo", scan_id=0, data_root=data_root,
                   use_depth=True, use_normal=True)
    data = ds.to_device()
    state, tx = create_train_state(params, learning_rate=5e-4,
                                   decay_steps=args.recon_steps * 10)
    loss_cfg = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                          normal_weight=0.05)
    step = make_train_step(cfg, tx, batch_size=256)
    w = loss_cfg.dynamic_weights(0)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(args.recon_steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, data, k, w)
        if (i + 1) % 100 == 0:
            print(f"[edit-demo recon {i + 1}] "
                  f"psnr={float(metrics['psnr']):.2f} "
                  f"({(i + 1) / (time.perf_counter() - t0):.1f} steps/s)")
    recon_params = state.params
    model_node.use_normal = False  # eval path for bake/relight
    cfg_eval = renderer.I2SDFConfig.from_cfgnode(model_node)

    # ---- stage 2: material optimization -----------------------------------
    mt = MaterialTrainer(conf, args.out, recon_params=recon_params,
                         model_cfg=cfg_eval, data_root=data_root,
                         fused=False)
    mt.fit()
    from i2sdf_tpu.models.material import emission_apply

    material = (mt.state.params, mt.mat_cfg,
                Emitters(mt.emitters.centers, mt.emitters.radii,
                         emission_apply(mt.state.params["emission"])))

    # ---- stage 3: relight, original vs edited light ------------------------
    res_orig = run_relight(recon_params, cfg_eval, conf,
                           os.path.join(args.out, "orig"),
                           data_root=data_root, indices=[0], spp=16,
                           chunk=1024, vis_steps=12, fused=False,
                           material=material)
    # the CLI-surface light edit: edit_conf.emission_scale recolors the
    # learned emitters (same path as --edit_conf edits.yml)
    res_edit = run_relight(recon_params, cfg_eval, conf,
                           os.path.join(args.out, "edited"),
                           data_root=data_root, indices=[0], spp=16,
                           chunk=1024, vis_steps=12, fused=False,
                           edit_conf={"emission_scale": [0.3, 0.5, 2.0]},
                           material=material)

    # ---- panel -------------------------------------------------------------
    import cv2

    from i2sdf_tpu.utils.imaging import linear_to_srgb

    H, W = 48, 64
    # display GT through the same transform the relit PNGs use
    # (linear -> sRGB), or the comparison reads as a brightness mismatch
    gt = (np.asarray(linear_to_srgb(ds.rgb_images[0])).reshape(
        H, W, 3)[:, :, ::-1] * 255).astype(np.uint8)

    def load(p):
        return cv2.imread(p)

    relit = load(os.path.join(args.out, "orig", "eval", "relight",
                              "0000_relit.png"))
    edited = load(os.path.join(args.out, "edited", "eval", "relight",
                               "0000_relit.png"))
    maps = mt.render_material_maps(0)
    kd = (np.clip(maps["kd"], 0, 1)[:, :, ::-1] * 255).astype(np.uint8)
    panel = np.concatenate([gt, relit, edited, kd], axis=1)
    out_png = os.path.join(args.out, "editing_panel.png")
    cv2.imwrite(out_png, panel)
    print(f"[edit-demo] wrote {out_png} "
          "(gt | relit | relit-blue-light | learned kd)")

    m_orig = res_orig["images"][0]["mean_radiance"]
    m_edit = res_edit["images"][0]["mean_radiance"]
    assert np.isfinite([m_orig, m_edit]).all() and m_orig > 0
    # quantify the re-render under the ORIGINAL light against GT (both
    # in display sRGB, like the panel; `relit` was loaded above)
    relit_srgb = np.asarray(relit, np.float32) / 255.0
    gt_f = np.asarray(gt, np.float32) / 255.0
    mse = float(np.mean((relit_srgb - gt_f) ** 2))
    relit_psnr = -10.0 * np.log10(max(mse, 1e-12))
    print(f"[edit-demo] relit-vs-gt PSNR {relit_psnr:.2f} dB (sRGB)")
    print(f"[edit-demo] relit mean {m_orig:.4f}, edited {m_edit:.4f}")
    print("[edit-demo] OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
