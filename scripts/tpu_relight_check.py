"""Real-TPU gate + timing for the relight pipeline (`--test_mode relight`).

VERDICT round-2 #4: the editing/relight path had no on-chip evidence.
This script runs the FULL editing pipeline on the real chip: a short
reconstruction on a generated scene, the material stage (emitter
discovery, eval-path geometry bake, calibrated emission — without it
relight falls back to LDR-pixel-mean emission, ~100x dim on the
radiance-110 demo fixture), then `eval.relight.run_relight` (surface
extraction, NEE + sphere-traced visibility shading over the learned
materials — the fused Pallas SDF path on TPU) over every view. Records
wall time and pixels/s, asserts each relit view's mean linear radiance
brackets the clipped-LDR ground-truth mean, and writes
`docs/evidence/relight_tpu.json`.

The shaded transport here is the completion of the reference's
unreleased editing branch (`/root/reference/model/rendering/__init__.py`);
parity anchors are the CPU-side tests (tests/test_relight.py) — this
gate proves the same code path compiles and performs on TPU hardware.

Env knobs: RELIGHT_CHECK_RECON_STEPS (default 1200), RELIGHT_CHECK_SPP
(default 16), RELIGHT_CHECK_OUT (evidence path override).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from i2sdf_tpu.utils.jax_cache import set_compilation_cache

    set_compilation_cache()
    import jax
    import numpy as np

    from i2sdf_tpu.config import CfgNode
    from i2sdf_tpu.data import ReconData, generate_synthetic_scene
    from i2sdf_tpu.eval.relight import Emitters, run_relight
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.models.losses import LossConfig
    from i2sdf_tpu.models.material import emission_apply
    from i2sdf_tpu.train import create_train_state, make_train_step
    from i2sdf_tpu.train.material import MaterialTrainer

    recon_steps = int(os.environ.get("RELIGHT_CHECK_RECON_STEPS", "1200"))
    spp = int(os.environ.get("RELIGHT_CHECK_SPP", "16"))
    H, W = 48, 64
    root = tempfile.mkdtemp(prefix="i2sdf_relight_check_")
    data_root = os.path.join(root, "data")
    generate_synthetic_scene(os.path.join(data_root, "demo"), n_images=6,
                             img_res=(H, W))

    conf = CfgNode({
        "train": {"split_n_pixels": 3072},
        "plot": {"plot_nimgs": 1, "grid_boundary": [-2.2, 2.2]},
        "dataset": {"data_dir": "demo", "img_res": [H, W],
                    "downsample": 1},
        "model": {
            "feature_vector_size": 256,
            "scene_bounding_sphere": 4.0,
            "implicit_network": {
                "d_in": 3, "d_out": 1, "dims": [256] * 8,
                "geometric_init": True, "bias": 0.6, "skip_in": [4],
                "weight_norm": True, "embed_type": "positional",
                "multires": 6,
            },
            "rendering_network": {
                "mode": "nerf", "d_in": 3, "d_out": 3, "dims": [256] * 3,
                "weight_norm": True, "embed_type": "positional",
                "multires": 4,
            },
            "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
            "ray_sampler": {
                "near": 0.0, "N_samples": 64, "N_samples_eval": 128,
                "N_samples_extra": 32, "eps": 0.1, "beta_iters": 10,
                "max_total_iters": 5,
            },
        },
        "material": {
            "steps": int(os.environ.get("RELIGHT_CHECK_MAT_STEPS", "400")),
            "batch_size": 1024, "spp": 8, "vis_steps": 16,
            "n_emitters": 1, "plot_freq": 0, "checkpoint_freq": 0,
            "min_weight_sum": 0.05,
            "material_network": {"dims": [256] * 4, "multires": 6},
        },
    })
    model_node = conf.model
    model_node.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)

    params = renderer.init(jax.random.PRNGKey(0), cfg)
    ds = ReconData("demo", scan_id=0, data_root=data_root,
                   use_depth=True, use_normal=True)
    data = ds.to_device()
    state, tx = create_train_state(params, learning_rate=5e-4,
                                   decay_steps=recon_steps * 10)
    lcfg = LossConfig(eikonal_weight=0.1, depth_weight=0.1,
                      normal_weight=0.05)
    step_fn = make_train_step(cfg, tx, batch_size=1024)
    w = lcfg.dynamic_weights(0)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(recon_steps):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, data, k, w)
        if (i + 1) % 400 == 0:
            print(f"[relight-check recon {i + 1}/{recon_steps}] "
                  f"psnr={float(metrics['psnr']):.2f}", flush=True)
    recon_dt = time.time() - t0
    assert np.isfinite(float(metrics["loss"]))

    model_node.use_normal = False  # eval path for surface extraction
    cfg_eval = renderer.I2SDFConfig.from_cfgnode(model_node)
    exp_dir = os.path.join(root, "exp")
    os.makedirs(exp_dir, exist_ok=True)

    # material stage: calibrated emission + learned kd/ks/roughness —
    # without it relight falls back to LDR-pixel-mean emission (~100x
    # dim on the radiance-110 demo fixture) and heuristic materials
    t0 = time.time()
    mt = MaterialTrainer(conf, exp_dir, recon_params=state.params,
                         model_cfg=cfg_eval, data_root=data_root)
    mt.fit()
    material_dt = time.time() - t0
    material = (mt.state.params, mt.mat_cfg,
                Emitters(mt.emitters.centers, mt.emitters.radii,
                         emission_apply(mt.state.params["emission"])))

    t0 = time.time()
    res = run_relight(state.params, cfg_eval, conf, exp_dir,
                      data_root=data_root, spp=spp, chunk=3072,
                      vis_steps=16, material=material)
    relight_dt = time.time() - t0
    n_views = len(res["images"])
    means = [r["mean_radiance"] for r in res["images"]]
    # radiometric sanity: relit linear radiance vs the clip(hdr, 0, 1)
    # LDR ground truth per view — clipping only removes energy, so the
    # relit mean must bracket the LDR mean within a loose factor band
    gt_means = [float(np.asarray(ds.rgb_images[i]).mean())
                for i in range(n_views)]
    ratios = [m / max(g, 1e-6) for m, g in zip(means, gt_means)]
    ok = bool(np.isfinite(means).all() and n_views == 6
              and all(0.2 < r < 5.0 for r in ratios))

    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                cwd=repo, capture_output=True,
                                text=True).stdout.strip()
    except Exception:
        commit = "unknown"
    result = {
        "ok": ok, "platform": jax.default_backend(),
        "device": str(jax.devices()[0]), "commit": commit,
        "res": f"{H}x{W}", "n_views": n_views, "spp": spp,
        "emitters": res["emitters"],
        "recon_steps": recon_steps,
        "recon_steps_per_sec": round(recon_steps / recon_dt, 2),
        "material_steps": int(conf.material.steps),
        "material_wall_s": round(material_dt, 2),
        "relight_wall_s": round(relight_dt, 2),
        "relight_sec_per_view": round(relight_dt / max(n_views, 1), 2),
        "relight_pixels_per_sec": round(n_views * H * W / relight_dt, 1),
        "relight_shading_rays_per_sec": round(
            n_views * H * W * spp / relight_dt, 1),
        "mean_radiance": [round(m, 4) for m in means],
        "gt_ldr_mean": [round(g, 4) for g in gt_means],
        "relit_over_gt_ratio": [round(r, 3) for r in ratios],
    }
    print(json.dumps(result))
    out = os.environ.get(
        "RELIGHT_CHECK_OUT",
        os.path.join(repo, "docs", "evidence", "relight_tpu.json"))
    if jax.default_backend() != "cpu":
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
