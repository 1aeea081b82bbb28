"""CLI driver: train or run one of the three test modes.

Capability parity with `/root/reference/main_recon.py:14-123`: the same
flag surface (conf / exps_folder / expname / scan_id / test / test_mode
render|mesh|interpolate / version / inter_id / indices / n_frames /
frame_rate / full_res / is_val / val_mesh / score / far_clip / ckpt /
resolution / seed), versioned experiment directories
(`<exps_folder>/<expname>_<scan>/version_N/`), config snapshotting, and
checkpoint loading for the test modes. Device selection is
`jax.devices()` (the reference's GPUtil auto-pick is CUDA-specific).

Usage:
    python -m i2sdf_tpu.main --conf configs/synthetic.yml --scan_id 1
    python -m i2sdf_tpu.main --conf ... --test --test_mode render
    python -m i2sdf_tpu.main --conf ... --test --test_mode mesh --score
    python -m i2sdf_tpu.main --conf ... --test --test_mode interpolate \
        --inter_id 3 14
    python -m i2sdf_tpu.main --conf ... --test --test_mode relight \
        --spp 16 --n_emitters 1 [--edit_conf edits.yml]
    python -m i2sdf_tpu.main --conf ... --test --test_mode relight_video \
        --inter_id 0 3 --n_frames 60 [--use_material]

`relight` / `relight_video` go BEYOND the reference CLI (its editing
branch was never released; `model/rendering/__init__.py:42` calls an
undefined `get_incident_radiance`, and RelightVideoDataset
`dataset/eval_dataset.py:341-374` has no driver): here the pipeline is
completed with light-mask emitter clustering, sphere-traced visibility,
and interpolated-pose relit flythroughs (eval/relight.py).
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="i2sdf_tpu reconstruction")
    p.add_argument("--conf", required=True, help="config YAML path")
    p.add_argument("--exps_folder", default="exps")
    p.add_argument("--expname", default=None)
    p.add_argument("--scan_id", type=int, default=None)
    p.add_argument("--data_root", default="data")
    p.add_argument("--test", action="store_true")
    p.add_argument("--test_mode", default="render",
                   choices=["render", "mesh", "interpolate", "relight",
                            "relight_video"])
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--inter_id", type=int, nargs=2, default=[0, 1])
    p.add_argument("--indices", type=int, nargs="*", default=None)
    p.add_argument("--n_frames", type=int, default=60)
    p.add_argument("--frame_rate", type=int, default=24)
    p.add_argument("--full_res", action="store_true")
    p.add_argument("--is_val", action="store_true")
    p.add_argument("--val_mesh", action="store_true")
    p.add_argument("--score", action="store_true")
    p.add_argument("--far_clip", type=float, default=5.0)
    p.add_argument("--ckpt", default="last")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--spp", type=int, default=64,
                   help="samples per pixel (editing/relight branch)")
    p.add_argument("--edit_conf", default=None,
                   help="YAML with material override maps for relight "
                        "(keys: mask/normal/rough/kd/ks -> image paths)")
    p.add_argument("--n_emitters", type=int, default=1)
    p.add_argument("--emitter_scale", type=float, default=1.0)
    p.add_argument("--indirect_spp", type=int, default=None,
                   help="relight: one-bounce indirect samples per "
                        "shading point from the trained radiance field "
                        "(default: the `material.indirect_spp` config "
                        "key; 0 = constant-ambient approximation)")
    p.add_argument("--material", action="store_true",
                   help="train the material stage (intrinsic "
                        "decomposition) on top of this experiment's "
                        "reconstruction checkpoint; config via the "
                        "optional `material:` YAML section")
    p.add_argument("--use_material", action="store_true",
                   help="use this experiment's TRAINED material stage: "
                        "relight shades with the learned kd/ks/roughness "
                        "field + learned emission; mesh bakes the learned "
                        "albedo as per-vertex PLY colors")
    p.add_argument("--device_ids", type=int, nargs="*", default=None,
                   help="accepted for reference-CLI parity; device choice "
                        "is jax.devices() on TPU")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--no_fused", action="store_true",
                   help="disable the fused Pallas sampler MLP")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed before backend use "
                        "(multi-host TPU slices; coordinator discovered "
                        "from the TPU pod environment)")
    p.add_argument("--profile", default=None, metavar="START[:COUNT]",
                   help="capture a jax.profiler trace of COUNT training "
                        "steps (default 5) starting at step START into "
                        "<exp_dir>/profile/ (TensorBoard/Perfetto format; "
                        "the reference has no profiling subsystem)")
    return p


def resolve_exp_dir(args, conf) -> str:
    expname = args.expname or conf.train.get("expname", "run")
    scan_id = (args.scan_id if args.scan_id is not None
               else conf.dataset.get("scan_id", 0))
    conf.dataset.scan_id = scan_id
    base = os.path.join(args.exps_folder, f"{expname}_{scan_id}")
    version = args.version
    if version is None:
        m = re.search(r"version_(\d+)", args.conf)
        if m:
            version = int(m.group(1))
    if version is None:
        existing = []
        if os.path.isdir(base):
            for d in os.listdir(base):
                m = re.fullmatch(r"version_(\d+)", d)
                if m:
                    existing.append(int(m.group(1)))
        if args.test or args.resume or getattr(args, "material", False):
            # modes that load this experiment's checkpoint resolve to
            # the latest existing version instead of allocating a new one
            version = max(existing) if existing else 0
        else:
            version = max(existing) + 1 if existing else 0
    return os.path.join(base, f"version_{version}")


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    from .utils.jax_cache import set_compilation_cache

    set_compilation_cache()  # per-host subdir: stale cross-host CPU AOT
    import jax               # entries crash natively (see jax_cache.py)

    if args.multihost:
        # must run before the first backend touch (jax.devices below)
        from .parallel import initialize_multihost

        n_proc = initialize_multihost()
        print(f"[INFO] multi-host: process {jax.process_index()} "
              f"of {n_proc}")

    from .config import load_cfg
    from .models import renderer
    from .train.checkpoint import CheckpointManager
    from .train.state import create_train_state
    from .train.trainer import ReconstructionTrainer

    np.random.seed(args.seed)

    conf = load_cfg(args.conf)
    # --seed reaches the model init and the per-step RNG stream (the
    # trainer reads conf.seed); an explicit YAML `seed:` key wins unless
    # the flag was set to a non-default value on the command line.
    if args.seed != 42 or "seed" not in conf:
        conf.seed = args.seed
    exp_dir = resolve_exp_dir(args, conf)
    os.makedirs(exp_dir, exist_ok=True)
    print(f"[INFO] experiment dir: {exp_dir}")
    print(f"[INFO] devices: {jax.devices()}")
    fused = False if args.no_fused else None

    if not args.test and not args.material:
        trainer = ReconstructionTrainer(
            conf, exp_dir, data_root=args.data_root, is_val=args.is_val,
            val_mesh=args.val_mesh, fused_sampler=fused)
        trainer.fit(max_steps=args.max_steps, resume=args.resume,
                    profile=args.profile)
        return 0

    # ---- test/material modes: load params from the checkpoint -------------
    model_conf = conf.model
    model_conf.use_normal = False
    model_cfg = renderer.I2SDFConfig.from_cfgnode(model_conf)
    params = renderer.init(jax.random.PRNGKey(args.seed), model_cfg)
    state, _ = create_train_state(params)
    ckpt = CheckpointManager(os.path.join(exp_dir, "checkpoints", "orbax"))
    step = None if args.ckpt in ("last", "latest") else int(args.ckpt)
    state, _ = ckpt.restore(state, step=step)
    params = state.params
    print(f"[INFO] restored checkpoint @{int(state.step)}")

    if args.material:
        from .train.material import MaterialTrainer

        mt = MaterialTrainer(conf, exp_dir, recon_params=params,
                             model_cfg=model_cfg, data_root=args.data_root,
                             fused=fused, seed=args.seed)
        if args.resume:
            mt.resume()
        mt.fit(max_steps=args.max_steps)
        return 0

    if args.test_mode == "render":
        from .eval.render import run_render_eval

        run_render_eval(params, model_cfg, conf, exp_dir,
                        data_root=args.data_root, indices=args.indices,
                        is_val=args.is_val, full_res=args.full_res,
                        fused=fused)
    elif args.test_mode == "mesh":
        from .eval.mesh import run_mesh_eval

        material = None
        if args.use_material:
            from .train.material import load_material_stage

            material = load_material_stage(exp_dir, conf)
        run_mesh_eval(params, model_cfg, conf, exp_dir,
                      data_root=args.data_root, resolution=args.resolution,
                      score=args.score, far_clip=args.far_clip, fused=fused,
                      material=material)
    elif args.test_mode == "interpolate":
        from .eval.interpolate import run_interpolation

        run_interpolation(params, model_cfg, conf, exp_dir,
                          id0=args.inter_id[0], id1=args.inter_id[1],
                          n_frames=args.n_frames,
                          frame_rate=args.frame_rate,
                          data_root=args.data_root, fused=fused)
    elif args.test_mode in ("relight", "relight_video"):
        from .eval.relight import run_relight, run_relight_video

        edit_conf = None
        if args.edit_conf:
            import yaml

            with open(args.edit_conf) as f:
                edit_conf = yaml.safe_load(f)
        material = None
        if args.use_material:
            from .train.material import load_material_stage

            material = load_material_stage(exp_dir, conf)
        if args.test_mode == "relight_video":
            run_relight_video(params, model_cfg, conf, exp_dir,
                              id0=args.inter_id[0], id1=args.inter_id[1],
                              n_frames=args.n_frames,
                              frame_rate=args.frame_rate,
                              data_root=args.data_root, spp=args.spp,
                              n_emitters=args.n_emitters,
                              emitter_scale=args.emitter_scale,
                              edit_conf=edit_conf, fused=fused,
                              full_res=args.full_res,
                              seed=args.seed, material=material,
                              indirect_spp=args.indirect_spp)
        else:
            run_relight(params, model_cfg, conf, exp_dir,
                        data_root=args.data_root, indices=args.indices,
                        spp=args.spp, n_emitters=args.n_emitters,
                        emitter_scale=args.emitter_scale,
                        edit_conf=edit_conf, fused=fused,
                        full_res=args.full_res, seed=args.seed,
                        material=material,
                        indirect_spp=args.indirect_spp)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
