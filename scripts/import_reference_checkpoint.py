"""Import a trained reference (PyTorch Lightning) checkpoint.

Converts `last.ckpt`-style I2-SDF checkpoints into this framework's
orbax layout so every `--test` mode (render / mesh / interpolate /
relight) and `--resume` work on reference-trained models without
retraining (weight-norm unpacking + PE-layout permutation:
i2sdf_tpu/utils/interop.py).

Usage:
  python scripts/import_reference_checkpoint.py \
      --ckpt /path/to/last.ckpt --conf configs/synthetic.yml \
      --exp_dir exps/imported/version_0 [--step 200000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--conf", required=True)
    ap.add_argument("--exp_dir", required=True)
    ap.add_argument("--step", type=int, default=None,
                    help="step to record (default: the ckpt's global_step)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from i2sdf_tpu.config import load_cfg
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.train import create_train_state
    from i2sdf_tpu.train.checkpoint import CheckpointManager
    from i2sdf_tpu.utils.interop import (convert_state_dict,
                                         load_torch_checkpoint)

    conf = load_cfg(args.conf)
    model_node = conf.model
    model_node.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(model_node)

    sd, meta = load_torch_checkpoint(args.ckpt, with_meta=True)
    step = args.step
    if step is None:
        step = int(meta.get("global_step", 0))
    params = convert_state_dict(sd, cfg)

    # sanity: the converted tree must match a fresh init's structure
    import jax

    ref_params = renderer.init(jax.random.PRNGKey(0), cfg)
    ref_paths = {jax.tree_util.keystr(k)
                 for k, _ in jax.tree_util.tree_leaves_with_path(ref_params)}
    got_paths = {jax.tree_util.keystr(k)
                 for k, _ in jax.tree_util.tree_leaves_with_path(params)}
    if ref_paths != got_paths:
        missing = sorted(ref_paths - got_paths)[:5]
        extra = sorted(got_paths - ref_paths)[:5]
        raise SystemExit(f"converted tree mismatch: missing={missing} "
                         f"extra={extra}")

    state, _ = create_train_state(
        params, learning_rate=conf.train.learning_rate,
        decay_steps=conf.train.get("steps", 200_000))
    state = state._replace(step=jnp.int32(step))
    os.makedirs(args.exp_dir, exist_ok=True)
    with open(os.path.join(args.exp_dir, "config.yml"), "w") as f:
        f.write(conf.dump())
    mgr = CheckpointManager(os.path.join(args.exp_dir, "checkpoints",
                                         "orbax"))
    mgr.save(step, state)
    mgr.close()
    print(f"imported {args.ckpt} -> {args.exp_dir} at step {step} "
          f"(beta={float(params['beta']):.4g})")


if __name__ == "__main__":
    main()
