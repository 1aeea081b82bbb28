"""Microbench the fused no-grad SDF MLP kernel (sampler hot path).

The late-beta train step is sampler-MLP dominated: ~1 TFLOP of the
3.66 TFLOP step is the 5 rounds x (1600 x 128)-point no-grad SDF eval,
and round-2 measured the kernel at 71 TFLOP/s bf16 (36% of v5e peak)
vs the v3 whole-render kernel's 115-124. This sweeps block_rows x
act_impl at the shipped flagship config and prints TFLOP/s + accuracy
per variant. act="none" is the no-epilogue diagnostic roof (measured
2.35-3.3 ms vs 2.9-3.4 ms at block 2048 across runs — the epilogue
costs ~0.6 ms/launch but run-to-run chip variance is ~10%).

Epilogue variants measured on-chip and REMOVED:
* packed-bf16 epilogue — Mosaic on v5e refuses packed-bf16 vector ops
  (cmpf AND the comparison-free max/abs/exp chain fail to lower);
* Pade-tail f32 (one transcendental) — 3.44 ms vs 2.90 at block 2048
  (slower: the rational-approx div eats the exp saving) with 7e-3 max
  SDF deviation;
* sub-block MXU/VPU interleave ("pipeline") — 60.7-69.2 TFLOP/s across
  block 512-4096 x pipeline 1/2/4 with pipeline never winning (Mosaic
  already schedules the strict chain as well as the interleave, and
  the extra live sub-blocks pressure VMEM).

Run on TPU: python scripts/bench_fused_mlp.py [--n 204800] [--steps 50]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=204800)  # 1600 rays x 128
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    from i2sdf_tpu.utils.jax_cache import set_compilation_cache
    set_compilation_cache()
    import jax
    import jax.numpy as jnp

    from i2sdf_tpu.models.mlp import ImplicitNetConfig, implicit_net_init
    from i2sdf_tpu.ops.pallas.fused_mlp import fused_sdf_mlp

    cfg = ImplicitNetConfig(
        feature_vector_size=256, sdf_bounding_sphere=4.0,
        dims=(256,) * 8, skip_in=(4,), bias=0.6,
        embed_type="positional", multires=6)
    params = implicit_net_init(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (args.n, 3)) * 1.5

    # analytic MACs of the effective (materialized, head-sliced) net:
    # mirror fused_sdf_mlp's own cost accounting
    dims = cfg.layer_dims()
    in0 = ((dims[0] + 127) // 128) * 128
    macs = in0 * dims[1]
    for i in range(1, len(dims) - 2):
        macs += dims[i] * dims[i + 1]
    macs += dims[-2] * 8  # sliced head
    flops_per_point = 2 * macs

    print(json.dumps({"n": args.n, "flops_per_point": flops_per_point,
                      "platform": jax.devices()[0].platform}))

    variants = [(b, "f32") for b in (512, 1024, 2048)]
    variants += [(2048, "none")]
    ref = None
    for block_rows, act in variants:
        def run():
            return fused_sdf_mlp(params, cfg, pts,
                                 block_rows=block_rows, act_impl=act)

        try:
            out = run()
            jax.block_until_ready(out)
        except Exception as e:  # VMEM OOM at big blocks — skip
            print(json.dumps({"block_rows": block_rows, "act": act,
                              "error": str(e)[-120:]}), flush=True)
            continue
        row = {"block_rows": block_rows, "act": act}
        if ref is None:
            ref = np.asarray(out)
        else:
            # accuracy vs the f32-epilogue reference ("none" is a
            # diagnostic roof — its values are meaningless)
            if act != "none":
                row["max_abs_dev"] = round(float(np.max(np.abs(
                    np.asarray(out) - ref))), 6)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.steps
        tflops = args.n * flops_per_point / dt / 1e12
        row.update({"ms": round(dt * 1e3, 3),
                    "tflops_per_sec": round(tflops, 1),
                    "mxu_frac": round(tflops / 197.0, 3)})
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
