"""On-chip sweep: sampler round kernel block_rows / sample_rows.

The d*/bisection/pdf phase of `ops/pallas/sampler_round.py` is
(BR, S) @ (S, S) matmul-dominated; at the shipped block_rows=64 the MXU
runs at half sublane occupancy (128 sublanes). This sweeps block sizes
at each round's S to find the best configuration, plus the fused
convergence-check kernel.

Usage (real TPU): python scripts/bench_round_blocks.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i2sdf_tpu.utils.jax_cache import set_compilation_cache

set_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from i2sdf_tpu.ops.pallas.sampler_round import (conv_check_pallas,
                                                sampler_round_pallas)


def timeit(fn, steps=50, warmup=3):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    R = 1600
    rng = np.random.default_rng(0)
    for S in (128, 384, 640):
        z = jnp.asarray(np.sort(rng.uniform(0, 6, (R, S)), -1), jnp.float32)
        sdf = jnp.asarray(rng.normal(size=(R, S)), jnp.float32)
        beta = jnp.full((R,), 0.05, jnp.float32)
        u = jnp.asarray(rng.uniform(0, 1, (R, 128)), jnp.float32)
        base = None
        for br, sr in ((64, 8), (128, 8), (128, 16), (256, 16),
                       (256, 32), (512, 32)):
            try:
                fn = lambda: sampler_round_pallas(
                    z, sdf, beta, u, 1e-3, beta_iters=10, eps=0.1,
                    add_tiny=1e-6, final=False, block_rows=br,
                    sample_rows=sr)
                got = np.asarray(fn()[0])
                if base is None:
                    base = got
                err = float(np.max(np.abs(got - base)))
                ms = timeit(fn)
                print(json.dumps({"S": S, "block_rows": br,
                                  "sample_rows": sr, "ms": round(ms, 3),
                                  "max_err": err}))
            except Exception as e:
                print(json.dumps({"S": S, "block_rows": br,
                                  "sample_rows": sr,
                                  "error": str(e).split("\n")[0][:120]}))
        for br in (64, 128, 256):
            try:
                fn = lambda: conv_check_pallas(z, sdf, 1e-3, eps=0.1,
                                               block_rows=br)
                ms = timeit(fn)
                print(json.dumps({"S": S, "conv_block_rows": br,
                                  "ms": round(ms, 3)}))
            except Exception as e:
                print(json.dumps({"S": S, "conv_block_rows": br,
                                  "error": str(e).split("\n")[0][:120]}))


if __name__ == "__main__":
    main()
