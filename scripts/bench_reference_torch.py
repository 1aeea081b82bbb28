"""Measured cross-framework anchor for BASELINE.md: a clean-room torch
re-creation of the reference's training step (same shapes/algorithm as
`/root/reference/model/network/mlp.py:10-141` + `ray_sampler.py:84-132`:
8x256 SDF MLP with PE-39/skip/weight-norm/Softplus(100), 4x256 radiance
MLP, 5 error-bound sampler rounds of no-grad SDF evals, differentiated
forward at ~97 samples/ray with create_graph=True spatial gradients
[double backward], rgb+eikonal+normal losses, Adam) benchmarked on THIS
machine's CPU, next to i2sdf_tpu's step on the same CPU via JAX.

The reference publishes no absolute throughput and its A6000 is not
available here, so `bench.py`'s 6,400 rays/s baseline remains an
estimate — this script pins down the only thing measurable in this
environment: the same-hardware, same-algorithm framework ratio.

Usage:  python scripts/bench_reference_torch.py [--rays 1600] [--steps 3]
Prints one JSON line:
  {"torch_cpu_rays_per_sec": ..., "jax_cpu_rays_per_sec": ..., "ratio": ...}
"""

import argparse
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_torch(rays: int, n_steps: int) -> float:
    import numpy as np
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)

    multires = 6
    freqs = 2.0 ** torch.linspace(0.0, multires - 1, multires)

    def embed(x):  # reference-interleaved PE (embedder.py:28-47 shape)
        parts = [x]
        for f in freqs:
            parts += [torch.sin(x * f), torch.cos(x * f)]
        return torch.cat(parts, -1)

    class Implicit(nn.Module):  # mlp.py:10-105 shape
        def __init__(self, d_emb=39, width=256, feat=256, skip=4, n=9):
            super().__init__()
            self.skip = skip
            dims = [d_emb] + [width] * 8 + [1 + feat]
            layers = []
            for i in range(n):
                out = dims[i + 1] - (d_emb if i + 1 == skip else 0)
                layers.append(nn.utils.parametrizations.weight_norm(
                    nn.Linear(dims[i], out)))
            self.layers = nn.ModuleList(layers)
            self.act = nn.Softplus(beta=100)

        def forward(self, x):
            e = embed(x)
            h = e
            for i, lin in enumerate(self.layers):
                if i == self.skip:
                    h = torch.cat([h, e], -1) / math.sqrt(2.0)
                h = lin(h)
                if i < len(self.layers) - 1:
                    h = self.act(h)
            return h

    class Rendering(nn.Module):  # mlp.py:146-229 nerf-mode shape
        def __init__(self, feat=256, vdim=27, width=256):
            super().__init__()
            dims = [feat + vdim] + [width] * 4 + [3]
            self.layers = nn.ModuleList(
                [nn.utils.parametrizations.weight_norm(
                    nn.Linear(dims[i], dims[i + 1]))
                 for i in range(5)])

        def forward(self, h):
            for i, lin in enumerate(self.layers):
                h = lin(h)
                h = (torch.relu(h) if i < len(self.layers) - 1
                     else torch.sigmoid(h))
            return h

    vfreqs = 2.0 ** torch.linspace(0.0, 3.0, 4)

    def vembed(d):
        parts = [d]
        for f in vfreqs:
            parts += [torch.sin(d * f), torch.cos(d * f)]
        return torch.cat(parts, -1)

    imp, ren = Implicit(), Rendering()
    opt = torch.optim.Adam(list(imp.parameters()) + list(ren.parameters()),
                           lr=5e-4)
    rng = np.random.default_rng(0)
    cam = torch.tensor(rng.uniform(-0.1, 0.1, (rays, 3)), dtype=torch.float32)
    dirs = torch.tensor(rng.normal(size=(rays, 3)), dtype=torch.float32)
    dirs = dirs / dirs.norm(dim=-1, keepdim=True)
    gt_rgb = torch.rand(rays, 3)
    gt_n = torch.randn(rays, 3)
    gt_n = gt_n / gt_n.norm(dim=-1, keepdim=True)

    S_eval, S_final, n_rounds = 128, 97, 5

    def step():
        opt.zero_grad()
        # sampler: 5 no-grad rounds at 128 evals/ray (ray_sampler.py:84-132
        # worst case; z refinement replaced by re-stratification — the
        # MLP evaluation cost is what's being measured)
        z = torch.sort(torch.rand(rays, S_eval) * 4.0, -1).values
        with torch.no_grad():
            for _ in range(n_rounds):
                pts = cam[:, None, :] + z[..., None] * dirs[:, None, :]
                _ = imp(pts.reshape(-1, 3))[:, :1]
                z = torch.sort(z + torch.rand_like(z) * 1e-3, -1).values
        # differentiated forward at 97 samples with create_graph grads
        zf = torch.sort(torch.rand(rays, S_final) * 4.0, -1).values
        pts = (cam[:, None, :] + zf[..., None] * dirs[:, None, :]
               ).reshape(-1, 3).requires_grad_(True)
        out = imp(pts)
        sdf, feat = out[:, :1], out[:, 1:]
        grad = torch.autograd.grad(sdf.sum(), pts, create_graph=True)[0]
        vd = vembed(dirs)[:, None, :].expand(rays, S_final, 27).reshape(-1, 27)
        rgb = ren(torch.cat([vd, feat], -1)).reshape(rays, S_final, 3)
        density = torch.exp(-sdf.reshape(rays, S_final).abs() / 0.1)
        w = density / (density.sum(-1, keepdim=True) + 1e-6)
        rgb_v = (w[..., None] * rgb).sum(1)
        normals = F.normalize(grad, dim=-1).reshape(rays, S_final, 3)
        nmap = (w[..., None].detach() * normals).sum(1)
        loss = (F.l1_loss(rgb_v, gt_rgb)
                + 0.1 * ((grad.norm(dim=-1) - 1) ** 2).mean()
                + 0.05 * F.l1_loss(F.normalize(nmap, dim=-1), gt_n))
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    dt = time.perf_counter() - t0
    return rays * n_steps / dt


def bench_jax_cpu(rays: int, n_steps: int) -> float:
    """Runs bench.py's step on the CPU backend in a clean subprocess."""
    from __graft_entry__ import _sanitized_cpu_env

    env = _sanitized_cpu_env(1)
    env["BENCH_STEPS"] = str(n_steps)
    env["BENCH_ALLOW_CPU"] = "1"  # bench.py's orchestrator otherwise
    # refuses to measure on a CPU-only backend
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["value"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1600)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--skip_jax", action="store_true")
    args = ap.parse_args()

    torch_rps = bench_torch(args.rays, args.steps)
    result = {"torch_cpu_rays_per_sec": round(torch_rps, 1),
              "rays": args.rays, "steps": args.steps}
    if not args.skip_jax:
        jax_rps = bench_jax_cpu(args.rays, args.steps)
        result["jax_cpu_rays_per_sec"] = round(jax_rps, 1)
        result["ratio"] = round(jax_rps / torch_rps, 3)
    print(json.dumps(result))
    # machine-readable artifact next to the TPU evidence, so the
    # same-silicon anchor is not prose-only. Only the full torch-vs-jax
    # run writes it — a --skip_jax re-check must not clobber the
    # committed anchor with a partial record missing the ratio.
    if args.skip_jax:
        print("skip_jax: not rewriting docs/evidence/cpu_anchor.json",
              file=sys.stderr)
        return
    out_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            "evidence", "cpu_anchor.json")
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"wrote {os.path.normpath(out_path)}", file=sys.stderr)


if __name__ == "__main__":
    main()
