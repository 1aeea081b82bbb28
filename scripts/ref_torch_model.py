"""Clean-room PyTorch re-creation of the reference's full eval render
path, used as the ground truth for the cross-framework parity proof
(tests/test_crossfw.py and scripts/crossfw_parity.py).

The released I2-SDF dataset cannot enter this environment, so the
strongest available kitchen_0-class evidence is: build the reference's
model semantics in torch (this module — written from the reference's
behavior, not its code), save a Lightning-format checkpoint, import it
through `i2sdf_tpu.utils.interop`, render IDENTICAL rays through both
frameworks in eval mode, and assert rgb/depth/normal agreement.

Semantics reproduced (file:line in /root/reference):
* interleaved positional encoding (model/network/embedder.py:28-47);
* ImplicitNetwork: weight-norm linears, Softplus(beta=100), skip
  concat / sqrt(2), bounding-sphere clamp (model/network/mlp.py:10-150);
* RenderingNetwork nerf mode: [PE(view), features] -> ReLU -> sigmoid
  (model/network/mlp.py:159-229);
* LaplaceDensity with beta_min (model/network/density.py:5-30);
* ErrorBoundSampler Algorithm 1: uniform init, Lemma-2 beta bound, d*
  triangle bound, beta bisection, error-bound/weights pdfs, inverse-CDF
  (linspace u in eval), extras + final sort
  (model/network/ray_sampler.py:46-251);
* volume rendering + depth + eval normal map
  (model/network/__init__.py:80-240);
* camera rays from uv/intrinsics/pose (utils/rend_util.py:92-147).

Eval mode is fully deterministic (no stratification, linspace CDF u,
linspace extras), which is what makes bitwise-level comparison across
frameworks meaningful.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def interleaved_pe(x: torch.Tensor, multires: int) -> torch.Tensor:
    """Reference embedder layout: [x, sin(f0 x), cos(f0 x), sin(f1 x), ...]."""
    freqs = 2.0 ** torch.linspace(0.0, multires - 1, multires)
    parts = [x]
    for f in freqs:
        parts.append(torch.sin(x * f))
        parts.append(torch.cos(x * f))
    return torch.cat(parts, -1)


class RefImplicitNetwork(nn.Module):
    """8-layer-style SDF MLP: PE input, weight norm, Softplus(100),
    skip/sqrt2, sphere clamp. Layer l feeding a skip target narrows its
    output by the embedding width so the concat lands back at `width`."""

    def __init__(self, feature_size=16, width=64, n_hidden=3, skip=(2,),
                 multires=4, sdf_bounding_sphere=3.0, sphere_scale=1.0):
        super().__init__()
        self.multires = multires
        self.skip = set(skip)
        self.sdf_bounding_sphere = sdf_bounding_sphere
        self.sphere_scale = sphere_scale
        emb = 3 + 6 * multires
        dims = [emb] + [width] * n_hidden + [1 + feature_size]
        for i in range(len(dims) - 1):
            out = dims[i + 1] - (emb if (i + 1) in self.skip else 0)
            lin = nn.utils.parametrizations.weight_norm(
                nn.Linear(dims[i], out))
            setattr(self, f"lin{i}", lin)
        self.n_layers = len(dims) - 1
        self.act = nn.Softplus(beta=100)

    def raw_forward(self, x):
        e = interleaved_pe(x, self.multires)
        h = e
        for i in range(self.n_layers):
            if i in self.skip:
                h = torch.cat([h, e], -1) / math.sqrt(2.0)
            h = getattr(self, f"lin{i}")(h)
            if i < self.n_layers - 1:
                h = self.act(h)
        return h

    def _clamp(self, sdf, x):
        if self.sdf_bounding_sphere > 0.0:
            sphere = self.sphere_scale * (
                self.sdf_bounding_sphere - x.norm(2, 1, keepdim=True))
            sdf = torch.minimum(sdf, sphere)
        return sdf

    def get_sdf_vals(self, x):
        return self._clamp(self.raw_forward(x)[:, :1], x)

    def get_outputs(self, x):
        x = x.requires_grad_(True)
        out = self.raw_forward(x)
        sdf = self._clamp(out[:, :1], x)
        feat = out[:, 1:]
        grad = torch.autograd.grad(sdf, x, torch.ones_like(sdf),
                                   create_graph=False, retain_graph=True,
                                   only_inputs=True)[0]
        return sdf, feat, grad


class RefRenderingNetwork(nn.Module):
    """nerf mode: [PE(view_dirs), features] -> ReLU MLP -> sigmoid."""

    def __init__(self, feature_size=16, width=32, n_hidden=1, multires=3):
        super().__init__()
        self.multires = multires
        vemb = 3 + 6 * multires
        dims = [vemb + feature_size] + [width] * n_hidden + [3]
        for i in range(len(dims) - 1):
            setattr(self, f"lin{i}",
                    nn.utils.parametrizations.weight_norm(
                        nn.Linear(dims[i], dims[i + 1])))
        self.n_layers = len(dims) - 1

    def forward(self, view_dirs, feature):
        h = torch.cat([interleaved_pe(view_dirs, self.multires), feature],
                      -1)
        for i in range(self.n_layers):
            h = getattr(self, f"lin{i}")(h)
            h = (torch.relu(h) if i < self.n_layers - 1
                 else torch.sigmoid(h))
        return h


class RefLaplaceDensity(nn.Module):
    def __init__(self, beta=0.1, beta_min=1e-4):
        super().__init__()
        self.beta = nn.Parameter(torch.tensor(float(beta)))
        self.beta_min = beta_min

    def get_beta(self):
        return self.beta.abs() + self.beta_min

    def forward(self, sdf, beta=None):
        if beta is None:
            beta = self.get_beta()
        alpha = 1.0 / beta
        return alpha * (0.5 + 0.5 * sdf.sign() * torch.expm1(-sdf.abs()
                                                             / beta))


class RefErrorBoundSampler:
    """VolSDF Algorithm 1 with the reference's dynamic while-loop
    (eval-mode path: deterministic linspace everywhere)."""

    def __init__(self, scene_bounding_sphere=3.0, near=0.0, N_samples=16,
                 N_samples_eval=32, N_samples_extra=8, eps=0.1,
                 beta_iters=10, max_total_iters=5, add_tiny=1e-6):
        self.r = scene_bounding_sphere
        self.near, self.far = near, 2.0 * scene_bounding_sphere
        self.N_samples = N_samples
        self.N_samples_eval = N_samples_eval
        self.N_samples_extra = N_samples_extra
        self.eps, self.beta_iters = eps, beta_iters
        self.max_total_iters = max_total_iters
        self.add_tiny = add_tiny
        self.rounds_run = 0  # diagnostics: parity needs all rounds live

    def _error_bound(self, beta, density_fn, sdf, z_vals, dists, d_star):
        density = density_fn(sdf.reshape(z_vals.shape), beta=beta)
        shifted = torch.cat([torch.zeros(dists.shape[0], 1),
                             dists * density[:, :-1]], dim=-1)
        integral = torch.cumsum(shifted, dim=-1)
        err = torch.exp(-d_star / beta) * (dists ** 2.0) / (4 * beta ** 2)
        err_int = torch.cumsum(err, dim=-1)
        bound = (torch.clamp(torch.exp(err_int), max=1e6) - 1.0) \
            * torch.exp(-integral[:, :-1])
        return bound.max(-1)[0]

    @torch.no_grad()
    def get_z_vals(self, ray_dirs, cam_loc, implicit, density):
        R = ray_dirs.shape[0]
        beta0 = density.get_beta().detach()

        t = torch.linspace(0.0, 1.0, self.N_samples_eval)
        z_vals = self.near * (1.0 - t) + self.far * t
        z_vals = z_vals.unsqueeze(0).repeat(R, 1)
        samples, samples_idx = z_vals, None

        dists = z_vals[:, 1:] - z_vals[:, :-1]
        bound = (1.0 / (4.0 * math.log(self.eps + 1.0))) \
            * (dists ** 2.0).sum(-1)
        beta = torch.sqrt(bound)

        total_iters, not_converge = 0, True
        sdf = None
        while not_converge and total_iters < self.max_total_iters:
            pts = (cam_loc.unsqueeze(1)
                   + samples.unsqueeze(2) * ray_dirs.unsqueeze(1))
            samples_sdf = implicit.get_sdf_vals(pts.reshape(-1, 3))
            if samples_idx is not None:
                sdf_merge = torch.cat(
                    [sdf.reshape(-1, z_vals.shape[1] - samples.shape[1]),
                     samples_sdf.reshape(-1, samples.shape[1])], -1)
                sdf = torch.gather(sdf_merge, 1,
                                   samples_idx).reshape(-1, 1)
            else:
                sdf = samples_sdf

            d = sdf.reshape(z_vals.shape)
            dists = z_vals[:, 1:] - z_vals[:, :-1]
            a, b, c = dists, d[:, :-1].abs(), d[:, 1:].abs()
            first_cond = a.pow(2) + b.pow(2) <= c.pow(2)
            second_cond = a.pow(2) + c.pow(2) <= b.pow(2)
            s = (a + b + c) / 2.0
            area = s * (s - a) * (s - b) * (s - c)
            mask = ~first_cond & ~second_cond & (b + c - a > 0)
            first_only = first_cond & ~second_cond
            d_star = (first_only * b + second_cond * c
                      + torch.nan_to_num(2.0 * torch.sqrt(area) / a) * mask)
            d_star = (d[:, 1:].sign() * d[:, :-1].sign() == 1) * d_star

            curr_error = self._error_bound(beta0, density, sdf, z_vals,
                                           dists, d_star)
            conv_mask = curr_error <= self.eps
            beta = beta * ~conv_mask + beta0 * conv_mask
            beta_min = beta0.unsqueeze(0).repeat(R)
            beta_max = beta
            for _ in range(self.beta_iters):
                mid = (beta_min + beta_max) / 2.0
                err = self._error_bound(mid.unsqueeze(-1), density, sdf,
                                        z_vals, dists, d_star)
                ok = err <= self.eps
                beta_max = beta_max * ~ok + mid * ok
                beta_min = beta_min * ok + mid * ~ok
            beta = beta_max

            dens = density(sdf.reshape(z_vals.shape),
                           beta=beta.unsqueeze(-1))
            dists_inf = torch.cat(
                [dists, torch.full([R, 1], 1e10)], -1)
            free_energy = dists_inf * dens
            shifted = torch.cat([torch.zeros(R, 1),
                                 free_energy[:, :-1]], dim=-1)
            alpha = 1 - torch.exp(-free_energy)
            transmittance = torch.exp(-torch.cumsum(shifted, dim=-1))
            weights = alpha * transmittance

            total_iters += 1
            not_converge = bool(beta.max() > beta0)
            self.rounds_run = total_iters

            if not_converge and total_iters < self.max_total_iters:
                N = self.N_samples_eval
                err = (torch.exp(-d_star / beta.unsqueeze(-1))
                       * (dists_inf[:, :-1] ** 2.0)
                       / (4 * beta.unsqueeze(-1) ** 2))
                err_int = torch.cumsum(err, dim=-1)
                bound_op = (torch.clamp(torch.exp(err_int), max=1e6)
                            - 1.0) * transmittance[:, :-1]
                pdf = bound_op + self.add_tiny
            else:
                N = self.N_samples
                pdf = weights[..., :-1] + 1e-5
            pdf = pdf / torch.sum(pdf, -1, keepdim=True)
            cdf = torch.cumsum(pdf, -1)
            cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)

            u = torch.linspace(0.0, 1.0, N).unsqueeze(0).repeat(R, 1)
            inds = torch.searchsorted(cdf.contiguous(), u.contiguous(),
                                      right=True)
            below = torch.clamp(inds - 1, min=0)
            above = torch.clamp(inds, max=cdf.shape[-1] - 1)
            inds_g = torch.stack([below, above], -1)
            shape = [R, N, cdf.shape[-1]]
            cdf_g = torch.gather(cdf.unsqueeze(1).expand(shape), 2, inds_g)
            bins_g = torch.gather(z_vals.unsqueeze(1).expand(shape), 2,
                                  inds_g)
            denom = cdf_g[..., 1] - cdf_g[..., 0]
            dm = denom < 1e-5
            denom = dm + ~dm * denom
            tt = (u - cdf_g[..., 0]) / denom
            samples = bins_g[..., 0] + tt * (bins_g[..., 1] - bins_g[..., 0])

            if not_converge and total_iters < self.max_total_iters:
                z_vals, samples_idx = torch.sort(
                    torch.cat([z_vals, samples], -1), -1)

        z_samples = samples
        near = torch.full((R, 1), self.near)
        far = torch.full((R, 1), self.far)
        if self.N_samples_extra > 0:
            idx = torch.linspace(0, z_vals.shape[1] - 1,
                                 self.N_samples_extra).long()
            z_vals_extra = torch.cat([near, far, z_vals[:, idx]], -1)
        else:
            z_vals_extra = torch.cat([near, far], -1)
        z_all, _ = torch.sort(torch.cat([z_samples, z_vals_extra], -1), -1)
        return z_all


def ref_camera_rays(uv, pose, intrinsics):
    """uv (B, N, 2), pose (B, 4, 4) cam-to-world, K (B, 4, 4) ->
    (ray_dirs (B, N, 3) unnormalized, cam_loc (B, 3)).
    Parity utils/rend_util.py:92-147 (lift with skew, p_world = pose @ p_cam,
    dirs = world - cam)."""
    B, N = uv.shape[0], uv.shape[1]
    cam_loc = pose[:, :3, 3]
    fx = intrinsics[:, 0, 0].unsqueeze(-1)
    fy = intrinsics[:, 1, 1].unsqueeze(-1)
    cx = intrinsics[:, 0, 2].unsqueeze(-1)
    cy = intrinsics[:, 1, 2].unsqueeze(-1)
    sk = intrinsics[:, 0, 1].unsqueeze(-1)
    x, y = uv[..., 0], uv[..., 1]
    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx
    y_lift = (y - cy) / fy
    p_cam = torch.stack([x_lift, y_lift, torch.ones_like(x),
                         torch.ones_like(x)], -1)
    p_world = torch.bmm(pose, p_cam.transpose(1, 2)).transpose(1, 2)
    ray_dirs = p_world[..., :3] - cam_loc.unsqueeze(1)
    return ray_dirs, cam_loc


class RefModel(nn.Module):
    """Minimal reference eval model: rgb/depth/normal from a ray batch
    (parity model/network/__init__.py:80-240 eval path)."""

    def __init__(self, implicit: RefImplicitNetwork,
                 rendering: RefRenderingNetwork,
                 density: RefLaplaceDensity,
                 sampler: RefErrorBoundSampler):
        super().__init__()
        self.implicit_network = implicit
        self.rendering_network = rendering
        self.density = density
        self.sampler = sampler

    def render(self, uv, pose, intrinsics):
        ray_dirs, cam_loc = ref_camera_rays(uv, pose, intrinsics)
        B, N = ray_dirs.shape[0], ray_dirs.shape[1]
        cam_loc = cam_loc.unsqueeze(1).repeat(1, N, 1).reshape(-1, 3)
        ray_dirs = ray_dirs.reshape(-1, 3)
        ray_dirs_norm = torch.linalg.vector_norm(ray_dirs, dim=1)
        ray_dirs = F.normalize(ray_dirs, dim=1)

        z_all = self.sampler.get_z_vals(ray_dirs, cam_loc,
                                        self.implicit_network,
                                        self.density)
        z_max = z_all[:, -1]
        z_vals = z_all[:, :-1]
        S = z_vals.shape[1]

        pts = (cam_loc.unsqueeze(1)
               + z_vals.unsqueeze(2) * ray_dirs.unsqueeze(1))
        pts_flat = pts.reshape(-1, 3)
        dirs_flat = ray_dirs.unsqueeze(1).repeat(1, S, 1).reshape(-1, 3)

        sdf, feat, grad = self.implicit_network.get_outputs(pts_flat)
        with torch.no_grad():
            rgb_flat = self.rendering_network(dirs_flat, feat)
            rgb = rgb_flat.reshape(-1, S, 3)

            density_flat = self.density(sdf)
            density = density_flat.reshape(-1, S)
            dists = z_vals[:, 1:] - z_vals[:, :-1]
            dists = torch.cat(
                [dists, z_max.unsqueeze(-1) - z_vals[:, -1:]], -1)
            free_energy = dists * density
            shifted = torch.cat([torch.zeros(dists.shape[0], 1),
                                 free_energy], dim=-1)
            alpha = 1 - torch.exp(-free_energy)
            transmittance = torch.exp(-torch.cumsum(shifted, dim=-1))
            weights = alpha * transmittance[:, :-1]

            rgb_values = torch.sum(weights.unsqueeze(-1) * rgb, 1)
            dist = torch.sum(weights * z_vals, 1)
            depth_values = dist / torch.clamp(ray_dirs_norm, min=1e-6)

            normals = F.normalize(grad.detach(), dim=-1).reshape(-1, S, 3)
            normal_map = torch.sum(weights.unsqueeze(-1) * normals, 1)
            normal_map = F.normalize(normal_map, dim=-1)
        return {"rgb_values": rgb_values, "depth_values": depth_values,
                "normal_map": normal_map,
                "sampler_rounds": self.sampler.rounds_run}

    def lightning_state_dict(self):
        """state dict with the Lightning `model.` prefix + density key
        the reference checkpoints carry (main_recon.py:71-91 layout)."""
        sd = {}
        for name, net in (("implicit_network", self.implicit_network),
                          ("rendering_network", self.rendering_network)):
            for k, v in net.state_dict().items():
                sd[f"model.{name}.{k}"] = v
        sd["model.density.beta"] = self.density.beta.detach().clone()
        return sd
