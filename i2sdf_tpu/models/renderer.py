"""I2SDF volume renderer: SDF + radiance (+ light-mask, + NeRF++ bg) model.

Capability parity with `/root/reference/model/network/__init__.py:19-286`
(I2SDFNetwork). Functional design: `I2SDFConfig` (static) + parameter
pytree; `render_rays` is a pure function suitable for `jit`/`shard_map`
with rays as the shard axis. RNG is explicit; `training`/`predict_only`
are static so train and eval trace to distinct optimal programs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.compositing import render_weights, render_weights_bg
from ..utils.cameras import get_camera_params
from ..utils.jmath import safe_norm, safe_normalize
from . import mlp
from .density import abs_density, effective_beta, laplace_density
from .mlp import ImplicitNetConfig, RenderingNetConfig
from .sampler import SamplerConfig, error_bound_z_vals


@dataclasses.dataclass(frozen=True)
class I2SDFConfig:
    feature_vector_size: int = 256
    scene_bounding_sphere: float = 3.0
    implicit: ImplicitNetConfig = None
    rendering: RenderingNetConfig = None
    light: ImplicitNetConfig | None = None
    bg_implicit: ImplicitNetConfig | None = None
    bg_rendering: RenderingNetConfig | None = None
    sampler: SamplerConfig = None
    beta_init: float = 0.1
    beta_min: float = 1e-4
    use_normal: bool = False
    detach_light_feature: bool = True

    @property
    def use_light(self) -> bool:
        return self.light is not None

    @property
    def use_bg(self) -> bool:
        return self.bg_implicit is not None

    @classmethod
    def from_cfgnode(cls, conf: Any) -> "I2SDFConfig":
        """Build from a `model:` config section (schema parity with
        `/root/reference/config/synthetic.yml:32-75`)."""
        fvs = conf.feature_vector_size
        sphere = conf.get("scene_bounding_sphere", 1.0)
        # bf16 matmul operands on TPU (the training chain is HBM-bound;
        # the MXU multiplies in bf16 under DEFAULT precision anyway —
        # counterpart of the reference's TF32 main_recon.py:61)
        cdt = conf.get("compute_dtype", "auto")
        if cdt == "auto":
            cdt = ("bfloat16" if jax.default_backend() == "tpu"
                   else "float32")

        imp = conf.implicit_network
        implicit = ImplicitNetConfig(
            feature_vector_size=fvs,
            sdf_bounding_sphere=0.0,  # reference passes 0.0 (network/__init__.py:26)
            d_in=imp.get("d_in", 3),
            d_out=imp.get("d_out", 1),
            dims=tuple(imp.dims),
            geometric_init=imp.get("geometric_init", True),
            bias=imp.get("bias", 1.0),
            skip_in=tuple(imp.get("skip_in", [])),
            weight_norm=imp.get("weight_norm", True),
            embed_type=imp.get("embed_type", None),
            multires=imp.get("multires", 6),
            sphere_scale=imp.get("sphere_scale", 1.0),
            compute_dtype=cdt,
        )
        ren = conf.rendering_network
        rendering = RenderingNetConfig(
            feature_vector_size=fvs,
            mode=ren.get("mode", "nerf"),
            d_in=ren.get("d_in", 3),
            d_out=ren.get("d_out", 3),
            dims=tuple(ren.dims),
            weight_norm=ren.get("weight_norm", True),
            embed_type=ren.get("embed_type", None),
            multires=ren.get("multires", 4),
            compute_dtype=cdt,
        )
        light = None
        if "light_network" in conf:
            ln = conf.light_network
            light = ImplicitNetConfig(
                feature_vector_size=0,
                sdf_bounding_sphere=0.0,
                d_in=fvs,
                d_out=1,
                dims=tuple(ln.dims),
                geometric_init=False,
                skip_in=tuple(ln.get("skip_in", [])),
                weight_norm=ln.get("weight_norm", True),
                embed_type=None,
                output_activation="sigmoid",
                compute_dtype=cdt,
            )
        bg_implicit = bg_rendering = None
        if "bg_network" in conf:
            bg = conf.bg_network
            bg_fvs = bg.feature_vector_size
            bgi = bg.implicit_network
            bg_implicit = ImplicitNetConfig(
                feature_vector_size=bg_fvs,
                sdf_bounding_sphere=0.0,
                d_in=bgi.get("d_in", 4),
                d_out=bgi.get("d_out", 1),
                dims=tuple(bgi.dims),
                geometric_init=bgi.get("geometric_init", False),
                skip_in=tuple(bgi.get("skip_in", [])),
                weight_norm=bgi.get("weight_norm", True),
                embed_type=bgi.get("embed_type", None),
                multires=bgi.get("multires", 6),
                compute_dtype=cdt,
            )
            bgr = bg.rendering_network
            bg_rendering = RenderingNetConfig(
                feature_vector_size=bg_fvs,
                mode=bgr.get("mode", "nerf"),
                d_in=bgr.get("d_in", 3),
                d_out=bgr.get("d_out", 3),
                dims=tuple(bgr.dims),
                weight_norm=bgr.get("weight_norm", True),
                embed_type=bgr.get("embed_type", None),
                multires=bgr.get("multires", 4),
                compute_dtype=cdt,
            )
        rs = conf.ray_sampler
        sampler = SamplerConfig(
            scene_bounding_sphere=sphere,
            near=rs.get("near", 0.0),
            N_samples=rs.N_samples,
            N_samples_eval=rs.N_samples_eval,
            N_samples_extra=rs.N_samples_extra,
            eps=rs.get("eps", 0.1),
            beta_iters=rs.get("beta_iters", 10),
            max_total_iters=rs.get("max_total_iters", 5),
            inverse_sphere_bg="bg_network" in conf,
            N_samples_inverse_sphere=rs.get("N_samples_inverse_sphere", 32),
            add_tiny=rs.get("add_tiny", 0.0),
            early_exit=rs.get("early_exit", True),
            per_ray_exit=rs.get("per_ray_exit", False),
            # explicit config tuple = fixed capacities at every beta;
            # absent = trainer/eval auto ladder (step.py PER_RAY_PHASES)
            per_ray_fracs=(tuple(rs["per_ray_fracs"])
                           if "per_ray_fracs" in rs else None),
            # tapering per-round eval budget (models/sampler.py); absent
            # = the reference's flat N_samples_eval every round
            round_eval_counts=(tuple(rs["round_eval_counts"])
                               if "round_eval_counts" in rs else None),
        )
        return cls(
            feature_vector_size=fvs,
            scene_bounding_sphere=sphere,
            implicit=implicit,
            rendering=rendering,
            light=light,
            bg_implicit=bg_implicit,
            bg_rendering=bg_rendering,
            sampler=sampler,
            beta_init=conf.density.params_init.beta,
            beta_min=conf.density.get("beta_min", 1e-4),
            use_normal=conf.get("use_normal", False),
            detach_light_feature=conf.get("detach_light_feature", True),
        )


def init(key, cfg: I2SDFConfig) -> dict:
    keys = jax.random.split(key, 5)
    params = {
        "implicit": mlp.implicit_net_init(keys[0], cfg.implicit),
        "rendering": mlp.rendering_net_init(keys[1], cfg.rendering),
        "beta": jnp.asarray(cfg.beta_init, jnp.float32),
    }
    if cfg.use_light:
        params["light"] = mlp.implicit_net_init(keys[2], cfg.light)
    if cfg.use_bg:
        params["bg_implicit"] = mlp.implicit_net_init(keys[3], cfg.bg_implicit)
        params["bg_rendering"] = mlp.rendering_net_init(keys[4], cfg.bg_rendering)
    return params


def depth2pts_outside(ray_o, ray_d, depth, bounding_sphere: float):
    """Inverted-sphere background parametrization (NeRF++), Rodrigues form.

    Parity with `/root/reference/model/network/__init__.py:258-286`.
    depth: inverse distance in [0, 1/R].
    """
    o_dot_d = jnp.sum(ray_d * ray_o, axis=-1)
    under_sqrt = o_dot_d**2 - (jnp.sum(ray_o**2, -1) - bounding_sphere**2)
    d_sphere = jnp.sqrt(jnp.maximum(under_sqrt, 1e-12)) - o_dot_d
    p_sphere = ray_o + d_sphere[..., None] * ray_d
    p_mid = ray_o - o_dot_d[..., None] * ray_d
    p_mid_norm = jnp.linalg.norm(p_mid, axis=-1)

    rot_axis = jnp.cross(ray_o, p_sphere)
    rot_axis = rot_axis / jnp.maximum(
        jnp.linalg.norm(rot_axis, axis=-1, keepdims=True), 1e-12)
    phi = jnp.arcsin(jnp.clip(p_mid_norm / bounding_sphere, -1.0, 1.0))
    theta = jnp.arcsin(jnp.clip(p_mid_norm * depth, -1.0, 1.0))
    rot_angle = (phi - theta)[..., None]

    p_new = (p_sphere * jnp.cos(rot_angle)
             + jnp.cross(rot_axis, p_sphere) * jnp.sin(rot_angle)
             + rot_axis * jnp.sum(rot_axis * p_sphere, -1, keepdims=True)
             * (1.0 - jnp.cos(rot_angle)))
    p_new = p_new / jnp.maximum(
        jnp.linalg.norm(p_new, axis=-1, keepdims=True), 1e-12)
    return jnp.concatenate([p_new, depth[..., None]], axis=-1)


def _bg_fused_enabled(training: bool, fused_sampler, fused_train_grad):
    """Gate for the fused bg MLP pair (tests monkeypatch this to force
    the branch on the CPU backend in interpret mode)."""
    return fused_train_grad if training else fused_sampler


def render_rays(params: dict, cfg: I2SDFConfig, inputs: dict, key,
                training: bool, predict_only: bool = False,
                sdf_fn_nograd=None, fused_sampler: bool = False,
                fused_train_grad: bool | None = None) -> dict:
    """Render a batch of rays; returns the reference's output dict.

    inputs: {"uv": (B, N, 2), "intrinsics": (B, 4, 4), "pose": (B, 4, 4)
    or (B, 7), optional "pointcloud": (P, 3)}.
    `sdf_fn_nograd` optionally overrides the sampler's SDF evaluator;
    `fused_sampler=True` (static) uses the fused Pallas MLP kernel for
    the sampler's no-grad evaluations (TPU hot path, ~15x XLA).
    `fused_train_grad` gates the custom-VJP fused forward on the
    differentiated training path (wins the full step on v5e since the
    wide-block PE change — the train step defaults it ON for TPU
    backends; see docs/PERFORMANCE.md).
    """
    if fused_train_grad is None:
        fused_train_grad = False
    k_sampler, k_eik, k_jitter, k_cam = jax.random.split(key, 4)

    uv = inputs["uv"]
    ray_dirs_b, cam_loc_b = get_camera_params(uv, inputs["pose"],
                                              inputs["intrinsics"])
    B, N = ray_dirs_b.shape[0], ray_dirs_b.shape[1]
    R = B * N
    cam_loc = jnp.broadcast_to(cam_loc_b[:, None, :], (B, N, 3)).reshape(-1, 3)
    ray_dirs = ray_dirs_b.reshape(-1, 3)
    ray_dirs_norm = jnp.linalg.norm(ray_dirs, axis=-1)
    ray_dirs = ray_dirs / jnp.maximum(ray_dirs_norm[:, None], 1e-12)

    beta = effective_beta(params["beta"], cfg.beta_min)

    round_impl = None
    conv_impl = None
    if sdf_fn_nograd is None:
        if fused_sampler:
            from ..ops.pallas.fused_mlp import fused_sdf_mlp
            from ..ops.pallas.sampler_round import (make_conv_check_impl,
                                                    make_round_impl)

            def sdf_fn_nograd(pts):
                return fused_sdf_mlp(
                    jax.lax.stop_gradient(params["implicit"]), cfg.implicit,
                    pts)

            round_impl = make_round_impl(cfg.sampler)
            conv_impl = make_conv_check_impl(cfg.sampler)
        else:
            def sdf_fn_nograd(pts):
                return mlp.sdf_vals(
                    jax.lax.stop_gradient(params["implicit"]), cfg.implicit,
                    pts)[:, 0]

    z_all, z_vals_bg, z_samples_eik = error_bound_z_vals(
        cfg.sampler, sdf_fn_nograd, k_sampler, ray_dirs, cam_loc, beta,
        training, round_impl=round_impl, conv_impl=conv_impl)

    z_max = z_all[:, -1]
    z_vals = z_all[:, :-1]
    S = z_vals.shape[1]

    points = cam_loc[:, None, :] + z_vals[..., None] * ray_dirs[:, None, :]
    points_flat = points.reshape(-1, 3)
    dirs_flat = jnp.broadcast_to(
        ray_dirs[:, None, :], (R, S, 3)).reshape(-1, 3)

    returns_grad = cfg.use_normal or (not training) or cfg.rendering.mode == "idr"
    rgb_flat = None
    lmask_fused = None
    eik_all = None
    grad_theta_folded = None
    if training and not predict_only:
        # eikonal points: uniform in the bounding cube + near-surface +
        # jittered neighbors (parity network/__init__.py:176-193) —
        # built BEFORE the render forward so the v3 fused path can fold
        # them into the same kernel batch (one launch pair instead of two)
        n_eik = R
        eik_uniform = jax.random.uniform(
            k_eik, (n_eik, 3),
            minval=-cfg.scene_bounding_sphere,
            maxval=cfg.scene_bounding_sphere)
        eik_near = (cam_loc[:, None, :]
                    + z_samples_eik[..., None] * ray_dirs[:, None, :]
                    ).reshape(-1, 3)
        n_near = eik_near.shape[0]
        neighbors = eik_near + jax.random.uniform(
            k_jitter, eik_near.shape, minval=-0.005, maxval=0.005)
        eik_all = jnp.concatenate([eik_uniform, eik_near, neighbors],
                                  axis=0)
    if not training and fused_sampler:
        # eval never differentiates w.r.t. params: the whole-render v3
        # forward yields sdf/normals/rgb in ONE launch on nerf/no-light
        # configs; otherwise the v2 forward+reverse-sweep kernel gives
        # sdf/features/normals (5.2 ms vs 11.5 ms tangent-stream v1 at
        # 155k pts) and the radiance net runs in XLA
        from ..ops.pallas.fused_train import (render_core_fused,
                                              supports_render_core)

        p_sg = jax.lax.stop_gradient(params)
        if supports_render_core(cfg.implicit, cfg.rendering, cfg.light):
            if cfg.use_light:
                sdf, gradients, rgb_flat, lmask_fused = render_core_fused(
                    p_sg["implicit"], cfg.implicit, p_sg["rendering"],
                    cfg.rendering, points_flat, dirs_flat, block_rows=512,
                    params_light=p_sg["light"], lcfg=cfg.light,
                    detach_light=cfg.detach_light_feature)
            else:
                sdf, gradients, rgb_flat = render_core_fused(
                    p_sg["implicit"], cfg.implicit, p_sg["rendering"],
                    cfg.rendering, points_flat, dirs_flat, block_rows=512)
            feature_vectors = None
        else:
            from ..ops.pallas.fused_rev import sdf_outputs_fused_rev

            sdf, feature_vectors, gradients = sdf_outputs_fused_rev(
                p_sg["implicit"], cfg.implicit, points_flat,
                block_rows=512)
    elif training and fused_train_grad and returns_grad:
        from ..ops.pallas.fused_train import (render_core_fused,
                                              supports_render_core)

        if supports_render_core(cfg.implicit, cfg.rendering, cfg.light):
            # whole-render fused kernel (v3): SDF + radiance MLP (+ the
            # light head, when configured) fwd/bwd in one launch each —
            # the (N, feat) feature tensor never leaves VMEM
            # (docs/PERFORMANCE.md). The eikonal points ride in the same
            # batch (rgb/sdf rows of those points are unused, so their
            # cotangents are zero).
            n_main = points_flat.shape[0]
            if eik_all is not None:
                pts_in = jnp.concatenate([points_flat, eik_all], axis=0)
                dirs_in = jnp.concatenate(
                    [dirs_flat, jnp.zeros_like(eik_all)], axis=0)
            else:
                pts_in, dirs_in = points_flat, dirs_flat
            if cfg.use_light:
                sdf_a, grad_a, rgb_a, lmask_a = render_core_fused(
                    params["implicit"], cfg.implicit, params["rendering"],
                    cfg.rendering, pts_in, dirs_in,
                    params_light=params["light"], lcfg=cfg.light,
                    detach_light=cfg.detach_light_feature)
                lmask_fused = lmask_a[:n_main]
            else:
                sdf_a, grad_a, rgb_a = render_core_fused(
                    params["implicit"], cfg.implicit, params["rendering"],
                    cfg.rendering, pts_in, dirs_in)
            sdf, gradients, rgb_flat = (sdf_a[:n_main], grad_a[:n_main],
                                        rgb_a[:n_main])
            if eik_all is not None:
                grad_theta_folded = grad_a[n_main:]
            feature_vectors = None
        else:
            # SDF-only custom-VJP fused forward (v2), radiance in XLA:
            # differentiable w.r.t. params including through the spatial
            # gradient (normal-map loss)
            from ..ops.pallas.fused_rev import sdf_outputs_fused_rev

            sdf, feature_vectors, gradients = sdf_outputs_fused_rev(
                params["implicit"], cfg.implicit, points_flat)
    else:
        sdf, feature_vectors, gradients = mlp.sdf_outputs(
            params["implicit"], cfg.implicit, points_flat, returns_grad)

    if rgb_flat is None:
        rgb_flat = mlp.rendering_net_apply(
            params["rendering"], cfg.rendering, points_flat, gradients,
            dirs_flat, feature_vectors)
    rgb = rgb_flat.reshape(R, S, 3)

    density = laplace_density(sdf, beta).reshape(R, S)
    weights, bg_transmittance = render_weights(z_vals, z_max, density)

    fg_rgb_values = jnp.sum(weights[..., None] * rgb, axis=1)
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    dist = jnp.sum(weights * z_vals, axis=1)
    depth_values = dist / jnp.maximum(ray_dirs_norm, 1e-6)

    if cfg.use_bg:
        Nbg = z_vals_bg.shape[1]
        z_bg = jnp.flip(z_vals_bg, axis=-1)  # 1 -> 0
        bg_dirs = jnp.broadcast_to(ray_dirs[:, None, :], (R, Nbg, 3))
        bg_locs = jnp.broadcast_to(cam_loc[:, None, :], (R, Nbg, 3))
        bg_points = depth2pts_outside(
            bg_locs, bg_dirs, z_bg, cfg.scene_bounding_sphere)
        bg_fused = _bg_fused_enabled(training, fused_sampler,
                                     fused_train_grad)
        if bg_fused:
            from ..ops.pallas.fused_bg import (bg_core_fused,
                                               supports_bg_core)

            bg_fused = supports_bg_core(cfg.bg_implicit, cfg.bg_rendering)
        if bg_fused:
            # both bg MLPs in one launch pair (fwd + first-order bwd);
            # nothing upstream of the inverse-sphere points is trainable
            # so no spatial-gradient machinery is needed (fused_bg.py)
            bg_params = (params if training
                         else jax.lax.stop_gradient(params))
            bg_sdf, bg_rgb_flat = bg_core_fused(
                bg_params["bg_implicit"], cfg.bg_implicit,
                bg_params["bg_rendering"], cfg.bg_rendering,
                bg_points.reshape(-1, 4), bg_dirs.reshape(-1, 3))
        else:
            bg_out = mlp.implicit_net_apply(
                params["bg_implicit"], cfg.bg_implicit,
                bg_points.reshape(-1, 4))
            bg_sdf = bg_out[:, :1]
            bg_feat = bg_out[:, 1:]
            bg_rgb_flat = mlp.rendering_net_apply(
                params["bg_rendering"], cfg.bg_rendering, None, None,
                bg_dirs.reshape(-1, 3), bg_feat)
        bg_rgb = bg_rgb_flat.reshape(R, Nbg, 3)
        bg_density = abs_density(bg_sdf).reshape(R, Nbg)
        bg_weights = render_weights_bg(z_bg, bg_density)
        bg_rgb_values = jnp.sum(bg_weights[..., None] * bg_rgb, axis=1)
        rgb_values = fg_rgb_values + bg_transmittance[:, None] * bg_rgb_values
    else:
        rgb_values = fg_rgb_values

    output = {
        "rgb_values": rgb_values,
        "depth_values": depth_values,
        "weight_sum": weight_sum,
    }

    if cfg.use_light:
        if lmask_fused is not None:
            # light head already evaluated inside the v3 kernel (feature
            # relu + detach semantics are in-kernel)
            lmask = lmask_fused.reshape(R, S, 1)
        else:
            light_features = jax.nn.relu(feature_vectors)
            if cfg.detach_light_feature:
                light_features = jax.lax.stop_gradient(light_features)
            lmask_flat = mlp.implicit_net_apply(
                params["light"], cfg.light, light_features)
            lmask = lmask_flat.reshape(R, S, 1)
        output["light_mask"] = jnp.sum(
            jax.lax.stop_gradient(weights)[..., None] * lmask, axis=1)

    if predict_only:
        return output

    if training:
        if grad_theta_folded is not None:
            grad_theta = grad_theta_folded
        elif fused_train_grad:
            from ..ops.pallas.fused_rev import sdf_outputs_fused_rev

            grad_theta = sdf_outputs_fused_rev(
                params["implicit"], cfg.implicit, eik_all)[2]
        else:
            grad_theta = mlp.sdf_gradient(
                params["implicit"], cfg.implicit, eik_all)
        output["grad_theta"] = grad_theta[: n_eik + n_near]
        normals_pair = safe_normalize(grad_theta[n_eik:])
        output["diff_norm"] = safe_norm(
            normals_pair[:n_near] - normals_pair[n_near:], axis=-1)

        if "pointcloud" in inputs:
            surface_points = inputs["pointcloud"]
            cam_idx = jax.random.randint(k_cam, (), 0, R)
            surface_points = jnp.concatenate(
                [surface_points, cam_loc[cam_idx][None, :]], axis=0)
            surface_sdf = mlp.sdf_vals(
                params["implicit"], cfg.implicit, surface_points)
            output["surface_sdf"] = surface_sdf[:-1]

        if cfg.use_normal:
            normals = safe_normalize(gradients).reshape(R, S, 3)
            normal_map = jnp.sum(
                jax.lax.stop_gradient(weights)[..., None] * normals, axis=1)
            output["normal_values"] = safe_normalize(normal_map)
    else:
        gradients = jax.lax.stop_gradient(gradients)
        normals = safe_normalize(gradients).reshape(R, S, 3)
        normal_map = jnp.sum(weights[..., None] * normals, axis=1)
        output["normal_map"] = safe_normalize(normal_map)

    return output
