"""Jitted training / eval step factories.

The whole optimizer step — ray-batch gather, adaptive sampling, forward,
loss, backward, Adam update, and (in the bubble window) point-cloud
importance sampling + pdf scatter update — is ONE XLA program with no
host round-trips. This replaces the reference's DataLoader + Lightning
loop (`/root/reference/model/trainer/recon.py:209-287`).

Sharding: `make_train_step(..., mesh=...)` shards the ray batch over the
mesh's 'data' axis via NamedSharding constraints; gradients are reduced
by XLA-inserted collectives over ICI (SURVEY.md §2c plan).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..data.recon import DeviceArrays, sample_batch
from ..models import renderer
from ..models.losses import compute_losses
from ..utils.imaging import psnr as psnr_fn


def _auto_fused(fused_sampler):
    """Default the fused Pallas sampler MLP to on for TPU backends."""
    if fused_sampler is None:
        return jax.default_backend() not in ("cpu",)
    return fused_sampler


# Per-ray sampler compaction phases: (beta_floor, per_ray_fracs) — the
# first row whose floor < beta wins; `None` means plain global early
# exit (it converges by round 1-2 at large beta, so compaction adds
# only overhead there). Capacities are calibrated from the measured
# per-round converged fractions on the 200k quality checkpoint
# (scripts/diag_per_ray.py; docs/evidence/round2_cpu.json): e.g. at
# beta=0.03, 31% of rays converge after round 1 and 90% after round 2,
# while the GLOBAL exit (jnp.all) never fires. Caps sit well above the
# measured unconverged fractions; the remaining quality cost comes
# from CONVERGED rays losing the bonus refinement the reference's
# global loop gives them — measured on resumed-checkpoint A/Bs at
# beta=0.01: +4.2% loss at caps (.5,.25), +2.0% at (.75,.5), +1% at
# the late-schedule phase. The ladder below takes the conservative
# points; tighten per-config via ray_sampler.per_ray_fracs if speed
# matters more. The trainer re-specializes the jitted step whenever
# the learned beta crosses a phase boundary (cached recompiles).
PER_RAY_PHASES = (
    (0.05, None),
    (0.02, (1.0, 0.875, 0.5, 0.375)),
    (0.005, (1.0, 1.0, 0.75, 0.5)),
    (0.0, (1.0, 1.0, 1.0, 0.5)),
)


def per_ray_fracs_for_beta(beta: float):
    """Capacity schedule for the current learned beta (see above)."""
    for floor, fracs in PER_RAY_PHASES:
        if beta > floor:
            return fracs
    return PER_RAY_PHASES[-1][1]


def cfg_with_fracs(model_cfg, fracs):
    """Specialize a model cfg's sampler to a per-ray capacity phase
    (None = plain global early exit). Shared by the trainer's step
    swapping and the eval chunk renderer."""
    import dataclasses

    if fracs is None:
        if not model_cfg.sampler.per_ray_exit:
            return model_cfg
        return dataclasses.replace(
            model_cfg, sampler=dataclasses.replace(
                model_cfg.sampler, per_ray_exit=False))
    return dataclasses.replace(
        model_cfg, sampler=dataclasses.replace(
            model_cfg.sampler, per_ray_exit=True,
            per_ray_fracs=tuple(fracs)))


def make_train_step(model_cfg, tx: optax.GradientTransformation,
                    batch_size: int, mesh=None, bubble: bool = False,
                    bubble_batch_size: int | None = None,
                    pdf_prune: float = 0.0, pdf_max: float | None = None,
                    pdf_criterion: str = "DEPTH",
                    donate: bool = True, fused_sampler: bool | None = None,
                    fused_train_grad: bool | None = None,
                    angular_reference_bug: bool = False):
    """Build the jitted step.

    Signature of the returned fn (bubble=False):
        step(state, data: DeviceArrays, key, weights) -> (state, metrics)
    With bubble=True:
        step(state, data, key, weights, pdf, sample_count)
            -> (state, metrics, pdf, sample_count)
    where `pdf`/`sample_count` are (P,) device arrays over the bubble
    point cloud (parity: trainer/recon.py:142-170,242-252).
    """
    bubble_bs = bubble_batch_size or batch_size
    fused = _auto_fused(fused_sampler)
    # reverse-sweep custom-VJP (fused_rev v2) wins the full step on TPU
    # since the wide-block PE change (44.9 vs 55.8 ms at the flagship
    # config; the old interleaved PE made its XLA-side _prep the
    # bottleneck) — default ON for TPU backends, like the fused sampler
    fused_grad = _auto_fused(fused_train_grad)

    def loss_and_metrics(params, data: DeviceArrays, key, weights):
        k_batch, k_bubble, k_render = jax.random.split(key, 3)
        indices, inputs, gt = sample_batch(data, k_batch, batch_size)

        bubble_idx = None
        if bubble:
            # Two-stage bucketed categorical sampling over the live pdf:
            # bucket masses (one reduce over P) -> per-draw bucket choice
            # -> within-bucket choice on gathered rows. Replaces a
            # P-wide Gumbel top-k (P can be ~16M points: RNG + top_k over
            # the full cloud cost ~40 ms/step; this is ~P-read + O(k)).
            # Sampling is WITH replacement — for k=1600 draws from
            # millions of points the collision probability is negligible
            # vs torch.multinomial(replacement=False) in the reference.
            pdf = weights["_pdf"]
            n_buckets = 4096
            p_pad = (-pdf.shape[0]) % n_buckets
            pdf2d = jnp.pad(pdf, (0, p_pad)).reshape(n_buckets, -1)
            per_bucket = pdf2d.shape[1]
            k_b, k_w = jax.random.split(k_bubble)
            log_mass = jnp.log(jnp.maximum(pdf2d.sum(-1), 1e-20))
            log_mass = jnp.where(pdf2d.sum(-1) > 0, log_mass, -jnp.inf)
            b_idx = jax.random.categorical(k_b, log_mass, shape=(bubble_bs,))
            rows = pdf2d[b_idx]  # (k, per_bucket)
            log_rows = jnp.where(rows > 0,
                                 jnp.log(jnp.maximum(rows, 1e-20)),
                                 -jnp.inf)
            w_idx = jax.random.categorical(k_w, log_rows, axis=-1)
            bubble_idx = jnp.minimum(b_idx * per_bucket + w_idx,
                                     pdf.shape[0] - 1)
            inputs["pointcloud"] = data.pointcloud[bubble_idx]

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(mesh, P("data"))
            inputs = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, shard), inputs)

        out = renderer.render_rays(params, model_cfg, inputs, k_render,
                                   training=True, fused_sampler=fused,
                                   fused_train_grad=fused_grad)
        terms = compute_losses(
            out, gt, weights, angular_reference_bug=angular_reference_bug)
        metrics = dict(terms)
        metrics["psnr"] = psnr_fn(out["rgb_values"],
                                  gt["rgb"].reshape(-1, 3))
        aux = {
            "metrics": metrics,
            "indices": indices,
            "bubble_idx": bubble_idx,
            "depth_values": out["depth_values"],
            "rgb_values": out["rgb_values"],
            "gt": gt,
        }
        return terms["loss"], aux

    grad_fn = jax.value_and_grad(loss_and_metrics, has_aux=True)

    def _update_pdf(pdf, data: DeviceArrays, values, flat_indices):
        """Scatter per-pixel errors into the point-cloud pdf
        (parity trainer/recon.py:142-153): clamp to pdf_max, prune below
        pdf_prune, route through pointlinks (mode='drop' handles -1)."""
        if pdf_max is not None:
            values = jnp.clip(values, max=pdf_max)
        values = jnp.where(values < pdf_prune, 0.0, values)
        links = data.pointlinks[flat_indices]
        return pdf.at[links].set(values, mode="drop")

    def step(state, data: DeviceArrays, key, weights,
             pdf=None, sample_count=None):
        if bubble:
            weights = dict(weights, _pdf=pdf)
        (_, aux), grads = grad_fn(state.params, data, key, weights)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state._replace(
            step=state.step + 1, params=params, opt_state=opt_state)
        metrics = aux["metrics"]
        if bubble:
            crit = (jnp.abs(aux["depth_values"] - aux["gt"]["depth"])
                    if pdf_criterion == "DEPTH" else
                    jnp.mean(jnp.abs(jnp.clip(aux["rgb_values"], 0, 1)
                                     - jnp.clip(aux["gt"]["rgb"], 0, 1)),
                             axis=-1))
            pdf = _update_pdf(pdf, data, jax.lax.stop_gradient(crit),
                              aux["indices"])
            sample_count = sample_count.at[aux["bubble_idx"]].add(1)
            return new_state, metrics, pdf, sample_count
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if bubble and donate:
        donate_argnums = (0, 4, 5)
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_render_fn(model_cfg, chunk_size: int, mesh=None,
                        fused_sampler: bool | None = None):
    """Full-image renderer: jitted per-chunk eval forward.

    Replaces split_input/merge_output chunking
    (`/root/reference/utils/__init__.py:35-91`); pixels shard over chips.
    Returns fn(params, inputs_chunk) -> outputs dict. With
    `ray_sampler.per_ray_exit` configured, chunks render through the
    beta-matched per-ray compacted sampler (eval always runs at the
    final learned beta — exactly the regime where the global exit does
    nothing; chunk fns cached per capacity phase).
    """
    fused = _auto_fused(fused_sampler)

    @partial(jax.jit, static_argnames=("predict_only", "fracs"))
    def render_chunk(params, inputs, predict_only=False, fracs=None):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(mesh, P(None, "data"))
            inputs = dict(inputs, uv=jax.lax.with_sharding_constraint(
                inputs["uv"], shard))
        return renderer.render_rays(
            params, cfg_with_fracs(model_cfg, fracs), inputs,
            jax.random.PRNGKey(0),
            training=False, predict_only=predict_only, fused_sampler=fused)

    def render_image(params, uv, intrinsics, pose, predict_only=False):
        """uv: (HW, 2); returns dict of (HW, ...) arrays."""
        fracs = None
        if model_cfg.sampler.per_ray_exit:
            if model_cfg.sampler.per_ray_fracs is not None:
                # user-pinned capacities (ray_sampler.per_ray_fracs)
                fracs = tuple(model_cfg.sampler.per_ray_fracs)
            else:
                from ..models.density import effective_beta

                beta = float(effective_beta(params["beta"],
                                            model_cfg.beta_min))
                fracs = per_ray_fracs_for_beta(beta)
        n = uv.shape[0]
        n_pad = (-n) % chunk_size
        uv_p = jnp.pad(uv, ((0, n_pad), (0, 0)))
        chunks = uv_p.reshape(-1, chunk_size, 2)
        outs = []
        for i in range(chunks.shape[0]):
            inputs = {
                "uv": chunks[i][None],  # (1, C, 2)
                "intrinsics": intrinsics[None],
                "pose": pose[None],
            }
            out = render_chunk(params, inputs, predict_only=predict_only,
                               fracs=fracs)
            outs.append(out)
        merged = {
            k: jnp.concatenate([o[k] for o in outs], axis=0)[:n]
            for k in outs[0]
        }
        return merged

    return render_image, render_chunk
