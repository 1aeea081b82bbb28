"""TRUE cross-framework parity: a clean-room torch build of the
reference's eval render path (scripts/ref_torch_model.py) is
checkpointed in the Lightning layout, imported through
`utils.interop.convert_state_dict`, and both frameworks render the
SAME rays — rgb/depth/normal (and the sampler's z-values) must agree.

This is the round-3 upgrade of tests/test_interop.py (numpy replica)
to an actual torch-vs-jax comparison — the strongest kitchen_0-class
parity evidence available in an environment the released dataset
cannot enter. Matches /root/reference/model/network/mlp.py:10-229 +
ray_sampler.py:46-251 + network/__init__.py:80-240 semantics on both
sides.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import os  # noqa: E402
import sys  # noqa: E402

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from ref_torch_model import (RefErrorBoundSampler, RefImplicitNetwork,  # noqa: E402
                             RefLaplaceDensity, RefModel,
                             RefRenderingNetwork)

from i2sdf_tpu.models import renderer  # noqa: E402
from i2sdf_tpu.models.mlp import (ImplicitNetConfig,  # noqa: E402
                                  RenderingNetConfig)
from i2sdf_tpu.models.renderer import I2SDFConfig  # noqa: E402
from i2sdf_tpu.models.sampler import SamplerConfig, error_bound_z_vals  # noqa: E402
from i2sdf_tpu.utils.interop import convert_state_dict  # noqa: E402

FEAT, WIDTH, MULTIRES, MULTIRES_VIEW = 16, 64, 4, 3
SPHERE = 3.0
BETA, BETA_MIN = 0.05, 1e-4


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(7)
    imp = RefImplicitNetwork(feature_size=FEAT, width=WIDTH, n_hidden=3,
                             skip=(2,), multires=MULTIRES,
                             sdf_bounding_sphere=SPHERE)
    ren = RefRenderingNetwork(feature_size=FEAT, width=32, n_hidden=1,
                              multires=MULTIRES_VIEW)
    dens = RefLaplaceDensity(beta=BETA, beta_min=BETA_MIN)
    sampler = RefErrorBoundSampler(
        scene_bounding_sphere=SPHERE, N_samples=16, N_samples_eval=32,
        N_samples_extra=8, eps=0.1, beta_iters=10, max_total_iters=5,
        add_tiny=1e-6)
    ref = RefModel(imp, ren, dens, sampler).eval()

    icfg = ImplicitNetConfig(
        feature_vector_size=FEAT, sdf_bounding_sphere=SPHERE,
        dims=(WIDTH,) * 3, skip_in=(2,), geometric_init=False,
        embed_type="positional", multires=MULTIRES)
    rcfg = RenderingNetConfig(
        feature_vector_size=FEAT, mode="nerf", dims=(32,),
        embed_type="positional", multires=MULTIRES_VIEW)
    scfg = SamplerConfig(
        scene_bounding_sphere=SPHERE, N_samples=16, N_samples_eval=32,
        N_samples_extra=8, eps=0.1, beta_iters=10, max_total_iters=5,
        add_tiny=1e-6, early_exit=True)
    cfg = I2SDFConfig(feature_vector_size=FEAT, implicit=icfg,
                      rendering=rcfg, sampler=scfg, beta_init=BETA,
                      beta_min=BETA_MIN, scene_bounding_sphere=SPHERE,
                      use_normal=True)
    params = convert_state_dict(ref.lightning_state_dict(), cfg)
    return ref, cfg, params


def _ray_batch(n=20):
    rng = np.random.default_rng(3)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 40.0, 42.0
    K[0, 2], K[1, 2] = 16.0, 12.0
    K[0, 1] = 0.3  # exercise the skew term of lift()
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.2, -0.1, -1.8]
    uv = rng.uniform(2.0, 28.0, (1, n, 2)).astype(np.float32)
    return uv, pose[None], np.broadcast_to(K, (1, 4, 4)).copy()


def test_checkpoint_roundtrip_beta(models):
    _, _, params = models
    assert float(params["beta"]) == pytest.approx(BETA)


def test_sampler_z_vals_match(models):
    """Both samplers (dynamic torch loop vs fixed-shape lax) must emit
    the same final z-set when no early convergence fires."""
    ref, cfg, params = models
    uv, pose, K = _ray_batch()
    rd_t, cl_t = __import__("ref_torch_model").ref_camera_rays(
        torch.tensor(uv), torch.tensor(pose), torch.tensor(K))
    R = rd_t.shape[1]
    cl_t = cl_t.unsqueeze(1).repeat(1, R, 1).reshape(-1, 3)
    rd_t = torch.nn.functional.normalize(rd_t.reshape(-1, 3), dim=1)
    z_ref = ref.sampler.get_z_vals(rd_t, cl_t, ref.implicit_network,
                                   ref.density).numpy()
    # ALL rounds must have run — the fixed-shape sampler duplicates
    # z-values after global convergence, which is weights-pdf-invisible
    # but not bit-identical; parity of the non-converged path is the
    # claim under test
    assert ref.sampler.rounds_run == cfg.sampler.max_total_iters

    def sdf_fn(pts):
        from i2sdf_tpu.models import mlp
        return mlp.sdf_vals(params["implicit"], cfg.implicit, pts)[:, 0]

    beta_eff = abs(float(params["beta"])) + BETA_MIN
    z_jax, _, _ = error_bound_z_vals(
        cfg.sampler, sdf_fn, jax.random.PRNGKey(0),
        jnp.asarray(rd_t.numpy()), jnp.asarray(cl_t.numpy()),
        beta_eff, training=False)
    z_jax = np.asarray(z_jax)
    assert z_jax.shape == z_ref.shape
    np.testing.assert_allclose(z_jax, z_ref, atol=5e-4, rtol=1e-4)


def test_render_rgb_depth_normal_match(models):
    ref, cfg, params = models
    uv, pose, K = _ray_batch()
    with torch.no_grad():
        pass  # get_outputs manages its own grad enablement
    out_t = ref.render(torch.tensor(uv), torch.tensor(pose),
                       torch.tensor(K))
    assert out_t["sampler_rounds"] == cfg.sampler.max_total_iters

    inputs = {"uv": jnp.asarray(uv), "pose": jnp.asarray(pose),
              "intrinsics": jnp.asarray(K)}
    out_j = renderer.render_rays(params, cfg, inputs,
                                 jax.random.PRNGKey(0), training=False)

    for t_key, j_key, atol in (("rgb_values", "rgb_values", 2e-4),
                               ("depth_values", "depth_values", 1e-3),
                               ("normal_map", "normal_map", 2e-3)):
        a = np.asarray(out_j[j_key]).reshape(-1)
        b = out_t[t_key].numpy().reshape(-1)
        assert a.shape == b.shape, (j_key, a.shape, b.shape)
        err = np.abs(a - b)
        assert np.percentile(err, 99) < atol, (
            f"{j_key}: p99 {np.percentile(err, 99):.2e} max {err.max():.2e}")
        assert err.max() < 20 * atol, (
            f"{j_key}: max {err.max():.2e}")
