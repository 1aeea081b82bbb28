"""Reference-checkpoint import (utils/interop.py): converted parameters
must reproduce the reference networks' forward outputs exactly.

The "reference" here is a numpy replica of the torch semantics
(`/root/reference/model/network/mlp.py:10-141`: interleaved PE,
weight-norm linears (out, in), Softplus(100), skip//sqrt2, ReLU/sigmoid
radiance) evaluated against a synthetic reference-style state dict —
no torch import needed for the math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from i2sdf_tpu.models import mlp
from i2sdf_tpu.models.mlp import ImplicitNetConfig, RenderingNetConfig
from i2sdf_tpu.models.renderer import I2SDFConfig
from i2sdf_tpu.models.sampler import SamplerConfig
from i2sdf_tpu.utils.interop import convert_state_dict

MULTIRES, MULTIRES_VIEW = 4, 3
FEAT = 16


def _np_softplus100(x):
    return np.where(100 * x > 20, x, np.log1p(np.exp(100 * x)) / 100)


def _np_pe_interleaved(x, multires):
    """Reference embedder layout: [x, sin(f0 x), cos(f0 x), ...]."""
    freqs = 2.0 ** np.linspace(0, multires - 1, multires)
    parts = [x]
    for f in freqs:
        parts.append(np.sin(x * f))
        parts.append(np.cos(x * f))
    return np.concatenate(parts, -1)


def _np_wn_linear(sd, prefix, x):
    v = sd[f"{prefix}.weight_v"]
    g = sd[f"{prefix}.weight_g"].reshape(-1, 1)
    b = sd[f"{prefix}.bias"]
    w = v * (g / np.linalg.norm(v, axis=1, keepdims=True))
    return x @ w.T + b


def _rand_wn(rng, d_out, d_in):
    return {"weight_v": rng.normal(size=(d_out, d_in)).astype(np.float32),
            "weight_g": rng.uniform(0.5, 2, (d_out, 1)).astype(np.float32),
            "bias": rng.normal(size=(d_out,)).astype(np.float32) * 0.1}


@pytest.fixture(scope="module")
def state_dict_and_cfg():
    rng = np.random.default_rng(0)
    emb = 3 + 6 * MULTIRES
    vemb = 3 + 6 * MULTIRES_VIEW
    # implicit dims [emb, 64, 64, 64, 1+FEAT], skip at layer 2: the
    # reference narrows the PRE-skip layer's output by dims[0] so the
    # concat lands back at 64 (mlp.py:53-55)
    sd = {}
    hidden = 64
    layer_in = [emb, hidden, hidden, hidden]
    layer_out = [hidden, hidden - emb, hidden, 1 + FEAT]
    for i, (di, do) in enumerate(zip(layer_in, layer_out)):
        for k, v in _rand_wn(rng, do, di).items():
            sd[f"model.implicit_network.lin{i}.{k}"] = v
    # rendering (nerf): in = vemb + FEAT
    rin = [vemb + FEAT, 24]
    rout = [24, 3]
    for i, (di, do) in enumerate(zip(rin, rout)):
        for k, v in _rand_wn(rng, do, di).items():
            sd[f"model.rendering_network.lin{i}.{k}"] = v
    # light: in = FEAT
    lin_ = [FEAT, 8]
    lout = [8, 1]
    for i, (di, do) in enumerate(zip(lin_, lout)):
        for k, v in _rand_wn(rng, do, di).items():
            sd[f"model.light_network.lin{i}.{k}"] = v
    sd["model.density.beta"] = np.float32(0.037)

    icfg = ImplicitNetConfig(
        feature_vector_size=FEAT, sdf_bounding_sphere=0.0,
        dims=(hidden, hidden, hidden), skip_in=(2,),
        geometric_init=False, embed_type="positional", multires=MULTIRES)
    rcfg = RenderingNetConfig(
        feature_vector_size=FEAT, mode="nerf", dims=(24,),
        embed_type="positional", multires=MULTIRES_VIEW)
    lcfg = ImplicitNetConfig(
        feature_vector_size=0, sdf_bounding_sphere=0.0, d_in=FEAT,
        d_out=1, dims=(8,), geometric_init=False, skip_in=(),
        embed_type=None, output_activation="sigmoid")
    cfg = I2SDFConfig(
        feature_vector_size=FEAT, implicit=icfg, rendering=rcfg,
        light=lcfg, sampler=SamplerConfig(), beta_init=0.1)
    return sd, cfg


def _np_implicit_forward(sd, x):
    emb = _np_pe_interleaved(x, MULTIRES)
    h = emb
    for i in range(4):
        if i == 2:
            h = np.concatenate([h, emb], -1) / np.sqrt(2)
        h = _np_wn_linear(sd, f"model.implicit_network.lin{i}", h)
        if i < 3:
            h = _np_softplus100(h)
    return h


def test_implicit_import_matches_reference_forward(state_dict_and_cfg):
    sd, cfg = state_dict_and_cfg
    params = convert_state_dict(sd, cfg)
    x = np.random.default_rng(1).normal(size=(40, 3)).astype(np.float32)
    ref = _np_implicit_forward(sd, x)
    ours = np.asarray(mlp.implicit_net_apply(
        params["implicit"], cfg.implicit, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)
    assert float(params["beta"]) == pytest.approx(0.037)


def test_rendering_import_matches_reference_forward(state_dict_and_cfg):
    sd, cfg = state_dict_and_cfg
    params = convert_state_dict(sd, cfg)
    rng = np.random.default_rng(2)
    dirs = rng.normal(size=(40, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    feat = rng.normal(size=(40, FEAT)).astype(np.float32)

    vemb = _np_pe_interleaved(dirs, MULTIRES_VIEW)
    h = np.concatenate([vemb, feat], -1)
    h = _np_wn_linear(sd, "model.rendering_network.lin0", h)
    h = np.maximum(h, 0)
    h = _np_wn_linear(sd, "model.rendering_network.lin1", h)
    ref = 1.0 / (1.0 + np.exp(-h))

    ours = np.asarray(mlp.rendering_net_apply(
        params["rendering"], cfg.rendering, None, None,
        jnp.asarray(dirs), jnp.asarray(feat)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_light_import_matches_reference_forward(state_dict_and_cfg):
    sd, cfg = state_dict_and_cfg
    params = convert_state_dict(sd, cfg)
    rng = np.random.default_rng(3)
    feat = np.maximum(rng.normal(size=(25, FEAT)), 0).astype(np.float32)
    h = _np_wn_linear(sd, "model.light_network.lin0", feat)
    h = _np_softplus100(h)
    h = _np_wn_linear(sd, "model.light_network.lin1", h)
    ref = 1.0 / (1.0 + np.exp(-h))
    ours = np.asarray(mlp.implicit_net_apply(
        params["light"], cfg.light, jnp.asarray(feat)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_import_tolerates_bare_and_parametrized_keys(state_dict_and_cfg):
    sd, cfg = state_dict_and_cfg
    # bare (no "model." prefix) + new-style parametrizations layout
    bare = {}
    for k, v in sd.items():
        k2 = k[len("model."):]
        if k2.endswith(".weight_v"):
            k2 = k2.replace(".weight_v",
                            ".parametrizations.weight.original1")
        elif k2.endswith(".weight_g"):
            k2 = k2.replace(".weight_g",
                            ".parametrizations.weight.original0")
        bare[k2] = v
    p_a = convert_state_dict(sd, cfg)
    p_b = convert_state_dict(bare, cfg)
    for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_import_script_end_to_end(tmp_path):
    """scripts/import_reference_checkpoint.py: torch Lightning ckpt ->
    orbax -> restore -> full renderer forward (finite rgb)."""
    torch = pytest.importorskip("torch")
    import subprocess
    import sys as _sys
    import yaml

    rng = np.random.default_rng(0)
    H = 64
    emb, vemb = 3 + 6 * MULTIRES, 3 + 6 * MULTIRES_VIEW

    sd = {}

    def wn(do, di):
        return {
            "weight_v": torch.tensor(
                rng.normal(size=(do, di)).astype("float32")),
            "weight_g": torch.tensor(
                rng.uniform(0.5, 2, (do, 1)).astype("float32")),
            "bias": torch.tensor(
                (rng.normal(size=(do,)) * 0.1).astype("float32"))}

    li, lo = [emb, H, H, H], [H, H - emb, H, 1 + FEAT]
    for i, (di, do) in enumerate(zip(li, lo)):
        for k, v in wn(do, di).items():
            sd[f"model.implicit_network.lin{i}.{k}"] = v
    for i, (di, do) in enumerate(zip([vemb + FEAT, 32], [32, 3])):
        for k, v in wn(do, di).items():
            sd[f"model.rendering_network.lin{i}.{k}"] = v
    sd["model.density.beta"] = torch.tensor(0.05)
    ckpt = str(tmp_path / "ref_last.ckpt")
    torch.save({"state_dict": sd, "global_step": 12345}, ckpt)

    conf = {
        "train": {"expname": "imp", "learning_rate": 5e-4, "steps": 1000,
                  "batch_size": 128, "split_n_pixels": 512},
        "plot": {"plot_nimgs": 1, "grid_boundary": [-2.2, 2.2]},
        "loss": {"eikonal_weight": 0.1},
        "dataset": {"data_dir": "demo", "img_res": [24, 32],
                    "downsample": 1},
        "model": {
            "feature_vector_size": FEAT, "scene_bounding_sphere": 4.0,
            "implicit_network": {
                "d_in": 3, "d_out": 1, "dims": [H, H, H],
                "geometric_init": False, "skip_in": [2],
                "weight_norm": True, "embed_type": "positional",
                "multires": MULTIRES},
            "rendering_network": {
                "mode": "nerf", "d_in": 3, "d_out": 3, "dims": [32],
                "weight_norm": True, "embed_type": "positional",
                "multires": MULTIRES_VIEW},
            "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
            "ray_sampler": {
                "near": 0.0, "N_samples": 12, "N_samples_eval": 24,
                "N_samples_extra": 6, "eps": 0.1, "beta_iters": 4,
                "max_total_iters": 2},
        },
    }
    conf_path = str(tmp_path / "imp.yml")
    yaml.safe_dump(conf, open(conf_path, "w"))
    exp_dir = str(tmp_path / "exps" / "imported" / "version_0")

    import os as _os
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable,
         _os.path.join(repo, "scripts", "import_reference_checkpoint.py"),
         "--ckpt", ckpt, "--conf", conf_path, "--exp_dir", exp_dir],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    assert "step 12345" in r.stdout

    from i2sdf_tpu.config import load_cfg
    from i2sdf_tpu.models import renderer
    from i2sdf_tpu.train import create_train_state
    from i2sdf_tpu.train.checkpoint import CheckpointManager

    conf2 = load_cfg(conf_path)
    conf2.model.use_normal = True
    cfg = renderer.I2SDFConfig.from_cfgnode(conf2.model)
    st, _ = create_train_state(renderer.init(jax.random.PRNGKey(0), cfg))
    mgr = CheckpointManager(_os.path.join(exp_dir, "checkpoints", "orbax"))
    st, _ = mgr.restore(st)
    mgr.close()
    assert int(st.step) == 12345
    assert float(st.params["beta"]) == pytest.approx(0.05)

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 30
    K[0, 2], K[1, 2] = 16, 12
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, -2]
    inputs = {
        "uv": jnp.asarray(np.random.default_rng(1).uniform(
            0, 20, (16, 1, 2)), jnp.float32),
        "intrinsics": jnp.asarray(np.broadcast_to(K, (16, 4, 4))),
        "pose": jnp.asarray(np.broadcast_to(pose, (16, 4, 4)))}
    out = renderer.render_rays(st.params, cfg, inputs,
                               jax.random.PRNGKey(1), training=False)
    assert bool(jnp.isfinite(out["rgb_values"]).all())
