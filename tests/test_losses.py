import jax.numpy as jnp
import numpy as np
import pytest

from i2sdf_tpu.models.losses import (LossConfig, bce, compute_losses,
                                     depth_mse, eikonal, normal_angular,
                                     normal_l1, rgb_l1)


def test_rgb_l1():
    pred = jnp.array([[0.5, 0.5, 0.5]])
    gt = jnp.array([[1.0, 0.0, 0.5]])
    np.testing.assert_allclose(float(rgb_l1(pred, gt)), (0.5 + 0.5 + 0) / 3,
                               rtol=1e-6)


def test_eikonal_zero_for_unit_gradients():
    g = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
    assert float(eikonal(g)) == 0.0
    g2 = jnp.array([[2.0, 0, 0]])
    np.testing.assert_allclose(float(eikonal(g2)), 1.0, rtol=1e-6)


def test_depth_mse_masked():
    d = jnp.array([1.0, 2.0, 100.0])
    gt = jnp.array([1.0, 3.0, 0.0])
    mask = jnp.array([True, True, False])
    np.testing.assert_allclose(float(depth_mse(d, gt, mask)), 0.5, rtol=1e-6)


def test_normal_l1_and_angular():
    n = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    gt = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    mask = jnp.array([True, True])
    np.testing.assert_allclose(float(normal_l1(n, gt, mask)), 0.5, rtol=1e-5)
    ang = float(normal_angular(n, gt, mask))
    # the clamp to dot <= 1-1e-6 shifts acos by ~1.4e-3 rad
    np.testing.assert_allclose(ang, (0 + 0.25) / 2, atol=3e-4)


def test_bce_clipping():
    p = jnp.array([[0.0], [1.0]])
    t = jnp.array([[0.0], [1.0]])
    v = float(bce(p, t))
    assert 0 < v < 0.01


def test_loss_config_smooth_iter_forced_past_bubble():
    cfg = LossConfig(bubble_weight=0.5, min_bubble_iter=50, max_bubble_iter=150,
                     smooth_iter=100)
    assert cfg.smooth_iter == 150


def test_dynamic_weights_bubble_window():
    cfg = LossConfig(bubble_weight=0.5, min_bubble_iter=50,
                     max_bubble_iter=150, smooth_iter=100,
                     normal_weight=0.05, smooth_weight=0.01)
    approx = pytest.approx
    w0 = cfg.dynamic_weights(10)
    assert float(w0["bubble"]) == 0.0 and float(w0["normal"]) == approx(0.05)
    w1 = cfg.dynamic_weights(100)
    assert float(w1["bubble"]) == approx(0.5) and float(w1["normal"]) == 0.0
    assert float(w1["smooth"]) == 0.0  # smooth pushed to 150
    w2 = cfg.dynamic_weights(200)
    assert float(w2["bubble"]) == 0.0 and float(w2["normal"]) == approx(0.05)
    assert float(w2["smooth"]) == approx(0.01)


def test_compute_losses_weighted_sum():
    outputs = {
        "rgb_values": jnp.zeros((4, 3)),
        "grad_theta": jnp.array([[2.0, 0, 0]] * 4),
        "depth_values": jnp.ones((4,)),
        "weight_sum": jnp.full((4, 1), 0.5),
    }
    gt = {
        "rgb": jnp.ones((4, 3)),
        "depth": jnp.zeros((4,)),
        "depth_mask": jnp.ones((4,), bool),
    }
    w = LossConfig(eikonal_weight=0.1, depth_weight=0.2).dynamic_weights(0)
    terms = compute_losses(outputs, gt, w)
    np.testing.assert_allclose(float(terms["rgb_loss"]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(terms["eikonal_loss"]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(terms["depth_loss"]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(terms["loss"]), 1.0 + 0.1 + 0.2, rtol=1e-6)


def test_angular_reference_bug_flag():
    """Strict-parity: with the flag on, the angular term dispatches the
    L1 normal loss exactly like the reference
    (network/__init__.py:368-369); default off = real arccos loss."""
    import jax
    from i2sdf_tpu.models.losses import (LossConfig, compute_losses,
                                         normal_l1, normal_angular)

    key = jax.random.PRNGKey(0)
    n = jax.random.normal(key, (16, 3))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    gt = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    gt = gt / jnp.linalg.norm(gt, axis=-1, keepdims=True)
    mask = jnp.ones((16,), bool)

    outputs = {"rgb_values": jnp.zeros((16, 3)), "normal_values": n}
    ground_truth = {"rgb": jnp.zeros((16, 3)), "normal": gt,
                    "normal_mask": mask}
    w = LossConfig(angular_weight=1.0).dynamic_weights(0)

    t_fixed = compute_losses(outputs, ground_truth, w)
    t_ref = compute_losses(outputs, ground_truth, w,
                           angular_reference_bug=True)
    np.testing.assert_allclose(float(t_fixed["angular_loss"]),
                               float(normal_angular(n, gt, mask)))
    np.testing.assert_allclose(float(t_ref["angular_loss"]),
                               float(normal_l1(n, gt, mask)))
    assert abs(float(t_ref["angular_loss"])
               - float(t_fixed["angular_loss"])) > 1e-4

    # config plumbing
    from i2sdf_tpu.config import CfgNode
    lc = LossConfig.from_cfgnode(CfgNode({"angular_reference_bug": True}))
    assert lc.angular_reference_bug


def test_reference_lr_schedule_semantics():
    """Strict-parity: per-EPOCH ExponentialLR with the reference's
    decay_steps = nepochs * n_images (trainer/recon.py:92,201-207) —
    LR is constant within an epoch and ends at lr0 * dr^(1/n_images)."""
    import math
    from i2sdf_tpu.train.state import make_reference_lr_schedule

    lr0, dr = 5e-4, 0.1
    n_images, total_pixels, batch = 32, 480 * 640, 1600
    sched = make_reference_lr_schedule(lr0, dr, n_images, total_pixels,
                                       batch)
    epoch_steps = math.ceil(n_images * total_pixels / batch)
    nepochs = math.ceil(200_000 / (n_images * total_pixels / batch))
    decay_steps = nepochs * n_images

    assert float(sched(0)) == lr0
    # constant within the first epoch
    np.testing.assert_allclose(float(sched(epoch_steps - 1)), lr0)
    # one scheduler step after the first epoch
    np.testing.assert_allclose(float(sched(epoch_steps)),
                               lr0 * dr ** (1.0 / decay_steps), rtol=1e-6)
    # the documented reference outcome: after the full run the LR has
    # barely moved (dr^(1/n_images) ~ 0.93 for 32 views)
    final = float(sched(nepochs * epoch_steps))
    np.testing.assert_allclose(final, lr0 * dr ** (1.0 / n_images),
                               rtol=1e-5)
    assert final > 0.9 * lr0
