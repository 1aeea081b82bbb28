"""End-to-end CLI pipeline: train -> render eval -> mesh -> interpolate.

This is the integration surface a reference user touches
(`main_recon.py` parity): one tiny config, real scan directory on disk,
checkpoints restored by every test mode.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CONF = {
    "train": {
        "expname": "tiny",
        "learning_rate": 5.0e-4,
        "steps": 60,
        "checkpoint_freq": 60,
        "plot_freq": 30,
        "split_n_pixels": 512,
        "batch_size": 128,
        "pdf_criterion": "DEPTH",
    },
    "plot": {"plot_nimgs": 1, "grid_boundary": [-2.2, 2.2]},
    "loss": {
        "eikonal_weight": 0.1,
        "smooth_weight": 0.01,
        "smooth_iter": 50,
        "depth_weight": 0.1,
        "normal_weight": 0.05,
        "bubble_weight": 0.5,
        "min_bubble_iter": 20,
        "max_bubble_iter": 40,
    },
    "dataset": {
        "data_dir": "demo",
        "img_res": [24, 32],
        "downsample": 1,
        "pdf_prune": 0.001,
        "pdf_max": 0.2,
    },
    "model": {
        "feature_vector_size": 32,
        "scene_bounding_sphere": 4.0,
        "implicit_network": {
            "d_in": 3, "d_out": 1, "dims": [32, 32, 32, 32],
            "geometric_init": True, "bias": 0.6, "skip_in": [2],
            "weight_norm": True, "embed_type": "positional", "multires": 4,
        },
        "rendering_network": {
            "mode": "nerf", "d_in": 3, "d_out": 3, "dims": [32, 32],
            "weight_norm": True, "embed_type": "positional", "multires": 2,
        },
        "light_network": {"dims": [16]},
        "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
        "ray_sampler": {
            "near": 0.0, "N_samples": 12, "N_samples_eval": 24,
            "N_samples_extra": 6, "eps": 0.1, "beta_iters": 4,
            "max_total_iters": 2,
        },
    },
    "material": {
        # plot_freq 4 fires _write_plots once at the final step — the
        # validation-map path must also work under the 8-device mesh
        "steps": 4, "batch_size": 128, "spp": 2, "vis_steps": 4,
        "n_emitters": 1, "plot_freq": 4, "checkpoint_freq": 0,
        "min_weight_sum": 0.05,
        "material_network": {"dims": [32, 32], "multires": 2},
    },
}


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from i2sdf_tpu.data import generate_synthetic_scene

    root = tmp_path_factory.mktemp("cli")
    data_root = root / "data"
    generate_synthetic_scene(str(data_root / "demo"), n_images=4,
                             img_res=(24, 32))
    conf_path = root / "tiny.yml"
    conf_path.write_text(yaml.safe_dump(TINY_CONF))
    return root


def run_cli(workdir, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "i2sdf_tpu.main", "--conf",
         str(workdir / "tiny.yml"), "--exps_folder",
         str(workdir / "exps"), "--data_root", str(workdir / "data"),
         "--no_fused", *args],
        capture_output=True, text=True, cwd=REPO, timeout=900)
    if proc.returncode != 0:
        raise AssertionError(
            f"CLI failed:\nSTDOUT:\n{proc.stdout[-4000:]}\n"
            f"STDERR:\n{proc.stderr[-4000:]}")
    return proc


@pytest.fixture(scope="module")
def trained(workdir):
    run_cli(workdir, "--version", "0")
    return workdir / "exps" / "tiny_0" / "version_0"


def test_training_artifacts(trained):
    assert (trained / "config.yml").exists()
    assert (trained / "checkpoints" / "orbax").exists()
    assert (trained / "pointcloud.html").exists()
    renders = list((trained / "plots" / "rendering").glob("*.png"))
    assert renders, "no validation renders written"
    assert list((trained / "plots" / "depth").glob("*.png"))
    assert list((trained / "plots" / "light_mask").glob("*.png"))
    # bubble window [20, 40) ran: hotmaps written
    assert list((trained / "hotmap").glob("*.png"))


def test_render_mode(workdir, trained):
    run_cli(workdir, "--version", "0", "--test", "--test_mode", "render",
            "--indices", "0", "1")
    eval_dir = trained / "eval"
    assert (eval_dir / "metrics.txt").exists()
    m = np.load(eval_dir / "metrics.npz")
    assert m["psnr"].shape == (2,)
    assert np.isfinite(m["psnr"]).all()
    assert (eval_dir / "rendering" / "0000.png").exists()
    assert (eval_dir / "normal" / "0001.png").exists()
    assert (eval_dir / "depth" / "0000.npy").exists()


def test_mesh_mode(workdir, trained):
    run_cli(workdir, "--version", "0", "--test", "--test_mode", "mesh",
            "--resolution", "64")
    ply = trained / "eval" / "mesh" / "scan0.ply"
    assert ply.exists()
    from i2sdf_tpu.eval.mesh_io import read_ply

    verts, tris = read_ply(str(ply))
    assert len(verts) > 50 and len(tris) > 50
    # at 60 steps the SDF is sphere-ish near the geometric init; surface
    # must live inside the scene bounds (scale_mat is identity)
    assert np.abs(verts).max() < 6.0


def test_interpolate_mode(workdir, trained):
    run_cli(workdir, "--version", "0", "--test", "--test_mode",
            "interpolate", "--inter_id", "0", "1", "--n_frames", "3")
    frames = trained / "eval" / "interpolate" / "0000_0001"
    pngs = list(frames.glob("*.png"))
    assert len(pngs) == 3


def test_resume_continues_from_checkpoint(workdir, trained):
    """--resume restores the step counter and trains onward."""
    proc = run_cli(workdir, "--version", "0", "--resume",
                   "--max_steps", "70")
    assert "Resumed from step 60" in proc.stdout
    assert "Training complete" in proc.stdout


def test_mid_bubble_resume_restores_pdf(workdir):
    """Stopping inside the bubble window and resuming must restore the
    live pdf instead of re-initializing it (reference gap, SURVEY §5)."""
    run_cli(workdir, "--version", "3", "--max_steps", "25")
    proc = run_cli(workdir, "--version", "3", "--resume",
                   "--max_steps", "45")
    assert "Resumed from step 25" in proc.stdout
    assert "Bubble pdf restored from checkpoint" in proc.stdout
    assert "Initializing pointcloud PDF" not in proc.stdout


def test_relight_mode(workdir, trained):
    run_cli(workdir, "--version", "0", "--test", "--test_mode", "relight",
            "--indices", "0", "--spp", "2", "--n_emitters", "1")
    out = trained / "eval" / "relight"
    assert (out / "0000_relit.png").exists()
    assert (out / "0000_diffuse.png").exists()
    assert (out / "0000_specular.png").exists()


def test_material_stage_then_use_material(workdir, trained):
    """The full editing chain through the real CLI: --material trains
    the intrinsic-decomposition stage on the recon checkpoint, then
    relight --use_material shades with the learned field + emission."""
    run_cli(workdir, "--version", "0", "--material")
    mat = trained / "material"
    assert (mat / "emitters.npz").exists()
    assert (mat / "checkpoints" / "orbax").exists()
    run_cli(workdir, "--version", "0", "--test", "--test_mode", "relight",
            "--use_material", "--indices", "0", "--spp", "2")
    assert (trained / "eval" / "relight" / "0000_relit.png").exists()


def test_relight_video_mode(workdir, trained):
    run_cli(workdir, "--version", "0", "--test", "--test_mode",
            "relight_video", "--inter_id", "0", "2", "--n_frames", "3",
            "--spp", "2", "--n_emitters", "1")
    out = trained / "eval" / "relight_video" / "0000_0002"
    for i in range(3):
        assert (out / f"{i:04d}.png").exists()
