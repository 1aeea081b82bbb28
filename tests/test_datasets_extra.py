"""Material / Relight / PlotData datasets."""

import numpy as np
import pytest

from i2sdf_tpu.data import generate_synthetic_scene
from i2sdf_tpu.data.material import MaterialData
from i2sdf_tpu.data.plot import PlotData
from i2sdf_tpu.data.relight import RelightData, RelightVideoData


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    generate_synthetic_scene(str(root / "demo"), n_images=4,
                             img_res=(24, 32))
    return str(root)


def test_material_downsample(scene):
    full = MaterialData("demo", data_root=scene, use_mask=True)
    half = MaterialData("demo", data_root=scene, use_mask=True,
                        downsample_train=2)
    assert full.img_res == [24, 32]
    assert half.img_res == [12, 16]
    assert half.total_pixels == 12 * 16
    np.testing.assert_allclose(half.intrinsics_all[0][:2, :2],
                               full.intrinsics_all[0][:2, :2] / 2)
    assert half.mask_images.shape == (4, 192, 1)


def test_generator_hdr_matches_clipped_ldr(scene):
    """The generator ships unclipped linear radiance in hdr/*.exr; the
    LDR image/*.png must be exactly clip(hdr, 0, 1) (up to 8-bit
    quantization). The material stage fits the HDR copy — LDR clipping
    near the radiance-110 fixture otherwise biases the inverse fit."""
    ldr = MaterialData("demo", data_root=scene)
    hdr = MaterialData("demo", data_root=scene, is_hdr=True)
    assert hdr.n_images == ldr.n_images
    h = hdr.rgb_images
    l = ldr.rgb_images
    assert float(h.max()) > 1.5  # unclipped radiance preserved
    np.testing.assert_allclose(np.clip(h, 0.0, 1.0), l, atol=1.0 / 255)


def test_plotdata_from_disk_and_downsample(scene):
    pd = PlotData("demo", data_root=scene, downsample=2, plot_nimgs=-1)
    assert pd.img_res == [12, 16]
    assert pd.n_images == 4
    assert len(pd.plot_index) == 4
    uv, K, pose, rgb = pd.image_inputs(0)
    assert uv.shape == (192, 2)
    assert rgb.shape == (192, 3)


def test_plotdata_indices_subset(scene):
    pd = PlotData("demo", data_root=scene, indices=[1, 3], plot_nimgs=1)
    assert pd.n_images == 2
    assert len(pd.plot_index) == 1


def test_relight_edit_overrides(scene, tmp_path):
    import cv2

    kd_override = np.full((24, 32, 3), 0.25, np.float32)
    np.save(tmp_path / "kd.npy", kd_override)
    mask = np.zeros((24, 32), np.float32)
    mask[:12] = 1.0
    cv2.imwrite(str(tmp_path / "mask.png"), (mask * 255).astype(np.uint8))

    rd = RelightData("demo", data_root=scene, plot_nimgs=1,
                     edit_conf={"kd": str(tmp_path / "kd.npy"),
                                "mask": str(tmp_path / "mask.png")})
    assert "kd" in rd.edits and "mask" in rd.edits
    base = np.ones((24 * 32, 3), np.float32)
    out = rd.edited_materials(base, base, base[:, :1], base)
    kd = out["kd"].reshape(24, 32, 3)
    np.testing.assert_allclose(kd[:12], 0.25, atol=1e-2)
    np.testing.assert_allclose(kd[12:], 1.0, atol=1e-2)


def test_relight_video_poses(scene):
    rv = RelightVideoData("demo", data_root=scene, plot_nimgs=1,
                          id0=0, id1=2, num_frames=5)
    assert rv.frame_poses.shape == (5, 4, 4)
    uv, K, pose = rv.frame_inputs(2)
    assert pose.shape == (4, 4)
    np.testing.assert_allclose(pose[:3, :3] @ pose[:3, :3].T, np.eye(3),
                               atol=1e-5)


def test_plotdata_val_dir(scene, tmp_path):
    """is_val loads held-out cameras from val/ with val_mat_%d
    (parity eval_dataset.py:44-70)."""
    import os
    import shutil

    import cv2

    scan = os.path.join(scene, "demo", "scan0")
    val_dir = os.path.join(scan, "val")
    os.makedirs(val_dir, exist_ok=True)
    cams = dict(np.load(os.path.join(scan, "cameras_normalize.npz")))
    # two held-out views: reuse training world mats as val mats
    for i in range(2):
        cams[f"val_mat_{i}"] = cams[f"world_mat_{i + 1}"]
        src = os.path.join(scan, "image", f"{i + 1:04d}.png")
        shutil.copy(src, os.path.join(val_dir, f"{i:04d}.png"))
    np.savez(os.path.join(scan, "cameras_normalize.npz"), **cams)

    pd = PlotData("demo", data_root=scene, is_val=True, plot_nimgs=-1)
    assert pd.n_images == 2
    uv, K, pose, rgb = pd.image_inputs(0)
    assert rgb.shape[0] == pd.total_pixels
    # pose is a valid rotation
    R = pose[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
