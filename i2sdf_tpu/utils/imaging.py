"""Image IO, color transforms, and simple metrics.

Host-side IO uses the native C++ EXR module (`native/src/exr.cpp`) plus
OpenCV/imageio (matching the reference's loaders,
`/root/reference/utils/rend_util.py:25-54`); the reference's released
EXR depth/normal/hdr datasets load without conversion even when the
OpenCV build lacks EXR. `.npy` files are accepted everywhere an EXR is.
Device math (PSNR, SSIM, sRGB) is JAX.
"""

from __future__ import annotations

import os

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

import cv2  # noqa: E402
import imageio.v2 as imageio  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".JPG", ".PNG", ".exr", ".npy")


def glob_imgs(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    out = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(IMG_EXTENSIONS)
    ]
    return sorted(out)


def _exr_read_rgbish(path: str) -> np.ndarray:
    """Native EXR read returning channels in BGR-like order for drop-in
    compatibility with cv2.imread callers (reference convention)."""
    from ..native import exr_read

    data, names = exr_read(path)
    if data.ndim == 3 and set(names[:3]) == {"R", "G", "B"}:
        data = data[:, :, ::-1].copy()  # canonical RGB -> cv2-style BGR
    return data


def _read_any(path: str, flags=cv2.IMREAD_UNCHANGED) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".exr"):
        # the native reader first: this cv2 build may lack EXR support
        # (the reference's released datasets are EXR —
        # /root/reference/utils/rend_util.py:25-54)
        try:
            return _exr_read_rgbish(path)
        except Exception:
            pass  # fall through to cv2 (e.g. PIZ-compressed files)
    img = cv2.imread(path, flags)
    if img is None:
        raise IOError(f"Failed to read image: {path}")
    return img


def load_rgb(path: str, is_hdr: bool = False) -> np.ndarray:
    """Load an RGB image as float32 (H, W, 3) in [0,1] (LDR) or linear (HDR)."""
    if path.endswith(".npy"):
        img = np.load(path).astype(np.float32)
    elif is_hdr:
        img = _read_any(path).astype(np.float32)
        if img.ndim == 3 and img.shape[2] >= 3:
            img = img[:, :, :3][:, :, ::-1].copy()  # BGR -> RGB
    else:
        img = imageio.imread(path)
        img = np.asarray(img, dtype=np.float32)
        if img.dtype != np.float32 or img.max() > 1.5:
            img = img / 255.0
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        img = img[:, :, :3]
    return img.astype(np.float32)


def load_mask(path: str) -> np.ndarray:
    """Load a single-channel mask as float32 (H, W) in [0,1]."""
    if path.endswith(".npy"):
        img = np.load(path).astype(np.float32)
    else:
        img = imageio.imread(path)
        img = np.asarray(img, dtype=np.float32)
        if img.max() > 1.5:
            img = img / 255.0
    if img.ndim == 3:
        img = img[:, :, 0]
    return img.astype(np.float32)


def load_depth(path: str) -> np.ndarray:
    """Load a depth map as float32 (H, W) (EXR last channel or npy)."""
    img = _read_any(path)
    img = np.asarray(img, dtype=np.float32)
    if img.ndim == 3:
        img = img[:, :, -1]
    return img


def load_normal(path: str) -> np.ndarray:
    """Load a normal map as float32 (H, W, 3), RGB order."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    img = _read_any(path)
    img = np.asarray(img, dtype=np.float32)
    return img[:, :, ::-1].copy()  # BGR -> RGB


def write_exr_or_npy(path: str, data: np.ndarray) -> str:
    """Write float data as EXR (native writer, cv2 fallback), else .npy.

    Returns the path actually written. Data is RGB-ordered (or single
    channel); stored with standard EXR channel names.
    """
    data = np.asarray(data, dtype=np.float32)
    if path.endswith(".exr"):
        try:
            from ..native import exr_write

            exr_write(path, data, half=False)
            return path
        except Exception:
            pass
        try:
            towrite = data[:, :, ::-1] if data.ndim == 3 else data
            if cv2.imwrite(path, towrite):
                return path
        except cv2.error:
            pass
        # remove a partial .exr from a failed attempt: glob-based
        # loaders count files, and a leftover next to the .npy would
        # pair images with the wrong cameras
        if os.path.exists(path):
            try:
                os.unlink(path)
            except OSError:
                pass
        path = path[:-4] + ".npy"
    np.save(path, data)
    return path


def _box_filter(x: np.ndarray, r: int) -> np.ndarray:
    """Mean filter with window (2r+1)^2, edge-renormalized (cv2 parity)."""
    h, w = x.shape[:2]
    ones = np.ones((h, w), x.dtype)

    def box1(a, axis, r):
        c = np.cumsum(a, axis=axis)
        n = a.shape[axis]
        zeros_pad = [(0, 0)] * a.ndim
        zeros_pad[axis] = (r + 1, 0)
        edge_pad = [(0, 0)] * a.ndim
        edge_pad[axis] = (0, r)
        # leading zeros (empty prefix sum), trailing edge (full sum)
        c = np.pad(np.pad(c, edge_pad, mode="edge"), zeros_pad)
        hi = np.take(c, range(2 * r + 1, 2 * r + 1 + n), axis=axis)
        lo = np.take(c, range(0, n), axis=axis)
        return hi - lo

    num = box1(box1(x, 0, r), 1, r)
    den = box1(box1(ones, 0, r), 1, r)
    return num / den[(...,) + (None,) * (x.ndim - 2)]


def guided_filter(guide: np.ndarray, src: np.ndarray, radius: int = 10,
                  eps: float = 2.0 / 255.0**2) -> np.ndarray:
    """Color guided filter (He et al. 2010) — host-side numpy drop-in for
    the reference's `cv2.ximgproc.guidedFilter(gt, pred, 10, 2, -1)`
    (`/root/reference/utils/plots.py:518`, eps rescaled to [0,1] images).

    guide: (H, W, 3) in [0,1]; src: (H, W, C) or (H, W)."""
    I = np.asarray(guide, np.float64)
    p = np.asarray(src, np.float64)
    squeeze = p.ndim == 2
    if squeeze:
        p = p[..., None]
    r = radius
    mean_I = _box_filter(I, r)                       # (H, W, 3)
    mean_p = _box_filter(p, r)                       # (H, W, C)
    # 3x3 guide covariance per pixel
    corr_II = _box_filter(I[..., :, None] * I[..., None, :], r)
    var_I = corr_II - mean_I[..., :, None] * mean_I[..., None, :]
    var_I += eps * np.eye(3)
    corr_Ip = _box_filter(I[..., :, None] * p[..., None, :], r)
    cov_Ip = corr_Ip - mean_I[..., :, None] * mean_p[..., None, :]
    a = np.linalg.solve(var_I, cov_Ip)               # (H, W, 3, C)
    b = mean_p - np.einsum("hwkc,hwk->hwc", a, mean_I)
    mean_a = _box_filter(a.reshape(*a.shape[:2], -1), r).reshape(a.shape)
    mean_b = _box_filter(b, r)
    q = np.einsum("hwkc,hwk->hwc", mean_a, I) + mean_b
    out = q.astype(np.float32)
    return out[..., 0] if squeeze else out


# ---------------------------------------------------------------------------
# Color / metrics (JAX)
# ---------------------------------------------------------------------------


def linear_to_srgb(x):
    """Parity with `/root/reference/utils/rend_util.py:9-10`."""
    x = jnp.asarray(x)
    return jnp.where(x <= 0.0031308, x * 12.92, 1.055 * jnp.abs(x) ** (1 / 2.4) - 0.055)


def srgb_to_linear(x):
    x = jnp.asarray(x)
    return jnp.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def psnr(img1, img2, normalize_rgb: bool = False):
    """Peak signal-to-noise ratio for [0,1] images.

    Parity with `/root/reference/utils/rend_util.py:13-22`.
    """
    img1 = jnp.asarray(img1)
    img2 = jnp.asarray(img2)
    if normalize_rgb:
        img1 = (img1 + 1.0) / 2.0
        img2 = (img2 + 1.0) / 2.0
    mse = jnp.mean((img1 - img2) ** 2)
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def ssim(img1, img2, max_val: float = 1.0):
    """Structural similarity (per-channel 11x11 Gaussian, standard constants).

    Pure-JAX replacement for torchmetrics SSIM used at
    `/root/reference/model/trainer/recon.py:369`. Inputs: (..., H, W, C).
    """
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    # 11-tap Gaussian, sigma=1.5
    coords = jnp.arange(11, dtype=jnp.float32) - 5.0
    g = jnp.exp(-(coords**2) / (2.0 * 1.5**2))
    g = g / g.sum()

    def filt(x):
        # separable conv over H and W; x: (..., H, W, C)
        x = jnp.moveaxis(x, -1, 0)  # (C, ..., H, W)
        shape = x.shape
        x = x.reshape((-1, 1) + shape[-2:])
        kh = g.reshape(1, 1, 11, 1)
        kw = g.reshape(1, 1, 1, 11)
        from jax import lax

        x = lax.conv_general_dilated(x, kh, (1, 1), "VALID")
        x = lax.conv_general_dilated(x, kw, (1, 1), "VALID")
        x = x.reshape(shape[:-2] + x.shape[-2:])
        return jnp.moveaxis(x, 0, -1)

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2

    num = (2 * mu1_mu2 + c1) * (2 * sigma12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    # f32 rounding on near-identical images can push per-window values
    # epsilon past 1; SSIM is bounded by 1
    return jnp.mean(jnp.clip(num / den, -1.0, 1.0))
