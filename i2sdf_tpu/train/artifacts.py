"""Visualization artifacts: plot grids, depth colormaps, hotmaps, HTML.

Capability parity with `/root/reference/utils/plots.py:492-583` (image
writers), `model/trainer/recon.py:112-140` (bubble hotmap/countmap), and
`utils/plots.py:76-117` (pointcloud HTML — rebuilt dependency-free since
plotly is not available; the HTML is self-contained canvas JS).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..utils.imaging import write_exr_or_npy

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
import cv2  # noqa: E402


def _to_u8(img: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)


def write_rgb(path: str, rgb: np.ndarray) -> None:
    """rgb: (H, W, 3) in [0, 1] -> PNG (or EXR/npy for float HDR paths)."""
    if path.endswith((".exr", ".npy")):
        write_exr_or_npy(path, rgb)
    else:
        cv2.imwrite(path, _to_u8(rgb)[:, :, ::-1])


def write_pred_gt_grid(path: str, pred: np.ndarray, gt: np.ndarray) -> None:
    """Side-by-side pred | gt panel (parity plots.py plot_images)."""
    panel = np.concatenate([_to_u8(pred), _to_u8(gt)], axis=1)
    cv2.imwrite(path, panel[:, :, ::-1])


def write_depth(path: str, depth: np.ndarray, max_depth: float | None = None,
                raw_exr_path: str | None = None) -> None:
    """Viridis-colormapped depth PNG + optional raw EXR/npy
    (parity plots.py plot_depths)."""
    depth = np.asarray(depth)
    if raw_exr_path:
        write_exr_or_npy(raw_exr_path, depth)
    scale = max_depth or max(float(depth.max()), 1e-6)
    u8 = (np.clip(depth / scale, 0, 1) * 255).astype(np.uint8)
    cv2.imwrite(path, cv2.applyColorMap(u8, cv2.COLORMAP_VIRIDIS))


def write_colormap(path: str, values: np.ndarray,
                   colormap=cv2.COLORMAP_MAGMA) -> None:
    u8 = (np.clip(np.asarray(values), 0, 1) * 255).astype(np.uint8)
    cv2.imwrite(path, cv2.applyColorMap(u8, colormap))


def write_normal(path: str, normal: np.ndarray) -> None:
    """(H, W, 3) in [-1, 1] -> PNG (and EXR passthrough for raw paths)."""
    if path.endswith((".exr", ".npy")):
        write_exr_or_npy(path, normal)
    else:
        write_rgb(path, (np.asarray(normal) + 1.0) / 2.0)


def write_hotmaps(out_dir: str, pdf: np.ndarray, pixlinks: np.ndarray,
                  n_images: int, img_res, step: int | None = None,
                  trace_idx: int = -1, trace_dir: str | None = None,
                  suffix: str = "hot") -> None:
    """Scatter the point-cloud pdf back to per-image MAGMA heatmaps
    (parity trainer/recon.py:112-125)."""
    os.makedirs(out_dir, exist_ok=True)
    H, W = img_res
    flat = np.zeros(n_images * H * W, np.float32)
    flat[np.asarray(pixlinks)] = np.asarray(pdf)
    maps = flat.reshape(n_images, H, W)
    for i, m in enumerate(maps):
        u8 = (np.clip(m, 0, 1) * 255).astype(np.uint8)
        colored = cv2.applyColorMap(u8, cv2.COLORMAP_MAGMA)
        cv2.imwrite(os.path.join(out_dir, f"{i:04d}.png"), colored)
        if trace_idx == i and trace_dir and step is not None:
            cv2.imwrite(os.path.join(trace_dir, f"{step}_{suffix}.png"),
                        colored)


def write_countmaps(out_dir: str, counts: np.ndarray, pixlinks: np.ndarray,
                    n_images: int, img_res, **kwargs) -> None:
    counts = np.asarray(counts, np.float32)
    counts = counts / max(1.0, counts.max())
    write_hotmaps(out_dir, counts, pixlinks, n_images, img_res,
                  suffix="cnt", **kwargs)


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>pointcloud</title></head>
<body style="margin:0;background:#111">
<canvas id="c" width="1000" height="800" style="display:block;margin:auto"></canvas>
<script>
const pts = %%POINTS%%;
const canvas = document.getElementById('c'), ctx = canvas.getContext('2d');
let ax = 0.5, ay = 0.5, dist = 3.0, drag = false, lx = 0, ly = 0;
canvas.onmousedown = e => { drag = true; lx = e.clientX; ly = e.clientY; };
window.onmouseup = () => drag = false;
window.onmousemove = e => { if (!drag) return;
  ay += (e.clientX - lx) * 0.01; ax += (e.clientY - ly) * 0.01;
  lx = e.clientX; ly = e.clientY; draw(); };
canvas.onwheel = e => { dist *= e.deltaY > 0 ? 1.1 : 0.9; draw();
  e.preventDefault(); };
function draw() {
  ctx.fillStyle = '#111'; ctx.fillRect(0, 0, canvas.width, canvas.height);
  const ca = Math.cos(ax), sa = Math.sin(ax);
  const cb = Math.cos(ay), sb = Math.sin(ay);
  const f = 400 / dist;
  ctx.fillStyle = '#7fd4ff';
  for (let i = 0; i < pts.length; i += 3) {
    let x = pts[i], y = pts[i+1], z = pts[i+2];
    let x1 = cb*x + sb*z, z1 = -sb*x + cb*z;
    let y1 = ca*y - sa*z1, z2 = sa*y + ca*z1 + dist;
    if (z2 < 0.1) continue;
    ctx.fillRect(500 + f*x1/z2*3, 400 - f*y1/z2*3, 1.2, 1.2);
  }
}
draw();
</script></body></html>
"""


def write_pointcloud_html(points: np.ndarray, path: str,
                          max_points: int = 200_000) -> None:
    """Self-contained interactive point-cloud viewer (no plotly needed)."""
    pts = np.asarray(points, np.float32)
    if len(pts) > max_points:
        idx = np.random.default_rng(0).choice(len(pts), max_points,
                                              replace=False)
        pts = pts[idx]
    data = json.dumps(np.round(pts, 3).reshape(-1).tolist())
    with open(path, "w") as f:
        f.write(_HTML_TEMPLATE.replace("%%POINTS%%", data))
