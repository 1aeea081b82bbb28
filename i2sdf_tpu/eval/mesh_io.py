"""Triangle-mesh IO and sampling (host-side, numpy).

Replaces the trimesh usages of the reference
(`/root/reference/utils/plots.py:219`, `model/eval/recon.py:61-63,106`):
binary-PLY export/import, area-weighted surface sampling, and scale_mat
application.
"""

from __future__ import annotations

import numpy as np


def write_ply(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    """Binary little-endian PLY."""
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int32)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(tris)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(verts.astype("<f4").tobytes())
        # uint8 count + 3x int32 per face, as a packed structured array
        rec = np.zeros(len(tris), dtype=[("n", "u1"), ("v", "<i4", (3,))])
        rec["n"] = 3
        rec["v"] = tris
        f.write(rec.tobytes())


def read_ply(path: str):
    """Minimal binary/ascii PLY reader (positions + faces)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n_vert = n_face = 0
        fmt = "binary_little_endian"
        props = []
        elem = None
        for line in header:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elem = parts[1]
                if elem == "vertex":
                    n_vert = int(parts[2])
                elif elem == "face":
                    n_face = int(parts[2])
            elif parts[0] == "property" and elem == "vertex":
                props.append(parts[-1])
        n_props = len(props)
        if fmt == "ascii":
            verts = np.loadtxt(f, max_rows=n_vert).reshape(n_vert, -1)
            faces = np.loadtxt(f, max_rows=n_face).astype(np.int64)
            return (verts[:, :3].astype(np.float32),
                    faces[:, 1:4].astype(np.int32))
        vdata = np.frombuffer(f.read(n_vert * n_props * 4), dtype="<f4")
        verts = vdata.reshape(n_vert, n_props)[:, :3].copy()
        rec = np.frombuffer(
            f.read(n_face * (1 + 12)),
            dtype=[("n", "u1"), ("v", "<i4", (3,))])
        return verts.astype(np.float32), rec["v"].astype(np.int32).copy()


def triangle_areas(verts: np.ndarray, tris: np.ndarray) -> np.ndarray:
    v0, v1, v2 = (verts[tris[:, i]] for i in range(3))
    return 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)


def sample_surface(verts: np.ndarray, tris: np.ndarray, n: int,
                   seed: int = 0) -> np.ndarray:
    """Area-weighted uniform surface sampling (trimesh.sample parity)."""
    rng = np.random.default_rng(seed)
    areas = triangle_areas(verts, tris)
    total = areas.sum()
    if total <= 0 or len(tris) == 0:
        raise ValueError("degenerate mesh: zero surface area")
    probs = areas / total
    idx = rng.choice(len(tris), size=n, p=probs)
    u = rng.random(n)
    v = rng.random(n)
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    v0, v1, v2 = (verts[tris[idx, i]] for i in range(3))
    return (v0 + u[:, None] * (v1 - v0) + v[:, None] * (v2 - v0)).astype(
        np.float32)


def transform_verts(verts: np.ndarray, mat4: np.ndarray) -> np.ndarray:
    """Apply a 4x4 to (N, 3) vertices."""
    vh = np.concatenate([verts, np.ones_like(verts[:, :1])], axis=1)
    out = vh @ np.asarray(mat4, np.float32).T
    return out[:, :3] / out[:, 3:]
