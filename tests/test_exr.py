"""Native EXR IO (native/src/exr.cpp): roundtrips + an independent
pure-Python EXR writer to validate the reader against the OpenEXR spec
(this container has no other EXR implementation to interop with).

Parity target: the reference's released datasets are EXR depth/normal/
hdr loaded via cv2 (`/root/reference/utils/rend_util.py:25-54`).
"""

import os
import struct
import zlib

import numpy as np
import pytest

from i2sdf_tpu import native
from i2sdf_tpu.utils import imaging


# ---------------------------------------------------------------------------
# independent minimal EXR writer (pure Python, from the OpenEXR spec)
# ---------------------------------------------------------------------------


def _attr(name: str, typ: str, payload: bytes) -> bytes:
    return (name.encode() + b"\0" + typ.encode() + b"\0"
            + struct.pack("<i", len(payload)) + payload)


def _py_write_exr(path, channels: dict, compression: int):
    """channels: name -> (H, W) float32; compression 0=NONE or 2=ZIPS."""
    names = sorted(channels)
    h, w = next(iter(channels.values())).shape
    chlist = b""
    for n in names:
        chlist += (n.encode() + b"\0" + struct.pack("<i", 2)  # FLOAT
                   + b"\0\0\0\0" + struct.pack("<ii", 1, 1))
    chlist += b"\0"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (
        struct.pack("<I", 20000630) + struct.pack("<i", 2)
        + _attr("channels", "chlist", chlist)
        + _attr("compression", "compression", bytes([compression]))
        + _attr("dataWindow", "box2i", box)
        + _attr("displayWindow", "box2i", box)
        + _attr("lineOrder", "lineOrder", b"\0")
        + _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
        + _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\0")

    chunks = []
    for y in range(h):  # 1 scanline per chunk for NONE and ZIPS
        raw = b"".join(channels[n][y].astype("<f4").tobytes()
                       for n in names)
        if compression == 2:  # ZIPS: reorder + delta + deflate
            buf = bytearray(raw)
            n = len(buf)
            tmp = bytearray(n)
            half = (n + 1) // 2
            tmp[:half] = buf[0::2]
            tmp[half:] = buf[1::2]
            for i in range(n - 1, 0, -1):
                tmp[i] = (tmp[i] - tmp[i - 1] + 128 + 256) & 0xFF
            packed = zlib.compress(bytes(tmp))
            if len(packed) >= n:
                packed = raw
        else:
            packed = raw
        chunks.append(struct.pack("<ii", y, len(packed)) + packed)

    offset = len(header) + 8 * h
    table = b""
    for ch in chunks:
        table += struct.pack("<Q", offset)
        offset += len(ch)
    with open(path, "wb") as f:
        f.write(header + table + b"".join(chunks))


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("half,compression", [
    (False, "none"), (False, "zip"), (True, "zip")])
def test_roundtrip_rgb(tmp_path, half, compression):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 4, (37, 53, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    native.exr_write(p, img, half=half, compression=compression)
    back, names = native.exr_read(p)
    assert names == ["R", "G", "B"]
    if half:
        np.testing.assert_allclose(back, img, rtol=2e-3, atol=1e-3)
    else:
        np.testing.assert_array_equal(back, img)


def test_roundtrip_single_channel_multiblock(tmp_path):
    # >16 scanlines exercises multiple ZIP blocks + the offset table
    rng = np.random.default_rng(1)
    depth = rng.uniform(0.1, 6, (100, 160)).astype(np.float32)
    p = str(tmp_path / "d.exr")
    native.exr_write(p, depth, names=["Z"], half=False)
    back, names = native.exr_read(p)
    assert names == ["Z"]
    np.testing.assert_array_equal(back, depth)


def test_reader_against_independent_writer_none(tmp_path):
    rng = np.random.default_rng(2)
    r = rng.normal(size=(20, 31)).astype(np.float32)
    g = rng.normal(size=(20, 31)).astype(np.float32)
    b = rng.normal(size=(20, 31)).astype(np.float32)
    p = str(tmp_path / "py.exr")
    _py_write_exr(p, {"R": r, "G": g, "B": b}, compression=0)
    back, names = native.exr_read(p)
    assert names == ["R", "G", "B"]
    np.testing.assert_array_equal(back[:, :, 0], r)
    np.testing.assert_array_equal(back[:, :, 1], g)
    np.testing.assert_array_equal(back[:, :, 2], b)


def test_reader_against_independent_writer_zips(tmp_path):
    # validates the zip reorder+predictor filters against the spec
    rng = np.random.default_rng(3)
    z = (rng.uniform(0, 5, (24, 17)) ** 2).astype(np.float32)
    p = str(tmp_path / "pyz.exr")
    _py_write_exr(p, {"Z": z}, compression=2)
    back, names = native.exr_read(p)
    assert names == ["Z"]
    np.testing.assert_array_equal(back, z)


def test_imaging_loaders_use_native_exr(tmp_path):
    rng = np.random.default_rng(4)
    # hdr image
    hdr = rng.uniform(0, 8, (16, 16, 3)).astype(np.float32)
    p = str(tmp_path / "hdr.exr")
    native.exr_write(p, hdr, half=False)
    loaded = imaging.load_rgb(p, is_hdr=True)
    np.testing.assert_allclose(loaded, hdr, atol=1e-6)
    # depth replicated across channels like the reference datasets
    depth = rng.uniform(0.1, 5, (16, 16)).astype(np.float32)
    pd = str(tmp_path / "depth.exr")
    native.exr_write(pd, np.repeat(depth[..., None], 3, -1), half=False)
    np.testing.assert_allclose(imaging.load_depth(pd), depth, atol=1e-6)
    # normal map
    n = rng.normal(size=(16, 16, 3)).astype(np.float32)
    pn = str(tmp_path / "n.exr")
    native.exr_write(pn, n, half=False)
    np.testing.assert_allclose(imaging.load_normal(pn), n, atol=1e-6)
    # write path round-trips through write_exr_or_npy
    out = imaging.write_exr_or_npy(str(tmp_path / "o.exr"), hdr)
    assert out.endswith(".exr")
    np.testing.assert_allclose(imaging.load_rgb(out, is_hdr=True), hdr,
                               atol=1e-6)


def test_half_values_roundtrip_exact_for_representable():
    # powers of two and small integers are exactly representable in half
    vals = np.array([[0.0, 1.0, 0.5, 2.0, -4.0, 0.25, 1024.0, -0.125]],
                    np.float32).reshape(1, 8)
    p = "/tmp/half_exact.exr"
    native.exr_write(p, vals, names=["Y"], half=True, compression="none")
    back, _ = native.exr_read(p)
    np.testing.assert_array_equal(back, vals)
    os.remove(p)


# ---------------------------------------------------------------------------
# released-dataset (Blender) layout fixtures — VERDICT r1 item 7:
# depth as a single 'V' FLOAT channel, HALF RGB normals, ZIP (type 3)
# 16-scanline blocks. Written by an independent pure-Python encoder so
# kitchen_0-style ingestion is proven before the data ever arrives
# (/root/reference/DATA_CONVENTION.md, utils/rend_util.py:25-54).
# ---------------------------------------------------------------------------


def _zip_filter(raw: bytes) -> bytes:
    """OpenEXR zip pre-filter: byte de-interleave + delta predictor."""
    buf = bytearray(raw)
    n = len(buf)
    tmp = bytearray(n)
    half = (n + 1) // 2
    tmp[:half] = buf[0::2]
    tmp[half:] = buf[1::2]
    for i in range(n - 1, 0, -1):
        tmp[i] = (tmp[i] - tmp[i - 1] + 128 + 256) & 0xFF
    return bytes(tmp)


def _py_write_exr_blender(path, channels, compression=3):
    """channels: name -> (arr (H, W) float32, pixel_type 1=HALF/2=FLOAT).
    compression 3 = ZIP with 16-scanline blocks (Blender's default for
    its EXR outputs); channel order alphabetical as the spec requires."""
    names = sorted(channels)
    h, w = next(iter(channels.values()))[0].shape
    chlist = b""
    for n in names:
        ptype = channels[n][1]
        chlist += (n.encode() + b"\0" + struct.pack("<i", ptype)
                   + b"\0\0\0\0" + struct.pack("<ii", 1, 1))
    chlist += b"\0"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (
        struct.pack("<I", 20000630) + struct.pack("<i", 2)
        + _attr("channels", "chlist", chlist)
        + _attr("compression", "compression", bytes([compression]))
        + _attr("dataWindow", "box2i", box)
        + _attr("displayWindow", "box2i", box)
        + _attr("lineOrder", "lineOrder", b"\0")
        + _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
        + _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\0")

    lines_per_block = 16 if compression == 3 else 1
    chunks = []
    for y0 in range(0, h, lines_per_block):
        raw = b""
        for y in range(y0, min(y0 + lines_per_block, h)):
            for n in names:
                arr, ptype = channels[n]
                dt = "<f2" if ptype == 1 else "<f4"
                raw += arr[y].astype(dt).tobytes()
        packed = zlib.compress(_zip_filter(raw))
        if len(packed) >= len(raw):
            packed = raw
        chunks.append(struct.pack("<ii", y0, len(packed)) + packed)

    offset = len(header) + 8 * len(chunks)
    table = b""
    for ch in chunks:
        table += struct.pack("<Q", offset)
        offset += len(ch)
    with open(path, "wb") as f:
        f.write(header + table + b"".join(chunks))


def test_blender_depth_v_channel_zip(tmp_path):
    """Depth as Blender writes it: one FLOAT 'V' channel, ZIP blocks."""
    rng = np.random.default_rng(11)
    depth = (rng.uniform(0.2, 7.5, (70, 90))).astype(np.float32)
    p = str(tmp_path / "depth_blender.exr")
    _py_write_exr_blender(p, {"V": (depth, 2)}, compression=3)
    back, names = native.exr_read(p)
    assert names == ["V"]
    np.testing.assert_array_equal(np.asarray(back).reshape(70, 90), depth)
    # the dataset loader path (ReconData depth ingestion)
    d = imaging.load_depth(p)
    assert d.shape == (70, 90)
    np.testing.assert_array_equal(d, depth)


def test_blender_depth_y_channel_zip(tmp_path):
    """Some Blender exports name the single channel 'Y' instead of 'V'."""
    rng = np.random.default_rng(12)
    depth = (rng.uniform(0.2, 7.5, (40, 50))).astype(np.float32)
    p = str(tmp_path / "depth_y.exr")
    _py_write_exr_blender(p, {"Y": (depth, 2)}, compression=3)
    d = imaging.load_depth(p)
    np.testing.assert_array_equal(d, depth)


def test_blender_half_normals_zip(tmp_path):
    """Normals as the released sets store them: HALF R/G/B, ZIP blocks
    (zero vectors mark invalid areas, DATA_CONVENTION.md)."""
    rng = np.random.default_rng(13)
    n = rng.normal(size=(37, 61, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n[5:9, 10:20] = 0.0  # invalid windows
    n_half = n.astype(np.float16).astype(np.float32)  # storage precision
    p = str(tmp_path / "normal_blender.exr")
    _py_write_exr_blender(
        p, {"R": (n[..., 0], 1), "G": (n[..., 1], 1),
            "B": (n[..., 2], 1)}, compression=3)
    back, names = native.exr_read(p)
    assert names == ["R", "G", "B"]
    np.testing.assert_allclose(np.asarray(back), n_half, atol=1e-7)
    # loader path: load_normal returns RGB
    ln = imaging.load_normal(p)
    np.testing.assert_allclose(ln, n_half, atol=1e-7)
    assert (ln[5:9, 10:20] == 0).all()


def test_blender_hdr_half_rgb_zip(tmp_path):
    """HDR images: HALF RGB with values > 1, ZIP blocks, load_rgb path."""
    rng = np.random.default_rng(14)
    hdr = (rng.uniform(0, 16, (33, 48, 3))).astype(np.float32)
    hdr_half = hdr.astype(np.float16).astype(np.float32)
    p = str(tmp_path / "hdr_blender.exr")
    _py_write_exr_blender(
        p, {"R": (hdr[..., 0], 1), "G": (hdr[..., 1], 1),
            "B": (hdr[..., 2], 1)}, compression=3)
    img = imaging.load_rgb(p, is_hdr=True)
    np.testing.assert_allclose(img, hdr_half, atol=1e-7)


def test_blender_mixed_half_float_rgbz(tmp_path):
    """Mixed per-channel pixel types in one file (RGB HALF + Z FLOAT)
    exercise the per-channel byte accounting inside ZIP blocks."""
    rng = np.random.default_rng(15)
    rgb = rng.uniform(0, 2, (21, 30, 3)).astype(np.float32)
    z = rng.uniform(0.5, 6, (21, 30)).astype(np.float32)
    p = str(tmp_path / "mixed.exr")
    _py_write_exr_blender(
        p, {"R": (rgb[..., 0], 1), "G": (rgb[..., 1], 1),
            "B": (rgb[..., 2], 1), "Z": (z, 2)}, compression=3)
    back, names = native.exr_read(p)
    assert set(names) == {"R", "G", "B", "Z"}
    zi = names.index("Z")
    np.testing.assert_array_equal(np.asarray(back)[:, :, zi], z)
