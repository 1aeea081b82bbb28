"""Input encodings: NeRF positional encoding, spherical harmonics, Fourier.

Capability parity with `/root/reference/model/network/embedder.py:1-160`.
All encoders are pure functions returning `(embed_fn, out_dim)`.

TPU-first channel layout: `[x | sin-block | cos-block]` with the sin/cos
blocks dim-major (`sin(x*f0..fK), sin(y*f0..fK), sin(z*f0..fK)`), computed
as ONE small matmul (`x @ B`) followed by two WIDE `sin`/`cos` ops. The
reference's interleaved per-frequency layout
(`embedder.py:28-47`: [x, sin(f0 x), cos(f0 x), sin(f1 x), ...]) lowers to
dozens of (N, 3) ops on TPU, each wasting 125/128 vector lanes — measured
as the dominant cost of the differentiated render step. The layouts are
exact permutations of each other, and the geometric initialization zeroes
every PE channel (`mlp.py` implicit_net_init), so training is EXACTLY
equivalent (permutation-symmetric init); only the internal channel order
differs. `pe_permutation_from_reference()` maps reference-ordered
first-layer weights into this layout if external checkpoints ever need
importing.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def positional_encoding(
    multires: int,
    input_dims: int = 3,
    include_input: bool = True,
    log_sampling: bool = True,
):
    """NeRF-style sin/cos positional encoding.

    Frequencies 2^0 .. 2^(multires-1) (log-spaced, matching
    `embedder.py:20-26` with max_freq_log2 = multires-1).
    """
    if log_sampling:
        freq_bands = 2.0 ** np.linspace(0.0, multires - 1, multires)
    else:
        freq_bands = np.linspace(2.0**0.0, 2.0 ** (multires - 1), multires)

    # basis matrix: (d, d*F), B[i, i*F + j] = f_j (dim-major sin/cos blocks)
    B = np.zeros((input_dims, input_dims * multires), np.float32)
    for i in range(input_dims):
        B[i, i * multires:(i + 1) * multires] = freq_bands
    B = jnp.asarray(B)

    out_dim = input_dims * ((1 if include_input else 0) + 2 * multires)

    def embed(x):
        xf = x @ B  # (..., d*F), one MXU op instead of 2F narrow ones
        parts = [x] if include_input else []
        return jnp.concatenate(parts + [jnp.sin(xf), jnp.cos(xf)], axis=-1)

    return embed, out_dim


def pe_frequencies(multires: int, log_sampling: bool = True) -> np.ndarray:
    """The frequency ladder used by `positional_encoding` (host-side)."""
    if log_sampling:
        return 2.0 ** np.linspace(0.0, multires - 1, multires)
    return np.linspace(2.0**0.0, 2.0 ** (multires - 1), multires)


def pe_permutation_from_reference(multires: int, input_dims: int = 3):
    """Column permutation mapping the reference's interleaved PE layout
    ([x, sin(f0 x), cos(f0 x), sin(f1 x), ...], embedder.py:28-47) to this
    framework's block layout ([x | sin dim-major | cos dim-major]).

    `new_emb = ref_emb[..., perm]`; equivalently, reference first-layer
    weight ROWS reorder as `w_new = w_ref[perm]` when importing external
    checkpoints."""
    d, F = input_dims, multires
    perm = list(range(d))  # identity block
    for i in range(d):  # sin block, dim-major
        for j in range(F):
            perm.append(d + 2 * j * d + i)
    for i in range(d):  # cos block
        for j in range(F):
            perm.append(d + (2 * j + 1) * d + i)
    return np.asarray(perm)


# Hardcoded real SH coefficients, degrees 0..4 (parity: embedder.py:54-82).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396]
_C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435]
_C4 = [2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761]


def spherical_harmonics(degree: int = 4, input_dims: int = 3):
    """Real SH basis evaluation up to degree 5 (out_dim = degree**2)."""
    assert input_dims == 3
    assert 1 <= degree <= 5
    out_dim = degree**2

    def embed(p):
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        res = [jnp.full_like(x, _C0)]
        if degree > 1:
            res += [-_C1 * y, _C1 * z, -_C1 * x]
        if degree > 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            res += [
                _C2[0] * xy,
                _C2[1] * yz,
                _C2[2] * (2.0 * zz - xx - yy),
                _C2[3] * xz,
                _C2[4] * (xx - yy),
            ]
        if degree > 3:
            res += [
                _C3[0] * y * (3 * xx - yy),
                _C3[1] * xy * z,
                _C3[2] * y * (4 * zz - xx - yy),
                _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                _C3[4] * x * (4 * zz - xx - yy),
                _C3[5] * z * (xx - yy),
                _C3[6] * x * (xx - 3 * yy),
            ]
        if degree > 4:
            res += [
                _C4[0] * xy * (xx - yy),
                _C4[1] * yz * (3 * xx - yy),
                _C4[2] * xy * (7 * zz - 1),
                _C4[3] * yz * (7 * zz - 3),
                _C4[4] * (zz * (35 * zz - 30) + 3),
                _C4[5] * xz * (7 * zz - 3),
                _C4[6] * (xx - yy) * (7 * zz - 1),
                _C4[7] * xz * (xx - 3 * yy),
                _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
            ]
        return jnp.stack(res, axis=-1)

    return embed, out_dim


def fourier_feature(
    key,
    channels: int,
    sigma: float = 1.0,
    input_dims: int = 3,
    include_input: bool = True,
):
    """Random Gaussian Fourier features (parity: embedder.py:125-135)."""
    import jax

    B = jax.random.normal(key, (input_dims, channels)) * sigma
    out_dim = 2 * channels + (input_dims if include_input else 0)

    def embed(x):
        xp = (2 * math.pi * x) @ B
        parts = [x] if include_input else []
        return jnp.concatenate(parts + [jnp.sin(xp), jnp.cos(xp)], axis=-1)

    return embed, out_dim


def get_embedder(embed_type: str = "positional", **kwargs):
    """Dispatch on encoder type; returns (embed_fn, out_dim).

    Parity with `/root/reference/model/network/embedder.py:138-160`.
    """
    if embed_type == "positional":
        return positional_encoding(
            multires=kwargs["multires"], input_dims=kwargs.get("input_dims", 3)
        )
    if embed_type == "spherical_harmonics":
        return spherical_harmonics(
            degree=kwargs.get("degree", 4), input_dims=kwargs.get("input_dims", 3)
        )
    if embed_type == "fourier":
        import jax

        key = kwargs.get("key", jax.random.PRNGKey(0))
        return fourier_feature(
            key,
            channels=kwargs["channels"],
            sigma=kwargs.get("sigma", 1.0),
            input_dims=kwargs.get("input_dims", 3),
            include_input=kwargs.get("include_input", True),
        )
    raise ValueError(f"Unknown embedding type: {embed_type}")
