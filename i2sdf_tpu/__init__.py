"""i2sdf_tpu — a TPU-native neural implicit SDF reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of I²-SDF
(jingsenzhu/i2-sdf, CVPR 2023): VolSDF-style volume rendering of indoor
scenes with an error-bounded adaptive ray sampler, Laplace-CDF density,
a battery of geometric losses (eikonal / depth / normal / smoothness /
bubble), novel-view synthesis, view interpolation, and marching-cubes
mesh extraction — built TPU-first:

* functional core: pure init/apply functions over parameter pytrees
* `jax.grad` (composed, not double-backward) for SDF normals & eikonal
* fixed-shape, statically-unrolled error-bound sampling (no dynamic
  control flow under `jit`)
* rays are the shard axis: data-parallel `shard_map`/`pjit` over a
  `jax.sharding.Mesh`, gradients reduced over ICI
* Pallas fused-MLP kernels for the hot no-grad SDF evaluation path
* host-side C++ modules (marching cubes, KD-tree metrics, TSDF fusion,
  depth rasterizer) replace skimage/open3d/pyrender

Reference parity map: see SURVEY.md at the repo root. Individual
modules cite the reference behavior they reproduce as
`/root/reference/<file>:<line>` in their docstrings.
"""

__version__ = "0.1.0"
