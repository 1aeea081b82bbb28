// Common helpers for the i2sdf_tpu native (host-side) modules.
//
// These C++ modules replace the reference's native wheel dependencies
// (SURVEY.md §2a): skimage marching_cubes, sklearn KDTree, open3d TSDF
// fusion, pyrender depth rasterization. TPUs have no GL and the compute
// path is JAX/XLA; everything here is host-side mesh/metric tooling.
#pragma once

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
// All output buffers are malloc'd by the library and must be released
// with i2sdf_free.
void i2sdf_free(void* p);
}

inline float* copy_out(const std::vector<float>& v) {
  float* p = static_cast<float*>(std::malloc(v.size() * sizeof(float)));
  std::memcpy(p, v.data(), v.size() * sizeof(float));
  return p;
}

inline int32_t* copy_out(const std::vector<int32_t>& v) {
  int32_t* p = static_cast<int32_t*>(std::malloc(v.size() * sizeof(int32_t)));
  std::memcpy(p, v.data(), v.size() * sizeof(int32_t));
  return p;
}
