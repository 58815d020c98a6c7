// Host-side native helpers for drtk_tpu.
//
// TPU-native counterpart of the reference's host-side C++ (the pieces of
// facebookresearch/DRTK that run on the CPU rather than the accelerator):
//
//  * build_pair_structure — the topology-dependent CSR structure of the
//    interpolation normal matrix A^T A. The reference builds this on CPU in
//    `src/interpolate/interpolate_module.cpp:124-219` (keys = row*V + col
//    per face vertex-pair, sort + unique -> CSR, lower_bound -> the
//    per-face pair->nnz-slot table) and memoizes it in an LRU. Here the
//    same algorithm is exposed through a plain C ABI consumed via ctypes;
//    the LRU lives in Python (drtk_tpu/ops/interpolate.py).
//
// Built on demand by drtk_tpu/native/__init__.py with g++ -O3; no Python.h
// dependency so the library is interpreter-agnostic.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Deduplicate the 9 directed vertex pairs of every face.
//
//   vi            [num_faces * 3] int32 vertex indices
//   out_rows      [num_faces * 9] int32 (first *out_nnz entries valid)
//   out_cols      [num_faces * 9] int32 (first *out_nnz entries valid)
//   out_pair_slot [num_faces * 9] int32: slot of pair k=i*3+j of face f in
//                 the deduplicated list
//   out_nnz       number of unique pairs
//
// Returns 0 on success, nonzero on invalid arguments.
int drtk_build_pair_structure(
    const int32_t* vi,
    int64_t num_faces,
    int64_t num_vertices,
    int32_t* out_rows,
    int32_t* out_cols,
    int32_t* out_pair_slot,
    int64_t* out_nnz) {
  if (num_faces < 0 || num_vertices <= 0) {
    return 1;
  }
  const int64_t total = num_faces * 9;

  // keys[k] = row * V + col for the k-th directed pair.
  std::vector<int64_t> keys(static_cast<size_t>(total));
  for (int64_t f = 0; f < num_faces; ++f) {
    const int32_t* face = vi + f * 3;
    for (int i = 0; i < 3; ++i) {
      for (int j = 0; j < 3; ++j) {
        const int64_t r = face[i];
        const int64_t c = face[j];
        if (r < 0 || r >= num_vertices || c < 0 || c >= num_vertices) {
          return 2;
        }
        keys[static_cast<size_t>(f * 9 + i * 3 + j)] = r * num_vertices + c;
      }
    }
  }

  // Sorted unique keys (the CSR structure).
  std::vector<int64_t> uniq(keys);
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
  const int64_t nnz = static_cast<int64_t>(uniq.size());

  for (int64_t s = 0; s < nnz; ++s) {
    out_rows[s] = static_cast<int32_t>(uniq[static_cast<size_t>(s)] / num_vertices);
    out_cols[s] = static_cast<int32_t>(uniq[static_cast<size_t>(s)] % num_vertices);
  }

  // pair -> nnz slot via binary search (interpolate_module.cpp lower_bound).
  for (int64_t k = 0; k < total; ++k) {
    const int64_t key = keys[static_cast<size_t>(k)];
    const auto it = std::lower_bound(uniq.begin(), uniq.end(), key);
    out_pair_slot[k] = static_cast<int32_t>(it - uniq.begin());
  }

  *out_nnz = nnz;
  return 0;
}

// Library version tag for cache-busting of the on-demand build.
int drtk_native_abi_version(void) {
  return 1;
}

}  // extern "C"
