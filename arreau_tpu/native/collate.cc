// Native dense-batch collator for the crystal data pipeline.
//
// Replaces the reference's PyG DataLoader worker collation (torch_geometric
// Batch building, /root/reference/main_diffusion.py:221-230) with a single
// tight loop over the packed columnar store: gather each selected crystal's
// atoms into the padded dense [B, A] batch buffers the TPU input pipeline
// feeds to jax. Built as a plain shared library and called through ctypes
// (no pybind11 dependency).
//
// Layout contracts (all row-major, caller-allocated):
//   type_indices [total_atoms] int64 — z-table indices per atom
//   frac_coords  [total_atoms, 3] double
//   offsets      [n_crystals + 1] int64 prefix sums into the atom axis
//   lattices     [n_crystals, 3, 3] double
//   idx          [B] int64 — crystals to collate; idx < 0 emits an empty
//                padding example (mask all 0, num_atoms 0, identity lattice)
//                so short final chunks don't bias epoch metrics with
//                duplicated crystals
// Outputs:
//   frac_out     [B, A, 3] float  (padded with 0)
//   types_out    [B, A] int32     (padded with 0)
//   lattice_out  [B, 3, 3] float
//   num_atoms_out[B] int32
//   mask_out     [B, A] uint8

#include <cstdint>
#include <cstring>

extern "C" {

int collate_dense_f32(const int64_t* type_indices, const double* frac_coords,
                      const int64_t* offsets, const double* lattices,
                      const int64_t* idx, int64_t batch, int64_t max_atoms,
                      float* frac_out, int32_t* types_out, float* lattice_out,
                      int32_t* num_atoms_out, uint8_t* mask_out) {
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t ci = idx[b];
    if (ci < 0) {  // padding sentinel: empty example
      std::memset(frac_out + b * max_atoms * 3, 0, sizeof(float) * 3 * max_atoms);
      std::memset(types_out + b * max_atoms, 0, sizeof(int32_t) * max_atoms);
      std::memset(mask_out + b * max_atoms, 0, sizeof(uint8_t) * max_atoms);
      float* lat_dst = lattice_out + b * 9;
      std::memset(lat_dst, 0, sizeof(float) * 9);
      lat_dst[0] = lat_dst[4] = lat_dst[8] = 1.0f;  // identity keeps codecs finite
      num_atoms_out[b] = 0;
      continue;
    }
    const int64_t start = offsets[ci];
    const int64_t count = offsets[ci + 1] - start;
    if (count > max_atoms) return 1;  // crystal exceeds bucket

    float* frac_b = frac_out + b * max_atoms * 3;
    int32_t* types_b = types_out + b * max_atoms;
    uint8_t* mask_b = mask_out + b * max_atoms;

    for (int64_t a = 0; a < count; ++a) {
      const double* src = frac_coords + (start + a) * 3;
      frac_b[a * 3 + 0] = static_cast<float>(src[0]);
      frac_b[a * 3 + 1] = static_cast<float>(src[1]);
      frac_b[a * 3 + 2] = static_cast<float>(src[2]);
      types_b[a] = static_cast<int32_t>(type_indices[start + a]);
      mask_b[a] = 1;
    }
    std::memset(frac_b + count * 3, 0, sizeof(float) * 3 * (max_atoms - count));
    std::memset(types_b + count, 0, sizeof(int32_t) * (max_atoms - count));
    std::memset(mask_b + count, 0, sizeof(uint8_t) * (max_atoms - count));

    const double* lat_src = lattices + ci * 9;
    float* lat_dst = lattice_out + b * 9;
    for (int k = 0; k < 9; ++k) lat_dst[k] = static_cast<float>(lat_src[k]);
    num_atoms_out[b] = static_cast<int32_t>(count);
  }
  return 0;
}

}  // extern "C"
