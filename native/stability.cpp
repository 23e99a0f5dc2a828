// Native batch stability analyzer.
//
// C++ core for the eval pipeline's CPU-side hot loop: infer bond orders for
// every atom pair of every generated molecule from distance-threshold tables
// and check per-atom valences (the same math as
// geoldm_tpu/evalsuite/analyze.py check_stability, which mirrors the
// reference qm9/analyze.py:209-245). Called via ctypes from
// geoldm_tpu/evalsuite/native.py; the Python/numpy implementation remains
// the reference and the fallback.
//
// Threshold matrices are prepared in Python (threshold_matrices — already
// symmetrized with the sorted-pair convention, margins included, -inf where
// no bond exists) and passed in as dense [S, S] float64 arrays in picometers.

#include <cmath>
#include <cstdint>

extern "C" {

// positions: [n_mols, max_n, 3] float32 (Angstrom)
// atom_types: [n_mols, max_n] int32 (vocabulary indices)
// n_atoms: [n_mols] int32
// thr1/thr2/thr3: [s, s] float64 (pm, -inf = no bond)
// allowed: [s, max_allowed] int32, -1 padded (allowed valence counts)
// out_stable_atoms / out_total_atoms / out_mol_stable: [n_mols] int32
void check_stability_batch(
    const float* positions,
    const int32_t* atom_types,
    const int32_t* n_atoms,
    int64_t n_mols,
    int64_t max_n,
    const double* thr1,
    const double* thr2,
    const double* thr3,
    int64_t s,
    const int32_t* allowed,
    int64_t max_allowed,
    int32_t* out_stable_atoms,
    int32_t* out_total_atoms,
    int32_t* out_mol_stable) {
  // VLA-free scratch: valence counts per atom.
  static thread_local int32_t* bonds = nullptr;
  static thread_local int64_t bonds_cap = 0;
  if (bonds_cap < max_n) {
    delete[] bonds;
    bonds = new int32_t[max_n];
    bonds_cap = max_n;
  }

  for (int64_t m = 0; m < n_mols; ++m) {
    const int64_t n = n_atoms[m];
    const float* pos = positions + m * max_n * 3;
    const int32_t* types = atom_types + m * max_n;

    for (int64_t i = 0; i < n; ++i) bonds[i] = 0;

    for (int64_t i = 0; i < n; ++i) {
      const double xi = pos[i * 3 + 0];
      const double yi = pos[i * 3 + 1];
      const double zi = pos[i * 3 + 2];
      const int64_t ti = types[i];
      for (int64_t j = i + 1; j < n; ++j) {
        const double dx = xi - pos[j * 3 + 0];
        const double dy = yi - pos[j * 3 + 1];
        const double dz = zi - pos[j * 3 + 2];
        const double d = 100.0 * std::sqrt(dx * dx + dy * dy + dz * dz);
        const int64_t tj = types[j];
        const int64_t idx = ti * s + tj;
        int order = 0;
        if (d < thr1[idx]) {
          order = 1;
          if (d < thr2[idx]) {
            order = 2;
            if (d < thr3[idx]) order = 3;
          }
        }
        bonds[i] += order;
        bonds[j] += order;
      }
    }

    int32_t stable_atoms = 0;
    for (int64_t i = 0; i < n; ++i) {
      const int32_t* row = allowed + types[i] * max_allowed;
      bool ok = false;
      for (int64_t k = 0; k < max_allowed && row[k] >= 0; ++k) {
        if (bonds[i] == row[k]) {
          ok = true;
          break;
        }
      }
      stable_atoms += ok ? 1 : 0;
    }
    out_stable_atoms[m] = stable_atoms;
    out_total_atoms[m] = static_cast<int32_t>(n);
    out_mol_stable[m] = (stable_atoms == n) ? 1 : 0;
  }
}

}  // extern "C"
