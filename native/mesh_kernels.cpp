// Native host-side mesh/DoF kernels for openifem_tpu.
//
// Role: the reference builds meshes, dof numberings and adjacency with
// deal.II/p4est (C++); these are the TPU framework's equivalents for the
// host-side setup path, where Python loops become the bottleneck at
// production mesh sizes (millions of cells).  Loaded via ctypes
// (openifem_tpu/native/__init__.py); every entry point has a pure-Python
// fallback so the framework works without the compiled library.
//
// Conventions match openifem_tpu.mesh.mesh: cell vertices in z-order,
// faces ordered [-x,+x,-y,+y,-z,+z].

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// 2D quad edges as local vertex pairs (bottom, top, left, right)
const int EDGES_2D[4][2] = {{0, 1}, {2, 3}, {0, 2}, {1, 3}};
// 3D hex edges (12)
const int EDGES_3D[12][2] = {{0, 1}, {2, 3}, {4, 5}, {6, 7}, {0, 2}, {1, 3},
                             {4, 6}, {5, 7}, {0, 4}, {1, 5}, {2, 6}, {3, 7}};
// 3D hex faces (deal.II order)
const int FACES_3D[6][4] = {{0, 2, 4, 6}, {1, 3, 5, 7}, {0, 1, 4, 5},
                            {2, 3, 6, 7}, {0, 1, 2, 3}, {4, 5, 6, 7}};
// 2D quad faces
const int FACES_2D[4][2] = {{0, 2}, {1, 3}, {0, 1}, {2, 3}};

inline uint64_t edge_key(int64_t a, int64_t b) {
  if (a > b) std::swap(a, b);
  return (static_cast<uint64_t>(a) << 32) | static_cast<uint64_t>(b);
}

struct Key4 {
  int64_t v[4];
  bool operator==(const Key4 &o) const {
    return v[0] == o.v[0] && v[1] == o.v[1] && v[2] == o.v[2] &&
           v[3] == o.v[3];
  }
};

struct Key4Hash {
  size_t operator()(const Key4 &k) const {
    uint64_t h = 1469598103934665603ull;
    for (int i = 0; i < 4; ++i) {
      h ^= static_cast<uint64_t>(k.v[i]);
      h *= 1099511628211ull;
    }
    return static_cast<size_t>(h);
  }
};

inline Key4 face_key(const int64_t *vs, int n) {
  Key4 k{{0, 0, 0, 0}};
  for (int i = 0; i < n; ++i) k.v[i] = vs[i];
  // insertion sort (n <= 4)
  for (int i = 1; i < n; ++i)
    for (int j = i; j > 0 && k.v[j - 1] > k.v[j]; --j)
      std::swap(k.v[j - 1], k.v[j]);
  return k;
}

}  // namespace

extern "C" {

// Q_k (k in {1,2}) continuous dof numbering: fills cell_dofs (n_c, (k+1)^dim)
// with lexicographic (x-fastest) local ordering; returns the total node
// count.  Node ids: [vertices][edge nodes][face nodes (3D)][cell nodes].
int64_t build_cell_dofs(const int64_t *cells, int64_t n_c, int dim,
                        int degree, int64_t n_vertices, int64_t *cell_dofs) {
  const int nv = 1 << dim;
  const int n1 = degree + 1;
  const int nl = (dim == 2) ? n1 * n1 : n1 * n1 * n1;

  if (degree == 1) {
    // vertex nodes only; local lexicographic == z-order bit pattern
    for (int64_t c = 0; c < n_c; ++c)
      for (int l = 0; l < nv; ++l) cell_dofs[c * nl + l] = cells[c * nv + l];
    return n_vertices;
  }

  // degree == 2
  std::unordered_map<uint64_t, int64_t> edge_ids;
  std::unordered_map<Key4, int64_t, Key4Hash> face_ids;
  edge_ids.reserve(static_cast<size_t>(n_c) * (dim == 2 ? 4 : 12));
  int64_t next = n_vertices;

  const int n_edges = (dim == 2) ? 4 : 12;
  for (int64_t c = 0; c < n_c; ++c) {
    const int64_t *v = cells + c * nv;
    for (int e = 0; e < n_edges; ++e) {
      const int *ev = (dim == 2) ? EDGES_2D[e] : EDGES_3D[e];
      uint64_t key = edge_key(v[ev[0]], v[ev[1]]);
      if (edge_ids.emplace(key, next).second) ++next;
    }
  }
  int64_t face_start = next;
  if (dim == 3) {
    face_ids.reserve(static_cast<size_t>(n_c) * 6);
    for (int64_t c = 0; c < n_c; ++c) {
      const int64_t *v = cells + c * nv;
      for (int f = 0; f < 6; ++f) {
        int64_t vs[4] = {v[FACES_3D[f][0]], v[FACES_3D[f][1]],
                         v[FACES_3D[f][2]], v[FACES_3D[f][3]]};
        if (face_ids.emplace(face_key(vs, 4), next).second) ++next;
      }
    }
  }
  int64_t interior_start = next;
  next += n_c;  // one interior node per cell (Q2)

  // fill cell_dofs: iterate lattice indices
  for (int64_t c = 0; c < n_c; ++c) {
    const int64_t *v = cells + c * nv;
    for (int l = 0; l < nl; ++l) {
      int idx[3] = {0, 0, 0};
      int rem = l;
      for (int d = 0; d < dim; ++d) {
        idx[d] = rem % n1;
        rem /= n1;
      }
      int n_int = 0, int_axes[3];
      for (int d = 0; d < dim; ++d)
        if (idx[d] == 1) int_axes[n_int++] = d;
      auto vbit = [&](const int *ii) {
        int b = 0;
        for (int d = 0; d < dim; ++d)
          if (ii[d] == 2) b |= (1 << d);
        return v[b];
      };
      if (n_int == 0) {
        cell_dofs[c * nl + l] = vbit(idx);
      } else if (n_int == 1) {
        int d = int_axes[0];
        int lo[3] = {idx[0], idx[1], idx[2]};
        int hi[3] = {idx[0], idx[1], idx[2]};
        lo[d] = 0;
        hi[d] = 2;
        cell_dofs[c * nl + l] = edge_ids[edge_key(vbit(lo), vbit(hi))];
      } else if (n_int == 2 && dim == 3) {
        int d_fix = 3 - int_axes[0] - int_axes[1];
        int f = 2 * d_fix + (idx[d_fix] == 2 ? 1 : 0);
        int64_t vs[4] = {v[FACES_3D[f][0]], v[FACES_3D[f][1]],
                         v[FACES_3D[f][2]], v[FACES_3D[f][3]]};
        cell_dofs[c * nl + l] = face_ids[face_key(vs, 4)];
      } else {
        cell_dofs[c * nl + l] = interior_start + c;
      }
    }
  }
  (void)face_start;
  return next;
}

// Counts how many cells share each (cell, face); out (n_c, 2*dim).
// A count of 1 means boundary/exposed face.
void face_occurrences(const int64_t *cells, int64_t n_c, int dim,
                      int32_t *out) {
  const int nv = 1 << dim;
  const int nf = 2 * dim;
  std::unordered_map<Key4, int32_t, Key4Hash> counts;
  counts.reserve(static_cast<size_t>(n_c) * nf);
  const int fvn = (dim == 2) ? 2 : 4;
  for (int64_t c = 0; c < n_c; ++c) {
    const int64_t *v = cells + c * nv;
    for (int f = 0; f < nf; ++f) {
      const int *fv = (dim == 2) ? FACES_2D[f] : FACES_3D[f];
      int64_t vs[4] = {0, 0, 0, 0};
      for (int i = 0; i < fvn; ++i) vs[i] = v[fv[i]];
      counts[face_key(vs, fvn)] += 1;
    }
  }
  for (int64_t c = 0; c < n_c; ++c) {
    const int64_t *v = cells + c * nv;
    for (int f = 0; f < nf; ++f) {
      const int *fv = (dim == 2) ? FACES_2D[f] : FACES_3D[f];
      int64_t vs[4] = {0, 0, 0, 0};
      for (int i = 0; i < fvn; ++i) vs[i] = v[fv[i]];
      out[c * nf + f] = counts[face_key(vs, fvn)];
    }
  }
}

}  // extern "C"
