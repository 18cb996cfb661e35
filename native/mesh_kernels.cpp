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

// Q_k (any k >= 1) continuous dof numbering: fills cell_dofs
// (n_c, (k+1)^dim) with lexicographic (x-fastest) local ordering; returns
// the total node count.  Node ids: [vertices][edge nodes][face nodes
// (3D)][cell nodes].  For k > 2 shared-entity interior nodes are ordered
// in a CANONICAL frame derived from global vertex ids (edge: min->max id;
// face: origin = min-id corner, s-axis toward its smaller-id neighbor), so
// adjacent cells with different local orientations agree (the deal.II
// equivalent is FE_Q's edge/face orientation flags).
int64_t build_cell_dofs(const int64_t *cells, int64_t n_c, int dim,
                        int degree, int64_t n_vertices, int64_t *cell_dofs) {
  const int nv = 1 << dim;
  const int k = degree;
  const int n1 = degree + 1;
  const int nl = (dim == 2) ? n1 * n1 : n1 * n1 * n1;
  const int per_edge = k - 1;
  const int per_face = per_edge * per_edge;

  if (degree == 1) {
    // vertex nodes only; local lexicographic == z-order bit pattern
    for (int64_t c = 0; c < n_c; ++c)
      for (int l = 0; l < nv; ++l) cell_dofs[c * nl + l] = cells[c * nv + l];
    return n_vertices;
  }

  std::unordered_map<uint64_t, int64_t> edge_ids;   // key -> base id
  std::unordered_map<Key4, int64_t, Key4Hash> face_ids;
  edge_ids.reserve(static_cast<size_t>(n_c) * (dim == 2 ? 4 : 12));
  int64_t next = n_vertices;

  const int n_edges = (dim == 2) ? 4 : 12;
  for (int64_t c = 0; c < n_c; ++c) {
    const int64_t *v = cells + c * nv;
    for (int e = 0; e < n_edges; ++e) {
      const int *ev = (dim == 2) ? EDGES_2D[e] : EDGES_3D[e];
      uint64_t key = edge_key(v[ev[0]], v[ev[1]]);
      if (edge_ids.emplace(key, next).second) next += per_edge;
    }
  }
  if (dim == 3) {
    face_ids.reserve(static_cast<size_t>(n_c) * 6);
    for (int64_t c = 0; c < n_c; ++c) {
      const int64_t *v = cells + c * nv;
      for (int f = 0; f < 6; ++f) {
        int64_t vs[4] = {v[FACES_3D[f][0]], v[FACES_3D[f][1]],
                         v[FACES_3D[f][2]], v[FACES_3D[f][3]]};
        if (face_ids.emplace(face_key(vs, 4), next).second) next += per_face;
      }
    }
  }
  const int per_cell = (dim == 2) ? per_face : per_face * per_edge;
  int64_t interior_start = next;
  next += n_c * per_cell;

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
        if (idx[d] > 0 && idx[d] < k) int_axes[n_int++] = d;
      auto vbit = [&](const int *ii) {
        int b = 0;
        for (int d = 0; d < dim; ++d)
          if (ii[d] == k) b |= (1 << d);
        return v[b];
      };
      if (n_int == 0) {
        cell_dofs[c * nl + l] = vbit(idx);
      } else if (n_int == 1) {
        int d = int_axes[0];
        int lo[3] = {idx[0], idx[1], idx[2]};
        int hi[3] = {idx[0], idx[1], idx[2]};
        lo[d] = 0;
        hi[d] = k;
        int64_t a = vbit(lo), b = vbit(hi);
        // canonical position along the min->max id direction
        int pos = (a < b) ? idx[d] : k - idx[d];
        cell_dofs[c * nl + l] = edge_ids[edge_key(a, b)] + (pos - 1);
      } else if (n_int == 2 && dim == 3) {
        int d1 = int_axes[0], d2 = int_axes[1];  // d1 < d2
        int d_fix = 3 - d1 - d2;
        int f = 2 * d_fix + (idx[d_fix] == k ? 1 : 0);
        int64_t vs[4] = {v[FACES_3D[f][0]], v[FACES_3D[f][1]],
                         v[FACES_3D[f][2]], v[FACES_3D[f][3]]};
        // face quad corners in local (u = axis d1, w = axis d2) coords:
        // c00=(0,0) c10=(k,0) c01=(0,k) c11=(k,k)
        int base[3] = {idx[0], idx[1], idx[2]};
        int64_t cid[4];
        int cu[4] = {0, k, 0, k}, cw[4] = {0, 0, k, k};
        for (int q = 0; q < 4; ++q) {
          int ii[3] = {base[0], base[1], base[2]};
          ii[d1] = cu[q];
          ii[d2] = cw[q];
          cid[q] = vbit(ii);
        }
        // canonical frame: origin = min-id corner; s-axis toward the
        // smaller-id quad neighbor, t-axis toward the other
        const int nbr[4][2] = {{1, 2}, {0, 3}, {3, 0}, {2, 1}};
        int o = 0;
        for (int q = 1; q < 4; ++q)
          if (cid[q] < cid[o]) o = q;
        int sn = nbr[o][0], tn = nbr[o][1];
        if (cid[sn] > cid[tn]) { int t = sn; sn = tn; tn = t; }
        // lattice point in (u, w): p = (idx[d1], idx[d2])
        int pu = idx[d1], pw = idx[d2];
        int s = ((pu - cu[o]) * (cu[sn] - cu[o]) +
                 (pw - cw[o]) * (cw[sn] - cw[o])) / k;
        int t = ((pu - cu[o]) * (cu[tn] - cu[o]) +
                 (pw - cw[o]) * (cw[tn] - cw[o])) / k;
        cell_dofs[c * nl + l] = face_ids[face_key(vs, 4)] +
                                (s - 1) + per_edge * (t - 1);
      } else {
        int64_t off = 0, stride = 1;
        for (int q = 0; q < n_int; ++q) {
          off += stride * (idx[int_axes[q]] - 1);
          stride *= per_edge;
        }
        cell_dofs[c * nl + l] = interior_start + c * per_cell + off;
      }
    }
  }
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
