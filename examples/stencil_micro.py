"""Microbenchmark: stencil matvec layouts vs the element matvec at the
fluid_cylinder refine=4 velocity-block size (Q2, d=2, 23552 cells).

Run on the real TPU:  python examples/stencil_micro.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from openifem_tpu.la.operators import element_matvec_nodeblock
from openifem_tpu.la.stencil import PatchGrid, StencilOperator
from openifem_tpu.fe.space import FESpace
from openifem_tpu.mesh import generators


def timeit(f, *a):
    f(*a)[0].block_until_ready() if isinstance(f(*a), tuple) else \
        jax.block_until_ready(f(*a))
    n = 20
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1e3


def main():
    mesh = generators.flow_around_cylinder(2)
    for _ in range(4):
        mesh = mesh.refine_global(1)
    sp = FESpace(mesh, degree=2)
    d = 2
    grid = PatchGrid.build(mesh)
    st = StencilOperator(grid, sp, d=d)
    n_c = mesh.n_cells
    nl = sp.cell_dofs.shape[1]
    print(f"cells={n_c} nodes={sp.n_nodes} n_p={st.n_p} G={st.G}")

    rng = np.random.default_rng(0)
    Ab = jnp.asarray(rng.standard_normal((n_c, nl, d, nl, d)),
                     dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(sp.n_nodes * d), jnp.float32)

    cell_nodes = jnp.asarray(sp.cell_dofs, jnp.int32)

    # -- element matvec baseline
    em = jax.jit(lambda v: element_matvec_nodeblock(
        Ab, cell_nodes, sp.n_nodes, v))
    print("element matvec      %7.3f ms" % timeit(em, x))

    # -- current stencil matvec
    W = jax.jit(st.build_weights)(Ab)
    xs = st.spread(x)
    mv = jax.jit(lambda v: st.matvec(W, v))
    print("stencil current     %7.3f ms" % timeit(mv, xs))

    # -- combine alone
    cb = jax.jit(st.combine)
    print("combine alone       %7.3f ms" % timeit(cb, xs))

    # -- d-first padded-flat accumulation layout
    k, G, n_p, S = st.k, st.G, st.n_p, 2 * st.k + 1
    Gp = G + 2 * k
    M = Gp * Gp
    F = k * Gp + k            # front/back guard so slice s starts at
    P = M + 2 * F             # oi*Gp + oj and reads (i+oi-k, j+oj-k)

    # W in (S*S, d, d, n_p, M) layout, zero at pad positions
    W5 = np.zeros((S * S, d, d, n_p, M), dtype=np.float32)
    Wh = np.asarray(W)          # (n_p, G, G, S, S, d, d)
    for oi in range(S):
        for oj in range(S):
            blk = Wh[:, :, :, oi, oj]          # (n_p, G, G, d, d)
            tgt = np.zeros((n_p, Gp, Gp, d, d), np.float32)
            tgt[:, k:k + G, k:k + G] = blk
            W5[oi * S + oj] = tgt.reshape(n_p, M, d, d).transpose(
                2, 3, 0, 1)
    W5 = jnp.asarray(W5)

    def to_pad(v):               # (n_slots,) -> (d, n_p, P)
        X = v.reshape(n_p, G, G, d).transpose(3, 0, 1, 2)
        Xp = jnp.pad(X, ((0, 0), (0, 0), (k, k), (k, k)))
        return jnp.pad(Xp.reshape(d, n_p, M), ((0, 0), (0, 0), (F, F)))

    offs = [(oi * Gp + oj) for oi in range(S) for oj in range(S)]

    def mv_pad(xb):              # (d, n_p, P) -> (d, n_p, M)
        y = jnp.zeros((d, n_p, M), jnp.float32)
        for s, off in enumerate(offs):
            win = jax.lax.dynamic_slice_in_dim(xb, off, M, axis=2)
            y = y + jnp.einsum("abpm,bpm->apm", W5[s], win,
                               preferred_element_type=jnp.float32)
        return y

    xb = jax.jit(to_pad)(xs)
    mvp = jax.jit(mv_pad)
    print("stencil d-first pad %7.3f ms" % timeit(mvp, xb))

    # -- with layout conversions + combine (full apply cost)
    def full(v):
        y = mv_pad(to_pad(v))
        Y = y.reshape(d, n_p, Gp, Gp)[:, :, k:k + G, k:k + G]
        return st.combine(Y.transpose(1, 2, 3, 0).reshape(-1))
    fl = jax.jit(full)
    print("d-first full apply  %7.3f ms" % timeit(fl, xs))

    # -- gather-only combine in the padded layout (no scatter): fixed-
    # width duplicate table + seg-of-slot select write-back
    node_grid = np.asarray(st.node_grid)            # (n_p, G, G)
    Np = n_p * M
    pm = (np.arange(G)[:, None] + k) * Gp + (np.arange(G)[None, :] + k)
    slot_of = (np.arange(n_p)[:, None, None] * M + pm[None]).reshape(-1)
    flat_nodes = node_grid.reshape(-1)
    counts = np.bincount(flat_nodes, minlength=sp.n_nodes)
    dup_nodes = np.where(counts > 1)[0]
    n_sh = dup_nodes.size
    maxc = counts.max()
    tab = np.zeros((n_sh, maxc), np.int64)   # padded-slot indices; 0 is
    fill = np.zeros(n_sh, np.int64)          # a guaranteed-zero pad slot
    node_to_seg = np.full(sp.n_nodes, -1, np.int64)
    node_to_seg[dup_nodes] = np.arange(n_sh)
    for s_i, nd in zip(slot_of, flat_nodes):
        g = node_to_seg[nd]
        if g >= 0:
            tab[g, fill[g]] = s_i
            fill[g] += 1
    seg_of = np.zeros(Np, np.int64)
    is_dup = np.zeros(Np, bool)
    m_dup = node_to_seg[flat_nodes] >= 0
    seg_of[slot_of[m_dup]] = node_to_seg[flat_nodes[m_dup]]
    is_dup[slot_of[m_dup]] = True
    tab_j = jnp.asarray(tab, jnp.int32)
    seg_j = jnp.asarray(seg_of, jnp.int32)
    dup_j = jnp.asarray(is_dup)

    def combine_g(Y):            # (d, n_p, M)
        Y2 = Y.reshape(d, Np)
        tot = Y2[:, tab_j].sum(axis=2)       # (d, n_sh)
        out = jnp.where(dup_j[None, :], tot[:, seg_j], Y2)
        return out.reshape(d, n_p, M)

    def full_g(v):
        y = combine_g(mv_pad(to_pad(v)))
        Y = y.reshape(d, n_p, Gp, Gp)[:, :, k:k + G, k:k + G]
        return Y.transpose(1, 2, 3, 0).reshape(-1)
    flg = jax.jit(full_g)
    print("d-first gather-comb %7.3f ms" % timeit(flg, xs))

    # equality check
    ref = np.asarray(mv(xs))
    got = np.asarray(fl(xs))
    got2 = np.asarray(flg(xs))
    print("max |diff| =", np.abs(ref - got).max(),
          " scale", np.abs(ref).max())
    print("max |diff gather| =", np.abs(ref - got2).max())


if __name__ == "__main__":
    main()
