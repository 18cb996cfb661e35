"""Stencil matvec variants at the fsi_leaflet_r2 patch shape
(n_p=1600 small patches, G=9, M=169) — the many-small-patches regime,
opposite of the cylinder's 92 big patches.

Run on the real TPU: python examples/stencil_micro2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from openifem_tpu.fe.space import FESpace
from openifem_tpu.la.stencil import PatchGrid, StencilOperator
from openifem_tpu.mesh import generators


def t(f, *a, n=20):
    jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / n * 1e3


def main():
    mesh = generators.subdivided_hyper_rectangle(
        [80, 20], [0.0, 0.0], [4.0, 1.0])
    for _ in range(2):
        mesh = mesh.refine_global(1)
    sp = FESpace(mesh, 2)
    d = 2
    grid = PatchGrid.build(mesh)
    st = StencilOperator(grid, sp, d=d)
    S = 2 * st.k + 1
    print(f"n_p={st.n_p} Gi={st.Gi} Gj={st.Gj} M={st.M} "
          f"slots={st.n_slots} shared={st.n_shared}")
    rng = np.random.default_rng(0)
    nl = sp.cell_dofs.shape[1]
    Ab = jnp.asarray(rng.standard_normal(
        (mesh.n_cells, nl, d, nl, d)), jnp.float32)
    W = jax.jit(st.build_weights)(Ab)
    x = st.spread(jnp.asarray(rng.standard_normal(sp.n_nodes * d),
                              jnp.float32))

    mv = jax.jit(lambda v: st.matvec(W, v))
    print("A current 25-slice   %7.3f ms" % t(mv, x))

    cb = jax.jit(st.combine)
    print("   combine alone     %7.3f ms" % t(cb, x))

    n_p, M, Gp, k, F = st.n_p, st.M, st.Gpj, st.k, st.F

    # B: stack windows once, one einsum over (offset, b)
    def mv_stack(v):
        X = v.reshape(d, n_p, M)
        Xg = jnp.pad(X, ((0, 0), (0, 0), (F, F)))
        win = jnp.stack([jax.lax.dynamic_slice_in_dim(
            Xg, si * Gp + sj, M, axis=2)
            for si in range(S) for sj in range(S)], axis=0)
        y = jnp.einsum("oabpm,obpm->apm", W.reshape(S * S, d, d, n_p, M),
                       win, preferred_element_type=v.dtype)
        return st.combine(y.reshape(-1))
    mvb = jax.jit(mv_stack)
    print("B stacked einsum     %7.3f ms" % t(mvb, x))

    # C: bf16 W, 25-slice accumulation (f32 accumulate)
    Wb = W.astype(jnp.bfloat16)

    def mv_bf16(v):
        X = v.reshape(d, n_p, M)
        Xg = jnp.pad(X, ((0, 0), (0, 0), (F, F))).astype(jnp.bfloat16)
        y = jnp.zeros((d, n_p, M), jnp.float32)
        for si in range(S):
            for sj in range(S):
                win = jax.lax.dynamic_slice_in_dim(
                    Xg, si * Gp + sj, M, axis=2)
                y = y + jnp.einsum("abpm,bpm->apm", Wb[si * S + sj], win,
                                   preferred_element_type=jnp.float32)
        return st.combine(y.reshape(-1))
    mvc = jax.jit(mv_bf16)
    print("C bf16 W 25-slice    %7.3f ms" % t(mvc, x))

    # D: lane-packed: fold patches onto lanes — layout (d, M, n_p):
    # lanes = n_p (1600, full tiles), windows become gathers along M?
    # no — transpose W/x to put n_p last; shifts stay on the M axis
    # (now sublanes).  Contiguity preserved: slice along axis 1.
    W_t = jnp.transpose(W.reshape(S * S, d, d, n_p, M), (0, 1, 2, 4, 3))

    def to_t(v):
        return jnp.transpose(v.reshape(d, n_p, M), (0, 2, 1))

    def mv_T(vt):                 # (d, M, n_p)
        Xg = jnp.pad(vt, ((0, 0), (F, F), (0, 0)))
        y = jnp.zeros((d, M, n_p), jnp.float32)
        for si in range(S):
            for sj in range(S):
                win = jax.lax.dynamic_slice_in_dim(
                    Xg, si * Gp + sj, M, axis=1)
                y = y + jnp.einsum("abmp,bmp->amp", W_t[si * S + sj], win,
                                   preferred_element_type=jnp.float32)
        return y
    xt = jax.jit(to_t)(x)
    mvd = jax.jit(mv_T)
    print("D patch-lanes (raw)  %7.3f ms  (no combine)" % t(mvd, xt))

    # equality
    ra = np.asarray(mv(x))
    rb = np.asarray(mvb(x))
    rc = np.asarray(mvc(x))
    print("B max|diff| %.2e   C(bf16) rel %.2e"
          % (np.abs(rb - ra).max(),
             np.abs(rc - ra).max() / np.abs(ra).max()))


if __name__ == "__main__":
    main()
