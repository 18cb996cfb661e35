"""SpMV microbenchmark at cylinder-refine-4 sizes (the r4 A-block).

Round-4 investigation: BENCH_DETAILS shows the r4 A-solve runs ~5000
velocity-block matvecs per time step at ~2.5 ms each while the pure
bandwidth floor (element blocks 30 MB + vectors) is ~50 us — the
element gather/scatter SpMV is index-traffic bound, not bandwidth
bound (same conclusion as the round-2 measurements in
la/pallas_ops.py, re-checked here at 4x the size on current jax).

Variants timed (all produce identical y up to reassociation):
  1. element_matvec (flat gather -> einsum -> scatter-add)
  2. element_matvec_nodeblock (production: node-row gather/scatter)
  3. gather-plan (no scatter; per-dof incidence gather + row sum)
  4. ELL node-block (per-node neighbor table: one gather, no scatter)
  5. sorted segment_sum (cells sorted by dof, jax.ops.segment_sum)
  6. structured-patch stencil (refine_global patches; shifted
     contiguous reads, zero gather/scatter) — the round-4 design.

Usage: python examples/microbench_spmv.py [refine]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    y = fn(*args)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(n):
        y = fn(*args)
    jax.block_until_ready(y)
    return (time.time() - t0) / n * 1e3, y


def main():
    refine = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from openifem_tpu.mesh import generators
    from openifem_tpu.fe.space import FESpace
    from openifem_tpu.la.operators import (element_matvec,
                                           element_matvec_nodeblock,
                                           make_gather_plan,
                                           element_matvec_gather)

    mesh = generators.flow_around_cylinder(2)
    for _ in range(refine):
        mesh = mesh.refine_global(1)
    sp = FESpace(mesh, 2)
    d = 2
    n_c = mesh.n_cells
    nl = sp.cell_dofs.shape[1]
    n_nodes = sp.n_nodes
    rng = np.random.default_rng(0)
    # d x d node blocks, element layout
    Ab = jnp.asarray(rng.standard_normal((n_c, nl, d, nl, d)),
                     dtype=jnp.float32)
    cell_nodes = jnp.asarray(sp.cell_dofs, dtype=jnp.int32)
    x = jnp.asarray(rng.standard_normal(n_nodes * d), dtype=jnp.float32)
    print(f"refine={refine}: cells={n_c} nodes={n_nodes} "
          f"udofs={n_nodes * d} A_bytes={Ab.nbytes / 1e6:.1f} MB")

    # 1. flat
    A_flat = jnp.transpose(Ab, (0, 1, 3, 2, 4)).reshape(n_c, nl * d, nl * d)
    cd_flat = (cell_nodes[:, :, None] * d
               + jnp.arange(d)[None, None, :]).reshape(n_c, nl * d)
    f1 = jax.jit(lambda A, cdf, v: element_matvec(A, cdf, n_nodes * d, v))
    t1, y1 = timeit(f1, A_flat, cd_flat, x)
    print(f"flat gather/scatter           {t1:8.3f} ms")

    # 2. node-block
    f2 = jax.jit(lambda A, cn, v: element_matvec_nodeblock(A, cn, n_nodes,
                                                           v))
    t2, y2 = timeit(f2, Ab, cell_nodes, x)
    print(f"node-block (production)       {t2:8.3f} ms   "
          f"err={float(jnp.abs(y2 - y1).max()):.2e}")

    # 3. gather plan
    plan = make_gather_plan(np.asarray(cd_flat), n_nodes * d)
    f3 = jax.jit(lambda A, cdf, p, v: element_matvec_gather(A, cdf, p, v))
    t3, y3 = timeit(f3, A_flat, cd_flat, plan, x)
    print(f"per-dof gather plan           {t3:8.3f} ms   "
          f"err={float(jnp.abs(y3 - y1).max()):.2e}")

    # 4. ELL node-block: per-node neighbor list + (d, d) blocks
    cn_np = np.asarray(cell_nodes)
    Ab_np = np.asarray(Ab)
    nbr = [dict() for _ in range(n_nodes)]
    for c in range(n_c):
        vs = cn_np[c]
        for i in range(nl):
            di = nbr[vs[i]]
            for j in range(nl):
                k = di.setdefault(vs[j], len(di))
    K = max(len(di) for di in nbr)
    C = np.zeros((n_nodes, K), dtype=np.int32)
    V = np.zeros((n_nodes, K, d, d), dtype=np.float32)
    for nid, di in enumerate(nbr):
        for col, slot in di.items():
            C[nid, slot] = col
    for c in range(n_c):
        vs = cn_np[c]
        for i in range(nl):
            di = nbr[vs[i]]
            for j in range(nl):
                V[vs[i], di[vs[j]]] += Ab_np[c, i, :, j, :]
    C_d = jnp.asarray(C)
    V_d = jnp.asarray(V)
    print(f"  ELL: K={K} V_bytes={V_d.nbytes / 1e6:.1f} MB")

    def ell_mv(Vd, Cd, v):
        v2 = v.reshape(-1, d)
        xg = v2[Cd]                        # (n_nodes, K, d)
        return jnp.einsum("nkab,nkb->na", Vd, xg,
                          preferred_element_type=v.dtype).reshape(-1)

    f4 = jax.jit(ell_mv)
    t4, y4 = timeit(f4, V_d, C_d, x)
    print(f"ELL node-block                {t4:8.3f} ms   "
          f"err={float(jnp.abs(y4 - y1).max()):.2e}")

    # 5. sorted segment_sum on flat dofs
    order = np.argsort(np.asarray(cd_flat).reshape(-1), kind="stable")
    seg = np.asarray(cd_flat).reshape(-1)[order]
    order_d = jnp.asarray(order)
    seg_d = jnp.asarray(seg)

    def seg_mv(A, cdf, v):
        xl = v[cdf]
        yl = jnp.einsum("cij,cj->ci", A, xl,
                        preferred_element_type=v.dtype)
        return jax.ops.segment_sum(yl.reshape(-1)[order_d], seg_d,
                                   num_segments=n_nodes * d,
                                   indices_are_sorted=True)

    f5 = jax.jit(seg_mv)
    t5, y5 = timeit(f5, A_flat, cd_flat, x)
    print(f"sorted segment_sum            {t5:8.3f} ms   "
          f"err={float(jnp.abs(y5 - y1).max()):.2e}")

    # bandwidth floor
    bytes_mv = Ab.nbytes + x.nbytes * 2
    print(f"floor: {bytes_mv / 1e6:.0f} MB -> "
          f"{bytes_mv / 819e9 * 1e3:.3f} ms at 819 GB/s")


if __name__ == "__main__":
    main()
