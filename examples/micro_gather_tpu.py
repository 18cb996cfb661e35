"""Micro-benchmark of gather/scatter variants for the element matvec on
the real TPU.  Finds the speed-of-light structure for the framework's
fundamental op (y = A_loc x via dof maps).

All timings amortize the axon dispatch latency with lax.fori_loop(N)
inside one jit.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u examples/micro_gather_tpu.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeloop(label, fn, x, n=100):
    looped = jax.jit(lambda v: lax.fori_loop(0, n, lambda i, a: fn(a), v))
    jax.block_until_ready(looped(x))
    t0 = time.time()
    out = looped(x)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:52s} {dt:10.4f} ms/op", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    n_c, nl, n = 6800, 8, 8325        # wall3d pressure-block shape
    A = jnp.asarray(rng.standard_normal((n_c, nl, nl)), dtype=jnp.float32)
    cd_np = rng.integers(0, n, size=(n_c, nl))
    cd = jnp.asarray(cd_np, dtype=jnp.int32)
    x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)

    # 0. einsum only (no gather/scatter): the compute floor
    xl0 = x[cd]

    def einsum_only(x):
        # use a data-dependent xl so the loop doesn't fold away
        xl = jnp.broadcast_to(x[:1], (n_c, nl)) + xl0 * x[0]
        yl = jnp.einsum("cij,cj->ci", A, xl,
                        preferred_element_type=jnp.float32)
        return x.at[:1].set(yl[0, 0])

    timeloop("einsum only (floor)", einsum_only, x)

    # 1. gather only
    def gather_only(x):
        xl = x[cd]
        return x.at[:1].set(xl.sum())

    timeloop("gather x[cd] (n_c, nl) scalars", gather_only, x)

    # 1b. gather via take sorted indices
    order = np.argsort(cd_np.reshape(-1), kind="stable")
    cd_sorted = jnp.asarray(cd_np.reshape(-1)[order], dtype=jnp.int32)

    def gather_sorted(x):
        xl = jnp.take(x, cd_sorted, indices_are_sorted=True)
        return x.at[:1].set(xl.sum())

    timeloop("gather sorted (indices_are_sorted)", gather_sorted, x)

    # 2. scatter-add only
    yl_const = jnp.asarray(rng.standard_normal((n_c, nl)),
                           dtype=jnp.float32)

    def scatter_only(x):
        yl = yl_const * x[0]
        y = jnp.zeros(n, dtype=jnp.float32).at[cd.reshape(-1)].add(
            yl.reshape(-1))
        return y

    timeloop("scatter-add .at[].add", scatter_only, x)

    # 2b. scatter with sorted indices + segment_sum
    seg_ids = jnp.asarray(cd_np.reshape(-1)[order], dtype=jnp.int32)
    order_j = jnp.asarray(order, dtype=jnp.int32)

    def scatter_sorted(x):
        yl = (yl_const * x[0]).reshape(-1)[order_j]
        return jax.ops.segment_sum(yl, seg_ids, num_segments=n,
                                   indices_are_sorted=True)

    timeloop("permute + sorted segment_sum", scatter_sorted, x)

    # 2c. gather-plan transpose (element_matvec_gather style)
    from openifem_tpu.la.operators import make_gather_plan
    plan = make_gather_plan(cd_np, n)
    print(f"  plan K = {plan.shape[1]}")

    def scatter_via_plan(x):
        yl = (yl_const * x[0])
        ylp = jnp.concatenate([yl.reshape(-1),
                               jnp.zeros((1,), dtype=yl.dtype)])
        return ylp[plan].sum(axis=1)

    timeloop("scatter via gather-plan rows", scatter_via_plan, x)

    # 3. full matvec variants
    def mv_scatter(x):
        xl = x[cd]
        yl = jnp.einsum("cij,cj->ci", A, xl,
                        preferred_element_type=jnp.float32)
        return jnp.zeros(n, dtype=jnp.float32).at[cd.reshape(-1)].add(
            yl.reshape(-1))

    timeloop("matvec: gather+einsum+scatter (current)", mv_scatter, x)

    def mv_plan(x):
        xl = x[cd]
        yl = jnp.einsum("cij,cj->ci", A, xl,
                        preferred_element_type=jnp.float32)
        ylp = jnp.concatenate([yl.reshape(-1),
                               jnp.zeros((1,), dtype=yl.dtype)])
        return ylp[plan].sum(axis=1)

    timeloop("matvec: gather+einsum+plan-rows (exists)", mv_plan, x)

    # 4. wide gather: does row width change cost?  (n, 8) rows
    x8 = jnp.asarray(rng.standard_normal((n, 8)), dtype=jnp.float32)
    rows = jnp.asarray(cd_np[:, 0], dtype=jnp.int32)

    def gather_rows8(x8):
        xl = x8[rows]                     # (n_c, 8)
        return x8.at[:1, :].set(xl.sum(axis=0, keepdims=True))

    timeloop("gather (n_c,) rows of width 8", gather_rows8, x8)

    x128 = jnp.asarray(rng.standard_normal((n, 128)), dtype=jnp.float32)

    def gather_rows128(x128):
        xl = x128[rows]
        return x128.at[:1, :].set(xl.sum(axis=0, keepdims=True))

    timeloop("gather (n_c,) rows of width 128", gather_rows128, x128)

    # 5. int64 indices (x64 pitfall probe)
    cd64 = jnp.asarray(cd_np, dtype=jnp.int64)

    def gather_i64(x):
        xl = x[cd64]
        return x.at[:1].set(xl.sum())

    timeloop("gather with int64 indices", gather_i64, x)

    # 6. bigger problem: does cost scale with size or stay fixed?
    n_c2, n2 = 54400, 66600
    A2 = jnp.asarray(rng.standard_normal((n_c2, nl, nl)),
                     dtype=jnp.float32)
    cd2_np = rng.integers(0, n2, size=(n_c2, nl))
    cd2 = jnp.asarray(cd2_np, dtype=jnp.int32)
    x2 = jnp.asarray(rng.standard_normal(n2), dtype=jnp.float32)

    def mv2(x):
        xl = x[cd2]
        yl = jnp.einsum("cij,cj->ci", A2, xl,
                        preferred_element_type=jnp.float32)
        return jnp.zeros(n2, dtype=jnp.float32).at[cd2.reshape(-1)].add(
            yl.reshape(-1))

    timeloop("matvec at 8x size (54k cells)", mv2, x2, n=50)


if __name__ == "__main__":
    main()
