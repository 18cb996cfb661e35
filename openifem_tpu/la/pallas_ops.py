"""Pallas prototype for the hot element-block matvec.

The dominant op in every Krylov iteration is the element-block matvec
  y[dofs] += A_loc[c] @ x[dofs[c]]
(gather -> batched small matmul -> scatter-add; la/operators.py).  This
module carries a fused single-kernel version: the dof vector stays
resident in VMEM across the cell-block grid, each grid step gathers its
block's local vectors, runs one batched MXU contraction, and accumulates
the scattered result (the TPU grid is sequential per core, so the
accumulation is race-free).

STATUS (re-checked on jax 0.9 Mosaic + TPU v5e, 2026-08, round 2): the
kernel is correct (validated in interpret mode and used by tests) but
still does NOT lower to real TPU — Mosaic raises "Only 2D gather is
supported" (`jax/_src/pallas/mosaic/lowering.py:_gather_lowering_rule`):
only take_along_axis-style batched lane/sublane lookups are expressible,
not an arbitrary dof gather (short of broadcasting the dof vector across
all 128 lanes, a ~38x compute waste at our sizes).

DECISION + measurements that justify the XLA path (v5e, Turek cylinder
refine=3: 5888 cells, Q2-vector blocks (5888, 18, 18), 48k dofs, f32):
  flat gather -> batched einsum -> scatter-add   1.60 ms
    (gather 0.85 ms / einsum 0.23 ms / scatter 1.13 ms — index traffic
     bound, not FLOPs)
  node-block layout (element_matvec_nodeblock)   0.72 ms   <- production
  per-dof incidence gather-plan (no scatter)     4.8 ms    (slower: the
     (n_dofs, K) random gather costs more than XLA's sorted scatter)
  sorted segment_sum                             2.5 ms
The production path (`la/operators.py`) therefore stays on XLA with the
node-block layout; this kernel documents the fused VMEM-resident design
and is ready to be enabled when Mosaic grows arbitrary-gather support
(the dof vector fits VMEM comfortably at these sizes, so a true fused
kernel would make the gather ~VMEM-latency bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 256  # cells per grid step


def _matvec_kernel(dofs_ref, A_ref, x_ref, y_ref):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        y_ref[:] = jnp.zeros_like(y_ref)

    dofs = dofs_ref[:]                        # (B, nl) int32
    A = A_ref[:]                              # (B, nl, nl)
    xl = x_ref[:][dofs]                       # gather from VMEM-resident x
    yl = jnp.einsum("bij,bj->bi", A, xl,
                    preferred_element_type=A.dtype)
    # sequential-grid accumulation: scatter-add into the full output block
    y_ref[:] = y_ref[:] + jnp.zeros_like(y_ref).at[dofs.reshape(-1)].add(
        yl.reshape(-1))


def pallas_element_matvec(A_loc, cell_dofs, n_dofs: int, x,
                          block: int = _BLOCK, interpret: bool = False):
    """Fused y = scatter_add(A_loc @ x[cell_dofs]) as one Pallas kernel."""
    import jax.experimental.pallas as pl

    n_c, nl, _ = A_loc.shape
    n_blocks = -(-n_c // block)
    pad = n_blocks * block - n_c
    if pad:
        A_loc = jnp.concatenate(
            [A_loc, jnp.zeros((pad, nl, nl), dtype=A_loc.dtype)])
        cell_dofs = jnp.concatenate(
            [cell_dofs, jnp.zeros((pad, nl), dtype=cell_dofs.dtype)])

    return pl.pallas_call(
        _matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((n_dofs,), x.dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, nl), lambda i: (i, 0)),
            pl.BlockSpec((block, nl, nl), lambda i: (i, 0, 0)),
            pl.BlockSpec((n_dofs,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((n_dofs,), lambda i: (0,)),
        interpret=interpret,
    )(cell_dofs, A_loc.astype(x.dtype), x)


def element_matvec_fn(A_loc, cell_dofs, n_dofs: int, use_pallas: bool,
                      interpret: bool = False):
    """Returns matvec(x) -> y; Pallas-fused when use_pallas, else XLA."""
    from .operators import element_matvec

    if not use_pallas:
        return lambda x: element_matvec(A_loc, cell_dofs, n_dofs, x)
    return functools.partial(pallas_element_matvec, A_loc, cell_dofs,
                             n_dofs, interpret=interpret)


def _self_test():
    from .operators import element_matvec
    rng = np.random.default_rng(0)
    n_c, nl, n = 37, 12, 100
    A = jnp.asarray(rng.normal(size=(n_c, nl, nl)))
    dofs = jnp.asarray(rng.integers(0, n, size=(n_c, nl)), dtype=jnp.int32)
    x = jnp.asarray(rng.normal(size=n))
    ref = element_matvec(A, dofs, n, x)
    out = pallas_element_matvec(A, dofs, n, x, block=16, interpret=True)
    err = float(jnp.abs(out - ref).max())
    assert err < 1e-10, err
    return err


if __name__ == "__main__":
    print("max err:", _self_test())
