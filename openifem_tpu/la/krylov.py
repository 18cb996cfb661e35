"""Jit-friendly Krylov solvers: preconditioned CG and flexible GMRES.

Replaces PETSc KSP / deal.II SolverCG/SolverFGMRES (e.g. reference:
source/insim.cpp:337-367, source/solid_solver.cpp:125-142).  Everything runs
as lax.while_loop on-device with static buffer sizes; convergence tests use
absolute tolerances supplied by the caller (as the reference does:
tol = c * ||rhs||).

FGMRES uses CGS2 orthogonalization (two classical Gram-Schmidt passes) so the
inner products are batched matmuls — MXU-friendly, unlike modified GS.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class SolveResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    residual: jnp.ndarray


def cg(op: Callable, b, x0=None, M: Optional[Callable] = None,
       atol=1e-10, maxiter: int = 1000, weight=None) -> SolveResult:
    """Preconditioned conjugate gradients; stops when ||r|| <= atol.

    weight: optional nonnegative vector defining a weighted inner product
    <a, b> = sum(w * a * b).  Used by the structured-patch stencil layout
    (la/stencil.py), where shared nodes are stored once per incident
    patch: ownership weights (1 owned / 0 duplicate) make the duplicated
    solve exactly equivalent to the flat one."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M is None:
        M = lambda v: v
    if weight is None:
        dot = jnp.vdot
    else:
        dot = lambda a, c: jnp.vdot(a, weight.astype(c.dtype) * c)
    atol = jnp.asarray(atol, dtype=b.dtype)

    r0 = b - op(x0)
    z0 = M(r0)
    p0 = z0
    rz0 = dot(r0, z0)

    def cond(state):
        x, r, z, p, rz, k = state
        return (jnp.sqrt(dot(r, r)) > atol) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = op(p)
        pAp = dot(p, Ap)
        alpha = jnp.where(pAp != 0, rz / pAp, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = dot(r, z)
        beta = jnp.where(rz != 0, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, z, p, rz, k = lax.while_loop(cond, body, (x0, r0, z0, p0, rz0, 0))
    return SolveResult(x=x, iters=k, residual=jnp.sqrt(dot(r, r)))


def _fgmres_cycle(op, M, x0, b, atol, restart: int, weight=None):
    """One FGMRES(restart) cycle. Returns (x, converged, iters, resnorm).

    weight: optional weighted-inner-product vector (see cg); the CGS2
    projections become V @ (w * v) and norms sqrt(<v, w v>) — Arnoldi in
    the weighted inner product, identical to flat FGMRES when the weights
    are the patch-ownership mask of a duplicated layout.

    b may have ANY shape (not just 1-D): the basis stores b.shape slabs
    and the CGS2 projections contract over all of b's axes.  This lets a
    sharded layout (e.g. the plane-sharded stencil solve in
    parallel/shard.py) keep its natural (d, planes, R) tensor shape —
    and its GSPMD sharding — through the whole solve."""
    nd = b.ndim
    dtype = b.dtype

    def contract(V, v):
        # (restart+1, *b.shape) x (*b.shape) -> (restart+1,)
        return jnp.tensordot(V, v, axes=nd)

    if weight is None:
        wnorm = jnp.linalg.norm
        wdot_mat = contract
    else:
        w = weight
        wnorm = lambda v: jnp.sqrt(jnp.vdot(v, w.astype(v.dtype) * v))
        wdot_mat = lambda V, v: contract(V, w.astype(v.dtype) * v)
    r0 = b - op(x0)
    beta = wnorm(r0)

    V = jnp.zeros((restart + 1,) + b.shape, dtype=dtype)
    Z = jnp.zeros((restart,) + b.shape, dtype=dtype)
    H = jnp.zeros((restart + 1, restart), dtype=dtype)
    cs = jnp.zeros(restart, dtype=dtype)
    sn = jnp.zeros(restart, dtype=dtype)
    g = jnp.zeros(restart + 1, dtype=dtype)

    safe_beta = jnp.where(beta > 0, beta, 1.0)
    V = V.at[0].set(r0 / safe_beta)
    g = g.at[0].set(beta)

    def cond(state):
        V, Z, H, cs, sn, g, k, res = state
        return (res > atol) & (k < restart)

    def body(state):
        V, Z, H, cs, sn, g, k, res = state
        v = V[k]
        z = M(v)
        w = op(z)
        Z = Z.at[k].set(z)
        # CGS2: two classical Gram-Schmidt passes (batched dot products)
        mask = (jnp.arange(restart + 1) <= k).astype(dtype)
        h1 = wdot_mat(V, w) * mask
        w = w - jnp.tensordot(h1, V, axes=[[0], [0]])
        h2 = wdot_mat(V, w) * mask
        w = w - jnp.tensordot(h2, V, axes=[[0], [0]])
        h = h1 + h2
        wn = wnorm(w)
        H = H.at[:, k].set(h)
        H = H.at[k + 1, k].set(wn)
        V = V.at[k + 1].set(jnp.where(wn > 0, w / jnp.where(wn > 0, wn, 1.0),
                                      0.0))
        # apply previous Givens rotations to the new column
        def apply_rot(i, Hcol):
            hi = cs[i] * Hcol[i] + sn[i] * Hcol[i + 1]
            hi1 = -sn[i] * Hcol[i] + cs[i] * Hcol[i + 1]
            return Hcol.at[i].set(hi).at[i + 1].set(hi1)
        Hcol = H[:, k]
        Hcol = lax.fori_loop(0, k, lambda i, col: jnp.where(
            i < k, apply_rot(i, col), col), Hcol)
        # new rotation
        denom = jnp.sqrt(Hcol[k] ** 2 + Hcol[k + 1] ** 2)
        denom_safe = jnp.where(denom > 0, denom, 1.0)
        c_new = jnp.where(denom > 0, Hcol[k] / denom_safe, 1.0)
        s_new = jnp.where(denom > 0, Hcol[k + 1] / denom_safe, 0.0)
        Hcol = Hcol.at[k].set(c_new * Hcol[k] + s_new * Hcol[k + 1])
        Hcol = Hcol.at[k + 1].set(0.0)
        H = H.at[:, k].set(Hcol)
        cs = cs.at[k].set(c_new)
        sn = sn.at[k].set(s_new)
        gk1 = -s_new * g[k]
        g = g.at[k + 1].set(gk1).at[k].set(c_new * g[k])
        return (V, Z, H, cs, sn, g, k + 1, jnp.abs(gk1))

    init = (V, Z, H, cs, sn, g, 0, beta)
    V, Z, H, cs, sn, g, k, res = lax.while_loop(cond, body, init)

    # solve the (k x k) triangular system with masking
    idx = jnp.arange(restart)
    active = idx < k
    Hs = H[:restart, :restart]
    Hs = jnp.where(active[None, :] & active[:, None], Hs, 0.0)
    Hs = Hs + jnp.diag(jnp.where(active, 0.0, 1.0))
    y = jax.scipy.linalg.solve_triangular(Hs, jnp.where(active, g[:restart],
                                                        0.0), lower=False)
    y = jnp.where(active, y, 0.0)
    x = x0 + jnp.tensordot(y, Z, axes=[[0], [0]])
    return x, res, k


def fgmres(op: Callable, b, x0=None, M: Optional[Callable] = None,
           atol=1e-10, restart: int = 50, max_restarts: int = 4,
           weight=None) -> SolveResult:
    """Flexible right-preconditioned GMRES with restarts."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M is None:
        M = lambda v: v
    atol = jnp.asarray(atol, dtype=b.dtype)

    def cond(state):
        x, res, total_k, cyc = state
        return (res > atol) & (cyc < max_restarts)

    def body(state):
        x, res, total_k, cyc = state
        x, res, k = _fgmres_cycle(op, M, x, b, atol, restart, weight)
        return (x, res, total_k + k, cyc + 1)

    if weight is None:
        r0 = jnp.linalg.norm(b - op(x0))
    else:
        rr = b - op(x0)
        r0 = jnp.sqrt(jnp.vdot(rr, weight.astype(rr.dtype) * rr))
    x, res, total_k, cyc = lax.while_loop(
        cond, body, (x0, r0, jnp.zeros((), dtype=jnp.int32), 0))
    return SolveResult(x=x, iters=total_k, residual=res)
