"""Multi-chip sharding: element-block domain decomposition over a device mesh.

The reference parallelizes by domain decomposition: p4est partitions fluid
cells across MPI ranks, assembly is rank-local, and PETSc reduces the halo
(SURVEY.md section 1).  The TPU-native equivalent here: the batched element
arrays (quadrature data, element matrices, cell->dof maps) are sharded along
the cell axis of a jax.sharding.Mesh, dof vectors stay replicated, and XLA's
SPMD partitioner turns the per-element einsums into purely local work plus
an all-reduce (psum) for the scatter-add — exactly the assemble+compress(add)
pattern of the reference (source/mpi_scnsim.cpp:553-567) with the collective
riding ICI.

Krylov solves then run replicated on the dof vectors with the matvec sharded
by cells; dot products need no extra collectives because the vectors are
replicated.  (Sharding the dof vectors themselves with halo exchange is the
next scaling step; element sharding already parallelizes the dominant
assembly + SpMV cost.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_cell_mesh(n_devices: Optional[int] = None, axis: str = "cells"
                   ) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_fluid_solver(solver, mesh: Mesh, axis: str = "cells"):
    """Shard a fluid solver's element-batch arrays over the device mesh.

    Subsequent jitted assembly/matvec calls are SPMD-partitioned by XLA:
    cell-indexed einsums run device-local; dof-vector scatter-adds become
    psum collectives."""
    cell_sharded = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def put_cells(x):
        return jax.device_put(x, cell_sharded)

    n_dev = int(np.prod(mesh.devices.shape))
    for name in ("gu", "JxW", "Nu_cellwise", "cell_dofs", "cell_dofs_u",
                 "cell_dofs_p", "Mp_loc", "A_loc", "Auu", "Aup", "Apu",
                 "gravity_q"):
        if hasattr(solver, name):
            arr = getattr(solver, name)
            # GSPMD needs the sharded axis to divide evenly; leave
            # non-divisible cell counts replicated (the padded dof-sharded
            # paths below pad their own copies)
            if arr is not None and getattr(arr, "ndim", 0) >= 1 and \
                    arr.shape[0] % n_dev == 0:
                setattr(solver, name, put_cells(arr))

    # dof vectors stay replicated: the element scatter-add then reduces to
    # one psum per matvec (halo-free domain decomposition).  Range-
    # partitioned dof vectors (memory scaling + reduce-scatter pattern)
    # require padded vector layouts and are the next scaling step.
    for name in ("present_solution", "solution_increment", "Mu_diag",
                 "Mp_diag"):
        if hasattr(solver, name):
            arr = getattr(solver, name)
            if arr is not None:
                setattr(solver, name, jax.device_put(arr, replicated))
    return solver


# ----------------------------------------------------------------------
# Dof-range sharding (padded layouts)
# ----------------------------------------------------------------------

def _pad_constraints(cons, n_pad: int):
    """Extend a Constraints object to n_pad dofs; the tail rows are
    Dirichlet-fixed at zero so they stay exact identity rows in the
    condensed Krylov system."""
    import jax.numpy as jnp
    from ..la.constraints import Constraints

    n = cons.n_dofs
    k = cons.hang_idx.shape[1]
    hang_idx = np.concatenate([
        np.asarray(cons.hang_idx),
        np.tile(np.arange(n, n_pad, dtype=np.int32)[:, None], (1, k))])
    hw_pad = np.zeros((n_pad - n, k))
    hw_pad[:, 0] = 1.0
    hang_w = np.concatenate([np.asarray(cons.hang_w), hw_pad])
    hanging = np.concatenate([np.asarray(cons.hanging),
                              np.zeros(n_pad - n, dtype=bool)])
    dmask = np.concatenate([np.asarray(cons.dirichlet),
                            np.ones(n_pad - n, dtype=bool)])
    dvals = np.concatenate([np.asarray(cons.dirichlet_values),
                            np.zeros(n_pad - n)])
    return Constraints(n_pad, hang_idx, hang_w, hanging, dmask, dvals)


def sharded_element_cg(A_loc, cell_dofs, cons, mesh: Mesh, axis="cells",
                       maxiter: int = None):
    """Fully sharded CG solve for an element-block operator.

    TPU-native equivalent of the reference's distributed PETSc CG
    (source/mpi_solid_solver.cpp:145-160): element blocks are sharded along
    the cell axis and the dof vectors are RANGE-sharded over the same device
    mesh using a padded layout (GSPMD requires the leading dimension to
    divide evenly).  XLA inserts the halo exchange (all-gather on the
    gathered dof vector), the reduce-scatter behind the scatter-add, and
    psum for the CG dot products — the assemble/compress(add) + VecDot
    pattern of the reference, riding ICI.

    Returns a jitted solve(b, atol) -> SolveResult on the ORIGINAL
    (unpadded) dof layout."""
    import jax.numpy as jnp
    from ..la.krylov import SolveResult, cg
    from ..la.operators import element_diag, element_matvec

    n_dev = int(np.prod(mesh.devices.shape))
    n = cons.n_dofs
    n_pad = -(-n // n_dev) * n_dev
    pcons = _pad_constraints(cons, n_pad)

    # pad the cell axis too: zero blocks whose dofs point at a fixed tail row
    n_c, nl, _ = A_loc.shape
    n_c_pad = -(-n_c // n_dev) * n_dev
    if n_c_pad != n_c:
        import jax.numpy as jnp
        A_loc = jnp.concatenate([
            A_loc, jnp.zeros((n_c_pad - n_c, nl, nl), dtype=A_loc.dtype)])
        pad_dof = n_pad - 1 if n_pad > n else 0
        cell_dofs = jnp.concatenate([
            cell_dofs, jnp.full((n_c_pad - n_c, nl), pad_dof,
                                dtype=cell_dofs.dtype)])

    cell_sh = NamedSharding(mesh, P(axis))
    dof_sh = NamedSharding(mesh, P(axis))
    A_loc = jax.device_put(A_loc, cell_sh)
    cell_dofs = jax.device_put(cell_dofs, cell_sh)

    def apply_A(x):
        y = element_matvec(A_loc, cell_dofs, n_pad, x)
        return jax.lax.with_sharding_constraint(y, dof_sh)

    op = pcons.wrap_operator(apply_A)
    diag = jnp.where(pcons.fixed, 1.0,
                     element_diag(A_loc, cell_dofs, n_pad))
    dinv = jnp.where(diag != 0, 1.0 / diag, 1.0)
    dinv = jax.device_put(dinv, dof_sh)
    if maxiter is None:
        maxiter = n

    def solve(b, atol):
        b_pad = jnp.zeros(n_pad, dtype=b.dtype).at[:n].set(b)
        b_pad = jax.lax.with_sharding_constraint(b_pad, dof_sh)
        res = cg(op, b_pad, M=lambda r: r * dinv, atol=atol,
                 maxiter=maxiter)
        return SolveResult(res.x[:n], res.iters, res.residual)

    return jax.jit(solve)


def shard_solid_solver(solver, mesh: Mesh, axis: str = "cells"):
    """Shard a solid solver: element blocks by cells, Krylov dof vectors by
    padded ranges (see sharded_element_cg).  Swaps the solver's jitted CG
    closures for fully sharded ones; subsequent run_one_step calls execute
    SPMD over the device mesh."""
    for name in ("K_loc", "M_loc", "A_loc"):
        if getattr(solver, name, None) is not None and \
                solver.A_loc.shape[0] % int(np.prod(mesh.devices.shape)) == 0:
            setattr(solver, name,
                    jax.device_put(getattr(solver, name),
                                   NamedSharding(mesh, P(axis))))
    if getattr(solver, "A_loc", None) is not None:
        solver._solve_A = sharded_element_cg(
            solver.A_loc, solver.cell_dofs, solver.constraints, mesh, axis)
    if getattr(solver, "M_loc", None) is not None:
        solver._solve_M = sharded_element_cg(
            solver.M_loc, solver.cell_dofs, solver.constraints, mesh, axis)
    return solver


def _sharded_insim_newton_impl(solver, mesh: Mesh,
                               axis: str = "cells"):
    """Fully dof-range-sharded Newton iteration for the InsIM fluid solver.

    The assembled element blocks are sharded along the cell axis and ALL
    Krylov dof vectors — the coupled [u | p] vector and the preconditioner's
    u/p block vectors — are range-sharded with a per-block padded layout
    ([u .. pad | p .. pad], each block a multiple of the device count).
    The original InsIM block-Schur preconditioner is reused verbatim on a
    padded proxy, so XLA partitions the complete Newton solve SPMD: local
    element work, all-gather halos on the gathered dof vectors,
    reduce-scatter behind the scatter-adds and psum dot products — the
    TPU-native equivalent of the reference's fully distributed
    PETSc/MUMPS solve (source/mpi_insim.cpp:364-395).

    Returns a jitted fn(eval_pt, present, indicator, fsi_acc, fsi_stress,
    fsi_acc_nodal) -> (du, res_norm, iters, residual) on the ORIGINAL
    (unpadded) dof layout, solving the same condensed system to the same
    tolerance as solver._newton_iter."""
    import math
    import types

    import jax.numpy as jnp

    from ..config import real_dtype
    from ..la.constraints import Constraints
    from ..la.krylov import fgmres
    from ..la.operators import element_matvec_taylor_hood

    n_dev = int(np.prod(mesh.devices.shape))
    d = solver.dim

    def pad(n, mult=n_dev):
        return -(-n // mult) * mult

    n_u, n_p = solver.n_u, solver.n_p
    # the u block keeps the node-block (node-major, d components) layout,
    # so its padded length must stay a whole number of nodes too
    n_u_pad = pad(n_u, math.lcm(n_dev, d))
    n_p_pad = pad(n_p)
    n_pad = n_u_pad + n_p_pad
    shift = n_u_pad - n_u
    dof_sh = NamedSharding(mesh, P(axis))
    cell_sh = NamedSharding(mesh, P(axis))

    # ---- padded full-vector zero constraints -------------------------
    zc = solver.zero_constraints
    K = zc.hang_idx.shape[1]

    def ins_vec(vec, fill):
        v = np.asarray(vec)
        return np.concatenate([
            v[:n_u], np.full(n_u_pad - n_u, fill, dtype=v.dtype),
            v[n_u:], np.full(n_p_pad - n_p, fill, dtype=v.dtype)])

    hidx = np.asarray(zc.hang_idx)
    hidx = np.where(hidx >= n_u, hidx + shift, hidx)
    pad_u_rows = np.tile(np.arange(n_u, n_u_pad, dtype=hidx.dtype)[:, None],
                         (1, K))
    pad_p_rows = np.tile(np.arange(n_u_pad + n_p, n_pad,
                                   dtype=hidx.dtype)[:, None], (1, K))
    new_hidx = np.concatenate([hidx[:n_u], pad_u_rows, hidx[n_u:],
                               pad_p_rows])
    hw = np.asarray(zc.hang_w)
    pad_w = np.zeros((1, K))
    pad_w[0, 0] = 1.0
    new_hw = np.concatenate([hw[:n_u],
                             np.tile(pad_w, (n_u_pad - n_u, 1)),
                             hw[n_u:],
                             np.tile(pad_w, (n_p_pad - n_p, 1))])
    cons_pad = Constraints(
        n_pad, new_hidx, new_hw,
        ins_vec(zc.hanging, False),
        ins_vec(zc.dirichlet, True),
        ins_vec(zc.dirichlet_values, 0.0))
    ucons_pad = _pad_constraints(solver._u_cons_of(zc), n_u_pad)
    pcons_pad = _pad_constraints(solver.p_constraints, n_p_pad)

    # ---- padded dof maps + preconditioner element data ----------------
    cd = np.asarray(solver.cell_dofs)
    cd = np.where(cd >= n_u, cd + shift, cd)
    n_c, nl = cd.shape
    n_c_pad = -(-n_c // n_dev) * n_dev
    cpad = n_c_pad - n_c
    if cpad:
        cd = np.concatenate([cd, np.full((cpad, nl), n_pad - 1,
                                         dtype=cd.dtype)])
    cd_pad = jax.device_put(jnp.asarray(cd, dtype=jnp.int32), cell_sh)

    def pad_cells(arr, fill_idx=None):
        a = np.asarray(arr)
        if cpad:
            padv = (np.zeros((cpad,) + a.shape[1:], dtype=a.dtype)
                    if fill_idx is None else
                    np.full((cpad,) + a.shape[1:], fill_idx, dtype=a.dtype))
            a = np.concatenate([a, padv])
        return jax.device_put(jnp.asarray(a), cell_sh)

    cdu_pad = pad_cells(solver.cell_dofs_u, fill_idx=n_u_pad - 1)
    cdp_pad = pad_cells(solver.cell_dofs_p, fill_idx=n_p_pad - 1)
    # node-block layout (VERDICT r2 #5): velocity NODE table for the
    # padded proxy, so _make_preconditioner and the outer matvec use the
    # node-row gathers/scatters (pad cells carry zero blocks, so any
    # fill node is safe)
    cnu_pad = pad_cells(solver.cell_nodes_u, fill_idx=n_u_pad // d - 1)
    mp_loc_pad = pad_cells(solver.Mp_loc)

    def pad_diag(d, n_new):
        v = np.ones(n_new, dtype=np.asarray(d).dtype)
        v[:len(np.asarray(d))] = np.asarray(d)
        return jax.device_put(jnp.asarray(v), dof_sh)

    ps = types.SimpleNamespace(
        Mp_diag=pad_diag(solver.Mp_diag, n_p_pad),
        Mp_loc=mp_loc_pad,
        Mu_diag=pad_diag(solver.Mu_diag, n_u_pad),
        a_block_jacobi=False,
        a_inner_restart=solver.a_inner_restart,
        a_inner_restarts=solver.a_inner_restarts,
        a_inner_rtol=solver.a_inner_rtol,
        cell_dofs_p=cdp_pad, cell_dofs_u=cdu_pad,
        cell_nodes_u=cnu_pad,
        dim=solver.dim,
        mixed_precision_precond=solver.mixed_precision_precond,
        mp_cg_maxiter=solver.mp_cg_maxiter,
        mp_sm_rtol=solver.mp_sm_rtol,
        n_p=n_p_pad, n_u=n_u_pad, nu_loc=solver.nu_loc,
        params=solver.params,
        schur_cg_maxiter=solver.schur_cg_maxiter,
        time=solver.time)

    make_precond = type(solver)._make_preconditioner
    zeros_cells = jnp.zeros((cpad, nl, nl), dtype=real_dtype()) if cpad \
        else None

    def newton(eval_pt, present, indicator, fsi_acc, fsi_stress,
               fsi_acc_nodal):
        A_loc, rhs = solver._assemble(eval_pt, present, indicator, fsi_acc,
                                      fsi_stress, fsi_acc_nodal)
        if cpad:
            A_loc = jnp.concatenate([A_loc, zeros_cells.astype(A_loc.dtype)])
        A_loc = jax.lax.with_sharding_constraint(A_loc, cell_sh)
        b = solver.zero_constraints.condense_rhs(rhs)
        b_pad = jnp.zeros(n_pad, dtype=b.dtype)
        b_pad = b_pad.at[:n_u].set(b[:n_u])
        b_pad = b_pad.at[n_u_pad:n_u_pad + n_p].set(b[n_u:])
        b_pad = jax.lax.with_sharding_constraint(b_pad, dof_sh)
        res_norm = jnp.linalg.norm(b_pad)

        def apply_A(x):
            y = element_matvec_taylor_hood(
                A_loc, cnu_pad, cdp_pad, solver.nu_loc // d, d,
                n_u_pad, n_p_pad, x)
            return jax.lax.with_sharding_constraint(y, dof_sh)

        op = cons_pad.wrap_operator(apply_A)
        precond = make_precond(ps, A_loc, ucons_pad, pcons_pad)
        atol = jnp.maximum(1e-8 * res_norm, 1e-10)
        res = fgmres(op, b_pad, M=precond, atol=atol,
                     restart=solver.outer_restart,
                     max_restarts=solver.outer_max_restarts)
        du = jnp.concatenate([res.x[:n_u],
                              res.x[n_u_pad:n_u_pad + n_p]])
        du = solver.zero_constraints.distribute(du)
        return du, res_norm, res.iters, res.residual

    return newton


def sharded_insim_newton(solver, mesh: Mesh, axis: str = "cells"):
    """Jitted single Newton iteration; see _sharded_insim_newton_impl."""
    return jax.jit(_sharded_insim_newton_impl(solver, mesh, axis))


def make_sharded_stepper(solver, mesh: Mesh, axis: str = "cells"):
    """Fully on-device AND fully sharded time stepping for InsIM: the
    lax.fori_loop over steps with the Newton lax.while_loop, where every
    Krylov vector is dof-range-sharded (see _sharded_insim_newton_impl).
    This is the multi-chip production stepping path — one dispatch per
    timed window, SPMD across the device mesh.

    Returns fn(present, n_steps) -> (present, max_rel_res,
    max_newton_iters) (unpadded layout): the worst final Newton relative
    residual and largest iteration count over the window, so callers can
    detect a silently non-converged step."""
    import jax.lax as lax

    newton = _sharded_insim_newton_impl(solver, mesh, axis)
    params = solver.params
    tol = params.fluid_tolerance
    max_it = params.fluid_max_iterations

    def newton_once(eval_pt, present):
        du, rn, _, _ = newton(eval_pt, present, solver.indicator,
                              solver.fsi_acceleration,
                              solver.fsi_stress_cell, solver.fsi_acc_nodal)
        return eval_pt + du, rn

    def one_step(present):
        eval_pt, res0 = newton_once(present, present)

        def cond(s):
            _, it, res = s
            return (res / res0 > tol) & (res > 1e-11) & (it < max_it)

        def body(s):
            ev, it, _ = s
            ev_new, rn = newton_once(ev, present)
            return (ev_new, it + 1, rn)

        eval_pt, it, res = lax.while_loop(cond, body, (eval_pt, 1, res0))
        rel = jnp.where(res0 > 1e-11, res / jnp.maximum(res0, 1e-300), 0.0)
        return eval_pt, rel, it

    @jax.jit
    def run_n(present, n_steps):
        def body(i, s):
            p, worst_rel, worst_it = s
            p2, rel, it = one_step(p)
            return (p2, jnp.maximum(worst_rel, rel),
                    jnp.maximum(worst_it, it))

        return lax.fori_loop(0, n_steps, body,
                             (present, jnp.zeros((), present.dtype), 0))

    return run_n


class ShardedStencil:
    """Plane-sharded structured-patch stencil apply (VERDICT r4 #4).

    Partitions a single-brick StencilOperator (la/stencil.py) along the
    FIRST grid axis of the bordered brick: each device owns a contiguous
    chunk of `cx` node planes (plane = all slots sharing the axis-0
    coordinate, R = prod(Gp[1:]) slots each) plus a k-plane halo per
    side exchanged with one lax.ppermute each way per matvec
    (2*k*R*d values — the reference partitions exactly this cost through
    PETSc's owned/ghost rows, source/mpi_fluid_solver.cpp:116-162).

    Inside the shard_map body the apply is UNCHANGED: the flattened
    offsets and the F-guard are plane-count-independent (axis-0 stride
    is R), so each device runs the same shifted contiguous multiply-adds
    on its (cx + 2k)-plane buffer; W rows on halo planes are zeroed so
    every output plane has exactly one owner.  Krylov solves keep the
    (d, P_pad, R) tensor shape end-to-end (la/krylov.py accepts ND
    operands), so the basis, dots and axpys all stay plane-sharded under
    GSPMD — only the halo ppermute is manual.

    Exactness: same W entries, same per-plane sums as the flat apply —
    only the (reassociated) Krylov reduction order differs.  Requires a
    merged single-brick grid (n_shared == 0: the combine is an
    identity); multi-brick lattice grids keep the replicated path."""

    def __init__(self, st, mesh: Mesh, axis: str = "cells"):
        if len(st._groups) != 1 or st._groups[0].n_b != 1 \
                or st.n_shared != 0:
            raise ValueError("sharded stencil needs a merged single-brick "
                             "grid (no shared nodes)")
        g = st._groups[0]
        self.st = st
        self.mesh = mesh
        self.axis = axis
        self.k = st.k
        self.S = st.S
        self.dim = st.dim
        n_dev = int(np.prod(mesh.devices.shape))
        self.n_dev = n_dev
        self.P0 = g.Gp[0]                    # bordered planes, axis 0
        self.R = g.M // self.P0              # slots per plane
        self.P_pad = -(-self.P0 // n_dev) * n_dev
        self.cx = self.P_pad // n_dev
        if self.cx < st.k:
            raise ValueError("chunk thinner than the stencil halo")
        self.offsets = g.offsets             # plane-count-independent
        self.F = g.F
        self._x_sh = NamedSharding(mesh, P(None, axis, None))
        self._w_sh = NamedSharding(mesh, P(None, None, None, axis, None))
        self._matvec = self._build_matvec()

    # -- layout maps (flat global <-> sharded plane tensors) -----------
    def spread(self, x):
        """Global flat (n_nodes*d,) -> (d, P_pad, R) plane-sharded."""
        X = self.st.spread(x).reshape(-1, self.P0, self.R)
        X = jnp.pad(X, ((0, 0), (0, self.P_pad - self.P0), (0, 0)))
        return jax.lax.with_sharding_constraint(X, self._x_sh)

    def unspread(self, X):
        """(d, P_pad, R) -> global flat, reading the owning copy."""
        d = X.shape[0]
        return self.st.unspread(X[:, :self.P0].reshape(d, -1))

    def spread_mask(self, mask):
        return self.spread(mask)

    def weight(self, dtype=jnp.float32, d=None):
        """Ownership weights in the sharded layout (pad planes 0)."""
        d = self.st.d if d is None else d
        w = self.st.weight(dtype, d=d).reshape(d, self.P0, self.R)
        w = jnp.pad(w, ((0, 0), (0, self.P_pad - self.P0), (0, 0)))
        return jax.lax.with_sharding_constraint(w, self._x_sh)

    def shard_weights(self, Ws):
        """Stencil tensors from st.build_weights -> plane-sharded
        (S^dim, d_out, d_in, P_pad, R)."""
        (W,) = Ws                            # single group, n_b == 1
        Sd, do, di = W.shape[0], W.shape[1], W.shape[2]
        W = W.reshape(Sd, do, di, self.P0, self.R)
        W = jnp.pad(W, ((0, 0),) * 3 + ((0, self.P_pad - self.P0), (0, 0)))
        return jax.lax.with_sharding_constraint(W, self._w_sh)

    # -- apply ----------------------------------------------------------
    def _build_matvec(self):
        k, R, cx, n_dev = self.k, self.R, self.cx, self.n_dev
        F, offsets, axis = self.F, self.offsets, self.axis
        Ml = (cx + 2 * k) * R

        def body(W, X):
            # W: (S^dim, d_out, d_in, cx, R), X: (d_in, cx, R) per device
            di = X.shape[0]
            lo = jax.lax.ppermute(
                X[:, -k:], axis, [(i, i + 1) for i in range(n_dev - 1)])
            hi = jax.lax.ppermute(
                X[:, :k], axis, [(i, i - 1) for i in range(1, n_dev)])
            Xb = jnp.concatenate([lo, X, hi], axis=1).reshape(di, Ml)
            Wb = jnp.pad(W, ((0, 0),) * 3 + ((k, k), (0, 0)))
            Wb = Wb.reshape(W.shape[0], W.shape[1], di, Ml)
            Xp = jnp.pad(Xb, ((0, 0), (F, F)))
            y = jnp.zeros((W.shape[1], Ml), X.dtype)
            for sf, off in enumerate(offsets):
                win = jax.lax.dynamic_slice_in_dim(Xp, off, Ml, axis=1)
                y = y + jnp.einsum("abm,bm->am", Wb[sf], win,
                                   preferred_element_type=X.dtype)
            return y.reshape(W.shape[1], cx + 2 * k, R)[:, k:-k]

        spec_w = P(None, None, None, self.axis, None)
        spec_x = P(None, self.axis, None)
        return jax.shard_map(body, mesh=self.mesh,
                             in_specs=(spec_w, spec_x), out_specs=spec_x)

    def matvec(self, W, X):
        """y = A x, both in the sharded (d, P_pad, R) layout; W from
        shard_weights."""
        return self._matvec(W, X)

    def condensed_matvec(self, W, fixed, X):
        """Constraint-condensed apply (Dirichlet-only meshes): identity
        on fixed rows, fixed columns zeroed — mirrors
        StencilOperator.condensed_matvec in the sharded layout."""
        Xz = jnp.where(fixed, 0.0, X)
        Y = self._matvec(W, Xz)
        return jnp.where(fixed, X, Y)


def sharded_stencil_asolve(solver, mesh: Mesh, axis: str = "cells"):
    """Plane-sharded inner A-block solve for an InsIM-family solver whose
    mesh merged into a single stencil brick: per-Newton element blocks ->
    stencil tensors -> weighted FGMRES entirely in the sharded
    (d, P_pad, R) layout (ShardedStencil docstring).  Returns a jitted
    solve(Auu, b, atol) -> SolveResult on the flat global layout, solving
    the SAME condensed system as the replicated stencil path."""
    from ..la.krylov import SolveResult, fgmres
    from ..la.operators import element_diag

    st = solver._u_stencil
    sst = ShardedStencil(st, mesh, axis)
    ucons = solver.u_constraints
    d, nlu = solver.dim, solver.nlu
    n_c = int(solver.mesh.n_cells)
    fixed_np = np.asarray(ucons.fixed)

    def solve(Auu, b, atol):
        W = sst.shard_weights(
            st.build_weights(Auu.reshape(n_c, nlu, d, nlu, d)))
        fix = sst.spread_mask(jnp.asarray(fixed_np))
        w = sst.weight(b.dtype)
        diag = jnp.where(ucons.fixed, 1.0, element_diag(
            Auu, solver.cell_dofs_u, solver.n_u))
        dinv = sst.spread(jnp.where(diag != 0, 1.0 / diag, 1.0))
        B = sst.spread(b)
        res = fgmres(lambda x: sst.condensed_matvec(W, fix, x), B,
                     M=lambda r: r * dinv, atol=atol,
                     restart=solver.a_inner_restart,
                     max_restarts=solver.a_inner_restarts, weight=w)
        return SolveResult(sst.unspread(res.x), res.iters, res.residual)

    return jax.jit(solve)


def sharded_supg_newton(solver, mesh: Mesh, axis: str = "cells"):
    """Fully dof-range-sharded Newton iteration for the SUPG fluid family
    (SUPGInsIM / SCnsIM / SerialSCnsIM), mirroring sharded_insim_newton:
    padded [u|p] block layout, the Washio incomplete-Schur (Tpp)
    preconditioner reused verbatim on a padded proxy
    (reference distributed solve: source/mpi_supg_solver.cpp:296-328)."""
    import math
    import types

    import jax.numpy as jnp

    from ..config import real_dtype
    from ..la.constraints import Constraints
    from ..la.krylov import fgmres
    from ..la.operators import element_matvec_taylor_hood

    n_dev = int(np.prod(mesh.devices.shape))
    d = solver.dim

    def pad(n, mult=n_dev):
        return -(-n // mult) * mult

    n_u, n_p = solver.n_u, solver.n_p
    # u block stays in node-block layout (see _sharded_insim_newton_impl)
    n_u_pad = pad(n_u, math.lcm(n_dev, d))
    n_p_pad = pad(n_p)
    n_pad = n_u_pad + n_p_pad
    shift = n_u_pad - n_u
    dof_sh = NamedSharding(mesh, P(axis))
    cell_sh = NamedSharding(mesh, P(axis))

    zc = solver.zero_constraints
    K = zc.hang_idx.shape[1]

    def ins_vec(vec, fill):
        v = np.asarray(vec)
        return np.concatenate([
            v[:n_u], np.full(n_u_pad - n_u, fill, dtype=v.dtype),
            v[n_u:], np.full(n_p_pad - n_p, fill, dtype=v.dtype)])

    hidx = np.asarray(zc.hang_idx)
    hidx = np.where(hidx >= n_u, hidx + shift, hidx)
    pad_u_rows = np.tile(np.arange(n_u, n_u_pad, dtype=hidx.dtype)[:, None],
                         (1, K))
    pad_p_rows = np.tile(np.arange(n_u_pad + n_p, n_pad,
                                   dtype=hidx.dtype)[:, None], (1, K))
    hw = np.asarray(zc.hang_w)
    pad_w = np.zeros((1, K))
    pad_w[0, 0] = 1.0
    cons_pad = Constraints(
        n_pad,
        np.concatenate([hidx[:n_u], pad_u_rows, hidx[n_u:], pad_p_rows]),
        np.concatenate([hw[:n_u], np.tile(pad_w, (n_u_pad - n_u, 1)),
                        hw[n_u:], np.tile(pad_w, (n_p_pad - n_p, 1))]),
        ins_vec(zc.hanging, False),
        ins_vec(zc.dirichlet, True),
        ins_vec(zc.dirichlet_values, 0.0))
    ucons_pad = _pad_constraints(solver._u_cons_of(zc), n_u_pad)
    pcons_pad = _pad_constraints(solver.p_constraints, n_p_pad)

    cd = np.asarray(solver.cell_dofs)
    cd = np.where(cd >= n_u, cd + shift, cd)
    n_c, nl = cd.shape
    n_c_pad = -(-n_c // n_dev) * n_dev
    cpad = n_c_pad - n_c
    if cpad:
        cd = np.concatenate([cd, np.full((cpad, nl), n_pad - 1,
                                         dtype=cd.dtype)])
    cd_pad = jax.device_put(jnp.asarray(cd, dtype=jnp.int32), cell_sh)

    def pad_cells(arr, fill_idx=None):
        a = np.asarray(arr)
        if cpad:
            padv = (np.zeros((cpad,) + a.shape[1:], dtype=a.dtype)
                    if fill_idx is None else
                    np.full((cpad,) + a.shape[1:], fill_idx, dtype=a.dtype))
            a = np.concatenate([a, padv])
        return jax.device_put(jnp.asarray(a), cell_sh)

    cnu_pad = pad_cells(solver.cell_nodes_u, fill_idx=n_u_pad // d - 1)
    cdp_pad = pad_cells(solver.cell_dofs_p, fill_idx=n_p_pad - 1)
    ps = types.SimpleNamespace(
        cell_dofs_p=cdp_pad,
        cell_dofs_u=pad_cells(solver.cell_dofs_u, fill_idx=n_u_pad - 1),
        cell_nodes_u=cnu_pad,
        dim=d,
        mixed_precision_precond=solver.mixed_precision_precond,
        n_p=n_p_pad, n_u=n_u_pad, nu_loc=solver.nu_loc,
        tpp_max_restarts=solver.tpp_max_restarts,
        tpp_restart=solver.tpp_restart)
    make_precond = type(solver)._make_preconditioner
    zeros_cells = jnp.zeros((cpad, nl, nl), dtype=real_dtype()) if cpad \
        else None

    def newton(eval_pt, present, indicator, fsi_acc_nodal,
               fsi_stress_nodal, stress_nodal, eddy_nu):
        A_loc, rhs = solver._assemble(eval_pt, present, indicator,
                                      fsi_acc_nodal, fsi_stress_nodal,
                                      stress_nodal, eddy_nu)
        if cpad:
            A_loc = jnp.concatenate([A_loc, zeros_cells.astype(A_loc.dtype)])
        A_loc = jax.lax.with_sharding_constraint(A_loc, cell_sh)
        b = solver.zero_constraints.condense_rhs(rhs)
        b_pad = jnp.zeros(n_pad, dtype=b.dtype)
        b_pad = b_pad.at[:n_u].set(b[:n_u])
        b_pad = b_pad.at[n_u_pad:n_u_pad + n_p].set(b[n_u:])
        b_pad = jax.lax.with_sharding_constraint(b_pad, dof_sh)
        res_norm = jnp.linalg.norm(b_pad)

        def apply_A(x):
            y = element_matvec_taylor_hood(
                A_loc, cnu_pad, cdp_pad, solver.nu_loc // d, d,
                n_u_pad, n_p_pad, x)
            return jax.lax.with_sharding_constraint(y, dof_sh)

        op = cons_pad.wrap_operator(apply_A)
        precond = make_precond(ps, A_loc, ucons_pad, pcons_pad)
        res = fgmres(op, b_pad, M=precond,
                     atol=solver.outer_rtol * res_norm,
                     restart=solver.outer_restart,
                     max_restarts=solver.outer_max_restarts)
        du = jnp.concatenate([res.x[:n_u],
                              res.x[n_u_pad:n_u_pad + n_p]])
        du = solver.zero_constraints.distribute(du)
        return du, res_norm, res.iters, res.residual

    return jax.jit(newton)
