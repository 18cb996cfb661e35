"""Structured-patch stencil SpMV (la/stencil.py) vs the element path.

The stencil engine is the round-4 TPU perf core: it must reproduce the
element-block matvec EXACTLY (up to reassociation) on every structured
mesh the bench runs — including the Turek cylinder grid with its
irregular coarse vertices and curved ring — and the Krylov solves in
the duplicated patch layout (ownership-weighted inner products) must
match the flat solves.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from openifem_tpu.mesh import generators
from openifem_tpu.fe.space import FESpace
from openifem_tpu.la.constraints import Constraints
from openifem_tpu.la.krylov import cg, fgmres
from openifem_tpu.la.operators import (element_matvec,
                                       element_matvec_nodeblock)
from openifem_tpu.la.stencil import PatchGrid, StencilOperator


def _random_blocks(rng, n_c, nl, d, sym=False):
    A = rng.standard_normal((n_c, nl, d, nl, d))
    if sym:
        A = A + A.transpose(0, 3, 4, 1, 2)
    return A


def _flatten_blocks(Ab):
    n_c, nl, d = Ab.shape[0], Ab.shape[1], Ab.shape[2]
    return jnp.transpose(jnp.asarray(Ab), (0, 1, 3, 2, 4)).reshape(
        n_c, nl * d, nl * d)


MESHES = [
    ("cube_r2", lambda: generators.hyper_cube(0.0, 1.0, dim=2)
     .refine_global(2)),
    ("rect_r1", lambda: generators.subdivided_hyper_rectangle(
        [3, 2], [0, 0], [3.0, 2.0]).refine_global(1)),
    ("cylinder_r2", lambda: generators.flow_around_cylinder(2)
     .refine_global(2)),
]


@pytest.mark.parametrize("name,mk", MESHES)
@pytest.mark.parametrize("degree,d", [(1, 1), (2, 2)])
def test_stencil_matvec_matches_element(name, mk, degree, d):
    mesh = mk()
    grid = PatchGrid.build(mesh)
    assert grid is not None, f"{name} should be patch-structured"
    sp = FESpace(mesh, degree)
    st = StencilOperator(grid, sp, d=d)
    rng = np.random.default_rng(3)
    nl = sp.cell_dofs.shape[1]
    Ab = jnp.asarray(_random_blocks(rng, mesh.n_cells, nl, d))
    x = jnp.asarray(rng.standard_normal(sp.n_nodes * d))

    if d == 1:
        y_ref = element_matvec(Ab.reshape(mesh.n_cells, nl, nl),
                               jnp.asarray(sp.cell_dofs), sp.n_nodes, x)
    else:
        y_ref = element_matvec_nodeblock(Ab, jnp.asarray(sp.cell_dofs),
                                         sp.n_nodes, x)

    W = st.build_weights(Ab)
    y = st.unspread(st.matvec(W, st.spread(x)))
    err = float(jnp.abs(y - y_ref).max()) / float(jnp.abs(y_ref).max())
    assert err < 1e-12, err


def test_stencil_duplicates_consistent():
    """All copies of a shared node carry the same value after a matvec."""
    mesh = generators.flow_around_cylinder(2).refine_global(1)
    grid = PatchGrid.build(mesh)
    sp = FESpace(mesh, 2)
    st = StencilOperator(grid, sp, d=2)
    rng = np.random.default_rng(0)
    nl = sp.cell_dofs.shape[1]
    Ab = jnp.asarray(_random_blocks(rng, mesh.n_cells, nl, 2))
    x = jnp.asarray(rng.standard_normal(sp.n_nodes * 2))
    Y = st.matvec(st.build_weights(Ab), st.spread(x))
    # d-first bordered layout: slot node ids come from pad_node
    v = np.asarray(Y).reshape(2, -1)
    pn = np.asarray(st.pad_node)
    ng = np.asarray(st.node_grid).reshape(-1)
    for node in np.unique(ng[:64]):
        copies = v[:, pn == node]
        assert np.allclose(copies, copies[:, :1])


def test_stencil_condensed_matches_wrap_operator():
    mesh = generators.flow_around_cylinder(2).refine_global(2)
    grid = PatchGrid.build(mesh)
    sp = FESpace(mesh, 2)
    d = 2
    st = StencilOperator(grid, sp, d=d)
    rng = np.random.default_rng(1)
    nl = sp.cell_dofs.shape[1]
    Ab = jnp.asarray(_random_blocks(rng, mesh.n_cells, nl, d))
    n = sp.n_nodes * d
    dmask = np.zeros(n, dtype=bool)
    bn = sp.boundary_nodes(range(64))
    dmask[(np.asarray(bn)[:, None] * d + np.arange(d)).reshape(-1)] = True
    cons = Constraints(n, dirichlet_mask=dmask)
    op_ref = cons.wrap_operator(lambda v: element_matvec_nodeblock(
        Ab, jnp.asarray(sp.cell_dofs), sp.n_nodes, v))
    x = jnp.asarray(rng.standard_normal(n))
    y_ref = op_ref(x)

    W = st.build_weights(Ab)
    fp = st.spread_mask(cons.fixed)
    y = st.unspread(st.condensed_matvec(W, fp, st.spread(x)))
    err = float(jnp.abs(y - y_ref).max()) / float(jnp.abs(y_ref).max())
    assert err < 1e-12, err


def test_weighted_cg_matches_flat():
    """CG in the duplicated patch layout with ownership weights converges
    to the same solution as flat CG on the underlying SPD system."""
    mesh = generators.flow_around_cylinder(2).refine_global(1)
    grid = PatchGrid.build(mesh)
    sp = FESpace(mesh, 1)
    st = StencilOperator(grid, sp, d=1)
    rng = np.random.default_rng(5)
    nl = sp.cell_dofs.shape[1]
    # SPD: mass-like blocks
    B = rng.standard_normal((mesh.n_cells, nl, nl))
    Ab = np.einsum("cki,ckj->cij", B, B) + 3 * nl * np.eye(nl)
    Ab_d = jnp.asarray(Ab)
    b = jnp.asarray(rng.standard_normal(sp.n_nodes))
    cd = jnp.asarray(sp.cell_dofs)
    ref = cg(lambda v: element_matvec(Ab_d, cd, sp.n_nodes, v), b,
             atol=1e-12, maxiter=500)

    W = st.build_weights(Ab_d.reshape(mesh.n_cells, nl, 1, nl, 1))
    wt = st.weight(jnp.float64)
    res = cg(lambda v: st.matvec(W, v), st.spread(b), atol=1e-12,
             maxiter=500, weight=wt)
    x = st.unspread(res.x)
    assert float(jnp.abs(x - ref.x).max()) < 1e-9
    # same convergence behavior (weighted norms equal flat norms)
    assert abs(int(res.iters) - int(ref.iters)) <= 2


def test_weighted_fgmres_matches_flat():
    mesh = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(2)
    grid = PatchGrid.build(mesh)
    sp = FESpace(mesh, 2)
    st = StencilOperator(grid, sp, d=2)
    rng = np.random.default_rng(7)
    nl = sp.cell_dofs.shape[1]
    Ab = np.asarray(_random_blocks(rng, mesh.n_cells, nl, 2))
    # diagonally dominant (nonsymmetric ok for FGMRES)
    Ab[:, np.arange(nl), :, np.arange(nl), :] += 8 * nl * np.eye(2)
    Ab_d = jnp.asarray(Ab)
    cd = jnp.asarray(sp.cell_dofs)
    n = sp.n_nodes * 2
    b = jnp.asarray(rng.standard_normal(n))
    ref = fgmres(lambda v: element_matvec_nodeblock(Ab_d, cd, sp.n_nodes,
                                                    v),
                 b, atol=1e-10, restart=40, max_restarts=4)
    W = st.build_weights(Ab_d)
    wt = st.weight(jnp.float64)
    res = fgmres(lambda v: st.matvec(W, v), st.spread(b), atol=1e-10,
                 restart=40, max_restarts=4, weight=wt)
    x = st.unspread(res.x)
    assert float(jnp.abs(x - ref.x).max()) < 1e-8
    assert abs(int(res.iters) - int(ref.iters)) <= 2


def test_patchgrid_bricks_nonuniform():
    """Mixed-level axis-aligned meshes decompose into per-level lattice
    BRICKS (round 5): the raw stencil apply must equal the raw element
    matvec including the rows/cols of hanging-node dofs (constraint
    projection stays outside the operator on both paths)."""
    mesh = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(1)
    mesh = mesh.refine(np.array([True, False, False, False]))
    grid = PatchGrid.build(mesh)
    assert grid is not None and grid.n_patches >= 2
    for degree, d in [(1, 1), (2, 2)]:
        sp = FESpace(mesh, degree)
        assert len(sp.hanging) > 0
        st = StencilOperator(grid, sp, d=d)
        rng = np.random.default_rng(17)
        nl = sp.cell_dofs.shape[1]
        Ab = jnp.asarray(_random_blocks(rng, mesh.n_cells, nl, d))
        x = jnp.asarray(rng.standard_normal(sp.n_nodes * d))
        if d == 1:
            y_ref = element_matvec(Ab.reshape(mesh.n_cells, nl, nl),
                                   jnp.asarray(sp.cell_dofs), sp.n_nodes, x)
        else:
            y_ref = element_matvec_nodeblock(
                Ab, jnp.asarray(sp.cell_dofs), sp.n_nodes, x)
        y = st.flat_matvec(st.build_weights(Ab), x)
        err = float(jnp.abs(y - y_ref).max()) / float(jnp.abs(y_ref).max())
        assert err < 1e-12, err


def test_patchgrid_rejects_unstructured():
    """A mesh whose cells are not axis-aligned and not uniformly
    refined stays on the element path."""
    mesh = generators.flow_around_cylinder(2).refine_global(1)
    mesh = mesh.refine(np.arange(mesh.n_cells) == 0)
    assert PatchGrid.build(mesh) is None


MESHES_3D = [
    ("cube3d_r1", lambda: generators.hyper_cube(0.0, 1.0, dim=3)
     .refine_global(1)),
    ("rect3d", lambda: generators.subdivided_hyper_rectangle(
        [3, 2, 2], [0, 0, 0], [3.0, 2.0, 2.0]).refine_global(1)),
]


@pytest.mark.parametrize("name,mk", MESHES_3D)
@pytest.mark.parametrize("degree,d", [(1, 1), (1, 4), (2, 1)])
def test_stencil_3d_matches_element(name, mk, degree, d):
    """3D bricks (VERDICT r4 #1): (2k+1)^3-point stencil on d-first
    bordered brick slots equals the element matvec exactly."""
    mesh = mk()
    grid = PatchGrid.build(mesh)
    assert grid is not None, f"{name} should be brick-structured"
    sp = FESpace(mesh, degree)
    st = StencilOperator(grid, sp, d=d)
    rng = np.random.default_rng(23)
    nl = sp.cell_dofs.shape[1]
    Ab = jnp.asarray(_random_blocks(rng, mesh.n_cells, nl, d))
    x = jnp.asarray(rng.standard_normal(sp.n_nodes * d))
    if d == 1:
        y_ref = element_matvec(Ab.reshape(mesh.n_cells, nl, nl),
                               jnp.asarray(sp.cell_dofs), sp.n_nodes, x)
    else:
        y_ref = element_matvec_nodeblock(Ab, jnp.asarray(sp.cell_dofs),
                                         sp.n_nodes, x)
    y = st.unspread(st.matvec(st.build_weights(Ab), st.spread(x)))
    err = float(jnp.abs(y - y_ref).max()) / float(jnp.abs(y_ref).max())
    assert err < 1e-12, err


def test_stencil_3d_local_refine_matches_element():
    """The fsi-wall-3D mesh shape: a box locally refined on a z-band
    (reference: tests/fsi-wall-3D/fsi-wall-3D.cpp:34-44) decomposes into
    3 bricks (two coarse slabs + the fine band) and the raw stencil apply
    with the Q1 coupled node-block layout (d=4: 3 velocity + 1 pressure)
    equals the raw element matvec."""
    mesh = generators.subdivided_hyper_rectangle(
        [3, 3, 12], [0, 0, 0], [1.0, 1.0, 4.0])
    c = mesh.cell_centers()
    mesh = mesh.refine((c[:, 2] >= 2.0) & (c[:, 2] <= 2.4))
    grid = PatchGrid.build(mesh)
    assert grid is not None and grid.n_patches == 3
    sp = FESpace(mesh, 1)
    assert len(sp.hanging) > 0
    d = 4
    st = StencilOperator(grid, sp, d=d)
    rng = np.random.default_rng(29)
    nl = sp.cell_dofs.shape[1]
    Ab = jnp.asarray(_random_blocks(rng, mesh.n_cells, nl, d))
    x = jnp.asarray(rng.standard_normal(sp.n_nodes * d))
    y_ref = element_matvec_nodeblock(Ab, jnp.asarray(sp.cell_dofs),
                                     sp.n_nodes, x)
    y = st.flat_matvec(st.build_weights(Ab), x)
    err = float(jnp.abs(y - y_ref).max()) / float(jnp.abs(y_ref).max())
    assert err < 1e-12, err


def test_poly_jacobi_inner_matches_default():
    """a_poly (damped-Jacobi Richardson polynomial inner preconditioner)
    changes only iteration counts: a truncated cavity run converges to
    the same state as the default pointwise-Jacobi inner solve."""
    from openifem_tpu.parameters import AllParameters
    from openifem_tpu.solvers.fluid import InsIM

    p = AllParameters.from_file(
        "/root/reference/tests/fluid_cavity/fluid_cavity.prm")
    p.end_time = 0.03
    p.global_refinements[0] = 3

    def run(cls):
        f = cls(generators.hyper_cube(0.0, 1.0, dim=2), p)
        f.run(verbose=False)
        return np.asarray(f.present_solution)

    class Poly(InsIM):
        a_poly = 4

    ref = run(InsIM)
    got = run(Poly)
    # same converged solution (both gated on the f64 Newton residual at
    # the prm tolerance); the preconditioner change is invisible at the
    # solve tolerance
    assert np.abs(got - ref).max() < 1e-6


def test_poly_jacobi_element_path_matches_default():
    """a_poly on the ELEMENT path (stencil disabled) is the same wrap."""
    from openifem_tpu.parameters import AllParameters
    from openifem_tpu.solvers.fluid import InsIM

    p = AllParameters.from_file(
        "/root/reference/tests/fluid_cavity/fluid_cavity.prm")
    p.end_time = 0.02
    p.global_refinements[0] = 3

    def run(cls):
        f = cls(generators.hyper_cube(0.0, 1.0, dim=2), p)
        f.run(verbose=False)
        return np.asarray(f.present_solution)

    class NoSt(InsIM):
        a_stencil = False

    class PolyNoSt(NoSt):
        a_poly = 3
        a_poly_omega = 0.7

    assert np.abs(run(PolyNoSt) - run(NoSt)).max() < 1e-6


def test_merged_grid_combine_free():
    """subdivided_hyper_rectangle meshes merge into ONE rectangular
    super-patch: no duplicated nodes, combine-free stencil (the combine
    gathers cost as much as the matvec in the many-small-patches
    regime — see la/stencil.py docstring)."""
    mesh = generators.subdivided_hyper_rectangle(
        [5, 3], [0, 0], [5.0, 3.0]).refine_global(2)
    grid = PatchGrid.build(mesh)
    assert grid is not None
    assert grid.n_patches == 1
    assert (grid.mi, grid.mj) == (20, 12)
    sp = FESpace(mesh, 2)
    st = StencilOperator(grid, sp, d=2)
    assert st.n_shared == 0
    # matvec equality on the merged layout
    rng = np.random.default_rng(11)
    nl = sp.cell_dofs.shape[1]
    Ab = jnp.asarray(_random_blocks(rng, mesh.n_cells, nl, 2))
    x = jnp.asarray(rng.standard_normal(sp.n_nodes * 2))
    y_ref = element_matvec_nodeblock(Ab, jnp.asarray(sp.cell_dofs),
                                     sp.n_nodes, x)
    y = st.unspread(st.matvec(st.build_weights(Ab), st.spread(x)))
    err = float(jnp.abs(y - y_ref).max()) / float(jnp.abs(y_ref).max())
    assert err < 1e-12, err


def test_cylinder_grid_stays_multipatch():
    """The Turek grid's irregular coarse topology cannot merge; the
    multi-patch layout with the gather-only combine is kept."""
    mesh = generators.flow_around_cylinder(2).refine_global(1)
    grid = PatchGrid.build(mesh)
    assert grid is not None and grid.n_patches > 1
