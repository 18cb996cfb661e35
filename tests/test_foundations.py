"""Unit tests for mesh, FE spaces, geometry and Krylov solvers."""

import jax.numpy as jnp
import numpy as np
import pytest

from openifem_tpu.fe.fevalues import cell_values, face_values
from openifem_tpu.fe.shapes import QkShapes, gauss_quadrature
from openifem_tpu.fe.space import FESpace, SystemSpace
from openifem_tpu.la.constraints import Constraints
from openifem_tpu.la.krylov import cg, fgmres
from openifem_tpu.la.operators import element_matvec
from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters


def test_prm_parser_fluid_cavity():
    p = AllParameters.from_file(
        "/root/reference/tests/fluid_cavity/fluid_cavity.prm")
    assert p.simulation_type == "Fluid"
    assert p.dimension == 2
    assert p.global_refinements == [5, 0]
    assert p.end_time == 3.0
    assert p.viscosity == 0.01
    assert p.grad_div == 1.0
    assert p.fluid_dirichlet_bcs[3] == (3, [1.0, 0.0])
    assert p.fluid_dirichlet_bcs[0] == (3, [0.0, 0.0])


def test_prm_parser_solid():
    p = AllParameters.from_file(
        "/root/reference/tests/solid_beam_bending_NeoHookean/"
        "solid_beam_bending_NeoHookean.prm")
    assert p.solid_type == "NeoHookean"
    assert p.C[0] == [0.297751e6, 1e6]  # third value ignored by reference too
    assert p.solid_neumann_bcs[3] == [0.0, -500.0]
    assert p.solid_dirichlet_bcs == {0: 3}


def test_shapes_partition_of_unity():
    for dim in (1, 2, 3):
        for k in (1, 2):
            sh = QkShapes(k, dim)
            pts = np.random.RandomState(0).rand(5, dim)
            N, dN = sh.evaluate(pts)
            assert np.allclose(N.sum(axis=1), 1.0)
            assert np.allclose(dN.sum(axis=1), 0.0, atol=1e-12)


def test_quadrature_exactness():
    # Gauss(3) integrates x^4 exactly on [0,1]^2 per direction up to deg 5
    qp, qw = gauss_quadrature(3, 2)
    val = (qw * qp[:, 0] ** 4).sum()
    assert abs(val - 0.2) < 1e-14


def test_mesh_refine_volume():
    m = generators.hyper_cube(0.0, 1.0, dim=2)
    m = m.refine_global(3)
    assert m.n_cells == 64
    sp = FESpace(m, 1)
    cv = cell_values(sp, 2)
    assert abs(cv.JxW.sum() - 1.0) < 1e-12
    # boundary ids: 4 sides, 8 faces each
    fv = face_values(sp, 2)
    assert len(fv.cells) == 32
    for b in range(4):
        sel = fv.boundary_id == b
        assert abs(fv.JxW[sel].sum() - 1.0) < 1e-12


def test_mesh_3d_volume_and_area():
    m = generators.subdivided_hyper_rectangle([2, 3, 4], [0, 0, 0],
                                              [2.0, 3.0, 4.0])
    sp = FESpace(m, 1)
    cv = cell_values(sp, 2)
    assert abs(cv.JxW.sum() - 24.0) < 1e-12
    fv = face_values(sp, 2)
    areas = {b: fv.JxW[fv.boundary_id == b].sum() for b in range(6)}
    assert abs(areas[0] - 12.0) < 1e-12  # x faces: 3*4
    assert abs(areas[4] - 6.0) < 1e-12   # z faces: 2*3
    # normals point outward
    sel = fv.boundary_id == 1
    assert np.allclose(fv.normals[sel][:, :, 0], 1.0)


def test_q2_space_node_count():
    m = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(2)  # 4x4
    sp = FESpace(m, 2)
    assert sp.n_nodes == 9 * 9
    sp1 = FESpace(m, 1)
    assert sp1.n_nodes == 25


def test_mass_matrix_integral():
    # integral of 1 over domain == sum of mass matrix entries
    m = generators.subdivided_hyper_rectangle([3, 2], [0, 0], [3.0, 2.0])
    sp = FESpace(m, 2)
    cv = cell_values(sp, 3)
    Mloc = np.einsum("qi,qj,cq->cij", cv.N, cv.N, cv.JxW)
    assert abs(Mloc.sum() - 6.0) < 1e-12
    # row sums scattered = integral of each shape fn; total = area
    ones = jnp.ones(sp.n_nodes)
    y = element_matvec(jnp.asarray(Mloc), jnp.asarray(sp.cell_dofs),
                       sp.n_nodes, ones)
    assert abs(float(y.sum()) - 6.0) < 1e-12


def _poisson_solve(k, nref, solver):
    """-lap u = f with u = sin(pi x) sin(pi y) manufactured."""
    m = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(nref)
    sp = FESpace(m, k)
    cv = cell_values(sp, k + 1)
    Kloc = np.einsum("cqid,cqjd,cq->cij", cv.grad, cv.grad, cv.JxW)
    f = 2 * np.pi ** 2 * np.sin(np.pi * cv.xq[..., 0]) * np.sin(
        np.pi * cv.xq[..., 1])
    rhs_loc = np.einsum("qi,cq,cq->ci", cv.N, f, cv.JxW)
    rhs = np.zeros(sp.n_nodes)
    np.add.at(rhs, sp.cell_dofs.ravel(), rhs_loc.ravel())

    bn = sp.boundary_nodes([0, 1, 2, 3])
    dmask = np.zeros(sp.n_nodes, dtype=bool)
    dmask[bn] = True
    cons = Constraints(sp.n_nodes, dirichlet_mask=dmask)

    Kd = jnp.asarray(Kloc)
    cd = jnp.asarray(sp.cell_dofs)
    op = cons.wrap_operator(lambda x: element_matvec(Kd, cd, sp.n_nodes, x))
    b = cons.condense_rhs(jnp.asarray(rhs))
    if solver == "cg":
        res = cg(op, b, atol=1e-12, maxiter=2000)
    else:
        res = fgmres(op, b, atol=1e-12, restart=60, max_restarts=20)
    u = cons.distribute(res.x)
    exact = np.sin(np.pi * sp.node_points[:, 0]) * np.sin(
        np.pi * sp.node_points[:, 1])
    return float(jnp.abs(u - exact).max())


def test_poisson_q1_cg():
    err = _poisson_solve(1, 4, "cg")
    assert err < 5e-3


def test_poisson_q2_cg():
    err = _poisson_solve(2, 3, "cg")
    assert err < 2e-4


def test_poisson_q1_fgmres():
    err = _poisson_solve(1, 4, "fgmres")
    assert err < 5e-3


def test_hanging_nodes_q1_linear_exact():
    # locally refined mesh must reproduce a linear field exactly
    m = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(2)
    flags = np.zeros(m.n_cells, dtype=bool)
    flags[:4] = True
    m2 = m.refine(flags)
    for k in (1, 2):
        sp = FESpace(m2, k)
        assert len(sp.hanging) > 0
        sys = SystemSpace([(sp, 1)])
        idx, w, is_h = sys.hanging_tables()
        cons = Constraints(sys.n_dofs, idx, w, is_h)
        # a linear field evaluated at nodes satisfies the constraints
        u = jnp.asarray(2.0 * sp.node_points[:, 0] - 0.7 *
                        sp.node_points[:, 1] + 0.3)
        u2 = cons.distribute(u)
        assert float(jnp.abs(u2 - u).max()) < 1e-12


def test_hanging_nodes_q2_quadratic_exact():
    m = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(1)
    flags = np.array([True, False, False, False])
    m2 = m.refine(flags)
    sp = FESpace(m2, 2)
    sys = SystemSpace([(sp, 1)])
    idx, w, is_h = sys.hanging_tables()
    cons = Constraints(sys.n_dofs, idx, w, is_h)
    x, y = sp.node_points[:, 0], sp.node_points[:, 1]
    u = jnp.asarray(x ** 2 + 0.5 * x * y - y ** 2 + x - 2 * y + 1)
    u2 = cons.distribute(u)
    assert float(jnp.abs(u2 - u).max()) < 1e-12


def test_hanging_nodes_q3_cubic_exact():
    """Degree-generic hanging constraints (VERDICT r3 #8): Q3 on a
    1-irregular 2D mesh reproduces a cubic field exactly."""
    m = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(1)
    m2 = m.refine(np.array([True, False, False, False]))
    sp = FESpace(m2, 3)
    assert len(sp.hanging) > 0
    sys = SystemSpace([(sp, 1)])
    idx, w, is_h = sys.hanging_tables()
    cons = Constraints(sys.n_dofs, idx, w, is_h)
    x, y = sp.node_points[:, 0], sp.node_points[:, 1]
    u = jnp.asarray(x ** 3 - 2 * x ** 2 * y + 3 * x * y * y - y ** 3
                    + x * y - x + 0.5)
    u2 = cons.distribute(u)
    assert float(jnp.abs(u2 - u).max()) < 1e-11


def _poisson_solve_amr_q3(nref):
    """-lap u = f, Q3, on a half-domain-refined (hanging) mesh."""
    m = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(nref)
    c = m.cell_centers()
    m = m.refine(c[:, 0] < 0.5)
    sp = FESpace(m, 3)
    assert len(sp.hanging) > 0
    cv = cell_values(sp, 4)
    Kloc = np.einsum("cqid,cqjd,cq->cij", cv.grad, cv.grad, cv.JxW)
    f = 2 * np.pi ** 2 * np.sin(np.pi * cv.xq[..., 0]) * np.sin(
        np.pi * cv.xq[..., 1])
    rhs_loc = np.einsum("qi,cq,cq->ci", cv.N, f, cv.JxW)
    rhs = np.zeros(sp.n_nodes)
    np.add.at(rhs, sp.cell_dofs.ravel(), rhs_loc.ravel())
    sys = SystemSpace([(sp, 1)])
    idx, w, is_h = sys.hanging_tables()
    dmask = np.zeros(sp.n_nodes, dtype=bool)
    dmask[sp.boundary_nodes([0, 1, 2, 3])] = True
    cons = Constraints(sp.n_nodes, idx, w, is_h, dirichlet_mask=dmask)
    Kd = jnp.asarray(Kloc)
    cd = jnp.asarray(sp.cell_dofs)
    op = cons.wrap_operator(lambda x: element_matvec(Kd, cd, sp.n_nodes, x))
    b = cons.condense_rhs(jnp.asarray(rhs))
    res = cg(op, b, atol=1e-13, maxiter=4000)
    u = cons.distribute(res.x)
    exact = np.sin(np.pi * sp.node_points[:, 0]) * np.sin(
        np.pi * sp.node_points[:, 1])
    return float(jnp.abs(u - exact).max())


def test_poisson_q3_amr_convergence():
    """Q3 AMR convergence (VERDICT r3 #8): solving through the
    degree-generic hanging constraints keeps the high-order rate
    (O(h^4): each refinement should cut the error ~16x; require >= 8x)."""
    e1 = _poisson_solve_amr_q3(1)
    e2 = _poisson_solve_amr_q3(2)
    assert e1 < 2e-3
    assert e2 < e1 / 8


def test_sphere_mesh():
    m = generators.sphere([0.0, 0.0], 0.25, dim=2).refine_global(2)
    sp = FESpace(m, 1)
    cv = cell_values(sp, 2)
    area = cv.JxW.sum()
    # polygonal approximation of the disk < pi r^2
    assert 0.95 * np.pi * 0.25 ** 2 < area < np.pi * 0.25 ** 2
    # boundary vertices on the circle
    bn = sp.boundary_nodes([0])
    r = np.linalg.norm(sp.node_points[bn], axis=1)
    assert np.allclose(r, 0.25, atol=1e-12)


def test_pallas_element_matvec_interpret():
    """The fused Pallas element-matvec matches the XLA path (interpret
    mode; see la/pallas_ops.py for the Mosaic lowering status)."""
    from openifem_tpu.la.pallas_ops import _self_test
    assert _self_test() < 1e-10


# ----------------------------------------------------------------------
# degree-generic Q_k (k > 2): canonical shared-entity orientation
# (reference: FE degree is a free parameter, include/parameters.h)
# ----------------------------------------------------------------------

def _node_position_consistency(mesh, k):
    """Every (cell, local) pair mapping to one global node must place it
    at the same physical point — THE orientation check for shared-entity
    interior nodes (a flipped edge/face ordering puts a node at two
    different lattice positions)."""
    from openifem_tpu.fe.shapes import QkShapes
    sp = FESpace(mesh, k)
    geo = QkShapes(1, mesh.dim)
    Ng, _ = geo.evaluate(sp.shapes.local_nodes())
    cv = mesh.vertices[mesh.cells]
    pos = np.einsum("lv,cvd->cld", Ng, cv)     # (n_c, nl, d) exact lattice
    flat = sp.cell_dofs.ravel()
    ref = np.full((sp.n_nodes, mesh.dim), np.nan)
    ref[flat] = pos.reshape(-1, mesh.dim)      # last write
    err = np.abs(pos.reshape(-1, mesh.dim) - ref[flat]).max()
    assert err < 1e-10, f"Q{k} node placed inconsistently: {err}"
    # every node written at least once
    assert not np.isnan(ref).any()
    return sp


def test_q3_q4_orientation_2d():
    # flow_around_cylinder has rotated/curved cells sharing edges with
    # opposite local directions
    m = generators.flow_around_cylinder(2)
    for k in (3, 4):
        _node_position_consistency(m, k)


def test_q3_orientation_3d():
    # extruded cylinder: rotated hexes share faces in differing local
    # frames; exercise BOTH the native C++ numbering and the pure-Python
    # fallback and check they allocate the same node count
    import openifem_tpu.fe.space as space_mod
    m = generators.cylinder(0.4, 1.0)
    n_native = _node_position_consistency(m, 3).n_nodes
    import openifem_tpu.native as native_mod
    orig = native_mod.build_cell_dofs
    try:
        space_mod_native = lambda *a, **k2: None  # noqa: E731
        native_mod.build_cell_dofs = space_mod_native
        n_py = _node_position_consistency(m, 3).n_nodes
    finally:
        native_mod.build_cell_dofs = orig
    assert n_native == n_py


def test_q3_interpolation_exact_3d():
    """Nodal interpolation of a tri-degree-3 polynomial is exact at
    random interior points (fails if any shared entity is mis-ordered)."""
    m = generators.cylinder(0.4, 1.0)
    sp = _node_position_consistency(m, 3)

    def f(x):
        return (x[..., 0] ** 3 - 2 * x[..., 1] ** 3 + x[..., 2] ** 3
                + x[..., 0] * x[..., 1] * x[..., 2])

    u = f(sp.node_points)
    rng = np.random.default_rng(3)
    pts = rng.uniform(0.05, 0.95, size=(40, 3))
    N, _ = sp.shapes.evaluate(pts)
    from openifem_tpu.fe.shapes import QkShapes
    geo = QkShapes(1, 3)
    Ng, _ = geo.evaluate(pts)
    vals = np.einsum("pl,cl->cp", N, u[sp.cell_dofs])
    # physical point of (cell, unit point)
    xq = np.einsum("pv,cvd->cpd", Ng, m.vertices[m.cells])
    assert np.abs(vals - f(xq)).max() < 1e-9


def test_poisson_q3_cg():
    # O(h^4): 4x4 Q3 already resolves sin(pi x) sin(pi y) to ~1e-4
    err = _poisson_solve(3, 2, "cg")
    assert err < 5e-4
    # one refinement drops the error by ~2^4
    assert _poisson_solve(3, 3, "cg") < err / 8
