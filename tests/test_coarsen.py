"""Mesh coarsening (deal.II execute_coarsening_and_refinement analog)."""

import numpy as np

from openifem_tpu.mesh import generators


def test_coarsen_roundtrip():
    """Refine one cell, coarsen its family: topology returns exactly."""
    m0 = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(1)  # 4 cells
    flags = np.zeros(m0.n_cells, dtype=bool)
    flags[0] = True
    m1 = m0.refine(flags)
    assert m1.n_cells == 7
    cf = np.asarray(m1.level == m1.level.max())
    m2, o2n = m1.coarsen(cf)
    assert m2.n_cells == 4
    assert m2.n_vertices == m0.n_vertices
    # same cell vertex positions as before refinement (up to ordering)
    c0 = np.sort(m0.vertices[m0.cells].reshape(m0.n_cells, -1), axis=0)
    c2 = np.sort(m2.vertices[m2.cells].reshape(m2.n_cells, -1), axis=0)
    assert np.allclose(np.sort(c0.ravel()), np.sort(c2.ravel()))
    # all four children map to the same new parent cell
    kids = np.where(cf)[0]
    assert len(set(o2n[kids])) == 1
    # boundary ids restored
    assert (np.sort(m2.boundary_id.ravel()) ==
            np.sort(m0.boundary_id.ravel())).all()


def test_coarsen_incomplete_family_and_level0():
    # level-0 grid cells have no recorded parent: nothing to coarsen
    m0 = generators.subdivided_hyper_rectangle([2, 2], [0, 0], [1.0, 1.0])
    m1, o2n = m0.coarsen(np.ones(m0.n_cells, dtype=bool))
    assert m1.n_cells == m0.n_cells
    assert (o2n == np.arange(m0.n_cells)).all()
    # incomplete family: flag only 3 of 4 children
    flags = np.zeros(m0.n_cells, dtype=bool)
    flags[0] = True
    m2 = m0.refine(flags)
    cf = np.asarray(m2.level == m2.level.max())
    cf[np.where(cf)[0][0]] = False
    m3, _ = m2.coarsen(cf)
    assert m3.n_cells == m2.n_cells
    # min_level stops coarsening below the kept level
    cf = np.asarray(m2.level == m2.level.max())
    m4, _ = m2.coarsen(cf, min_level=1)
    assert m4.n_cells == m2.n_cells


def test_coarsen_vetoes_finer_neighbor():
    """A family may not coarsen while a face neighbor is finer than its
    children (2:1 balance)."""
    m0 = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(1)
    m1 = m0.refine(np.ones(m0.n_cells, dtype=bool))          # 16 cells, L2
    # refine the L2 cell at [0.25,0.5]^2 (touches OTHER families across
    # x=0.5 / y=0.5) once more -> L3 cells adjacent to complete L2 families
    target = np.argmin(np.linalg.norm(
        m1.cell_centers() - [0.375, 0.375], axis=1))
    flags = np.zeros(m1.n_cells, dtype=bool)
    flags[target] = True
    m2 = m1.refine(flags)
    # try to coarsen an L2 family that has an L3 face neighbor
    lev = np.asarray(m2.level)
    fam = np.asarray(m2.family)
    l3 = np.where(lev == 3)[0]
    l3_verts = set(m2.cells[l3].ravel().tolist())
    vetoed, corner_only = None, None
    for f in np.unique(fam[(lev == 2) & (fam >= 0)]):
        members = np.where(fam == f)[0]
        if len(members) == 4 and (lev[members] == 2).all():
            shared = set(m2.cells[members].ravel().tolist()) & l3_verts
            if len(shared) >= 2 and vetoed is None:
                vetoed = members          # face-adjacent to L3
            elif len(shared) <= 1 and corner_only is None:
                corner_only = members     # at most a corner touch
    assert vetoed is not None
    cf = np.zeros(m2.n_cells, dtype=bool)
    cf[vetoed] = True
    m3, _ = m2.coarsen(cf)
    assert m3.n_cells == m2.n_cells  # refused

    # corner contact does not violate face-based 2:1: coarsening allowed
    assert corner_only is not None
    cf = np.zeros(m2.n_cells, dtype=bool)
    cf[corner_only] = True
    m4, _ = m2.coarsen(cf)
    assert m4.n_cells == m2.n_cells - 3


def test_coarsen_next_to_coarser_neighbor():
    """Coarsening toward an already-coarser neighbor is allowed and removes
    the hanging node."""
    m0 = generators.hyper_cube(0.0, 1.0, dim=2).refine_global(1)
    flags = np.zeros(m0.n_cells, dtype=bool)
    flags[0] = True
    m1 = m0.refine(flags)                    # 1-irregular: 7 cells
    cf = np.asarray(m1.level == m1.level.max())
    m2, _ = m1.coarsen(cf)
    assert m2.n_cells == 4


def test_hanging_nodes_3d():
    """3D hanging-node constraints reproduce polynomial fields exactly
    (linear for Q1, quadratic for Q2, cubic for Q3 — the constraints are
    degree-generic) across a 1-irregular interface."""
    from openifem_tpu.fe.space import FESpace

    m0 = generators.subdivided_hyper_rectangle(
        [2, 2, 2], [0, 0, 0], [1.0, 1.0, 1.0])
    flags = np.zeros(m0.n_cells, dtype=bool)
    flags[0] = True
    mesh = m0.refine(flags)

    for degree in (1, 2, 3):
        sp = FESpace(mesh, degree)
        assert len(sp.hanging) > 0
        x = sp.node_points
        if degree == 1:
            f = 1.0 + 2 * x[:, 0] - 3 * x[:, 1] + 0.5 * x[:, 2]
        elif degree == 2:
            f = (1.0 + 2 * x[:, 0] - 3 * x[:, 1] + 0.5 * x[:, 2]
                 + x[:, 0] * x[:, 1] - 2 * x[:, 1] * x[:, 2]
                 + 0.7 * x[:, 0] ** 2 - 1.3 * x[:, 2] ** 2)
        else:
            f = (x[:, 0] ** 3 - 2 * x[:, 1] ** 3 + x[:, 2] ** 3
                 + x[:, 0] ** 2 * x[:, 1] - x[:, 1] * x[:, 2] ** 2
                 + 0.5 * x[:, 0] * x[:, 1] * x[:, 2] - x[:, 0] + 0.3)
        for slave, masters, w in sp.hanging:
            val = sum(wi * f[mi] for mi, wi in zip(masters, w))
            assert abs(val - f[slave]) < 1e-10, (slave, val, f[slave])


def test_hanging_nodes_3d_solve():
    """A solid solve on a locally refined 3D mesh runs and stays finite
    (previously raised NotImplementedError)."""
    from openifem_tpu.parameters import AllParameters
    from openifem_tpu.solvers.solid import LinearElasticity

    p = AllParameters.from_file(
        "/root/reference/tests/solid_gravity_linearelastic/"
        "solid_gravity_linearelastic.prm")
    p.end_time = p.time_step
    m0 = generators.subdivided_hyper_rectangle(
        [2, 2, 2], [0, 0, 0], [0.5, 0.5, 0.5])
    flags = np.zeros(m0.n_cells, dtype=bool)
    flags[0] = True
    mesh = m0.refine(flags)
    solid = LinearElasticity(mesh, p)
    solid.run()
    u = np.asarray(solid.get_current_solution())
    assert np.isfinite(u).all()
    # free fall under gravity -10: u_y = -g t^2 / 2 everywhere
    uy = u.reshape(-1, 3)[:, 1]
    t = p.time_step
    assert np.allclose(uy, -10.0 * t * t / 2, rtol=1e-5)


def test_kelly_includes_hanging_faces():
    """The jump across a coarse/fine (hanging) interface is integrated:
    a cell whose ONLY interior faces are nonconforming subfaces must get a
    nonzero indicator for a field with a curvature jump (deal.II's
    KellyErrorEstimator integrates subfaces there)."""
    import numpy as np
    from openifem_tpu.fe.kelly import kelly_estimate
    from openifem_tpu.fe.space import FESpace
    from openifem_tpu.mesh import generators

    mesh = generators.subdivided_hyper_rectangle([1, 2], [0.0, 0.0],
                                                 [1.0, 2.0])
    mesh = mesh.refine(np.array([False, True]))  # top cell -> 4 children
    space = FESpace(mesh, 1)
    pts = space.node_points
    # Q1-interpolated quadratic: the normal gradient jumps across every
    # interior face, including the hanging one
    field = pts[:, 0] ** 2 + pts[:, 1] ** 2
    eta = kelly_estimate(space, field)
    # cell 0 (the coarse bottom cell) has only the hanging interface as
    # interior faces; without subface integration its indicator is zero
    assert eta[0] > 1e-8
    # and the fine cells adjacent to it also pick up the jump
    assert np.isfinite(eta).all()
