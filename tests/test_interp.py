"""Tests for the cross-mesh interpolation kernels."""

import jax.numpy as jnp
import numpy as np

from openifem_tpu.fe.space import FESpace
from openifem_tpu.fsi.interp import (interpolate_nodal, invert_bilinear,
                                     locate_points, shape_values_jax)
from openifem_tpu.mesh import generators


def test_shape_values_jax_matches_numpy():
    from openifem_tpu.fe.shapes import QkShapes
    rng = np.random.RandomState(3)
    for dim in (2, 3):
        for k in (1, 2):
            pts = rng.rand(7, dim)
            N_np, _ = QkShapes(k, dim).evaluate(pts)
            N_j = np.asarray(shape_values_jax(k, dim, jnp.asarray(pts)))
            assert np.allclose(N_np, N_j, atol=1e-13)


def test_invert_bilinear_roundtrip():
    rng = np.random.RandomState(0)
    # a skewed quad
    verts = np.array([[0.0, 0.0], [1.2, 0.1], [0.2, 1.0], [1.5, 1.3]])
    xi_true = rng.rand(20, 2)
    # forward bilinear map
    x, y = xi_true[:, 0], xi_true[:, 1]
    N = np.stack([(1 - x) * (1 - y), x * (1 - y), (1 - x) * y, x * y], 1)
    pts = N @ verts
    xi = np.asarray(invert_bilinear(
        jnp.asarray(pts), jnp.asarray(np.tile(verts, (20, 1, 1)))))
    assert np.allclose(xi, xi_true, atol=1e-12)


def test_locate_and_interpolate():
    mesh = generators.subdivided_hyper_rectangle([4, 3], [0, 0], [2.0, 1.5])
    sp = FESpace(mesh, 2)
    cell_verts = jnp.asarray(mesh.vertices[mesh.cells])
    lo = jnp.asarray(mesh.vertices[mesh.cells].min(axis=1))
    hi = jnp.asarray(mesh.vertices[mesh.cells].max(axis=1))
    rng = np.random.RandomState(1)
    pts = rng.rand(30, 2) * [2.0, 1.5]
    outside = np.array([[3.0, 0.5], [-0.1, 0.2]])
    allpts = jnp.asarray(np.vstack([pts, outside]))
    idx, unit, found = locate_points(allpts, cell_verts, lo, hi)
    assert bool(found[:30].all())
    assert not bool(found[30]) and not bool(found[31])
    # interpolate a quadratic field exactly (in Q2 space)
    f = (2 * sp.node_points[:, 0] ** 2 - sp.node_points[:, 1] ** 2 +
         0.3 * sp.node_points[:, 0] * sp.node_points[:, 1] + 1)
    vals = interpolate_nodal(jnp.asarray(f), jnp.asarray(sp.cell_dofs),
                             idx, unit, 2, found)
    exact = 2 * pts[:, 0] ** 2 - pts[:, 1] ** 2 + \
        0.3 * pts[:, 0] * pts[:, 1] + 1
    assert np.allclose(np.asarray(vals)[:30], exact, atol=1e-11)
    assert np.allclose(np.asarray(vals)[30:], 0.0)


def test_sph_interpolate_constant_reproduction():
    from openifem_tpu.fsi.interp import sph_interpolate
    rng = np.random.RandomState(0)
    centers = jnp.asarray(rng.rand(50, 2))
    h = jnp.full(50, 0.3)
    vals = jnp.full(50, 7.5)
    targets = jnp.asarray(rng.rand(10, 2) * 0.6 + 0.2)
    out = sph_interpolate(targets, centers, h, vals)
    assert np.allclose(np.asarray(out), 7.5, atol=1e-12)


def test_grid_hash_matches_allpairs():
    """The grid-hash candidate-list locator reproduces locate_points
    exactly (same cells, same units, same found set), including points on
    exact cell/bin boundaries."""
    import jax.numpy as jnp
    from openifem_tpu.fsi.interp import make_cell_hash, plan_cell_hash
    from openifem_tpu.mesh import generators

    mesh = generators.subdivided_hyper_rectangle([8, 20], [0.0, 0.0],
                                                 [2.0, -5.0])
    c = mesh.cell_centers()
    flags = (c[:, 0] >= 0.75) & (c[:, 0] <= 1.25)
    mesh = mesh.refine(flags).refine_global(1)   # adapted: mixed sizes
    cv_np = mesh.vertices[mesh.cells]
    cv = jnp.asarray(cv_np)
    lo, hi = jnp.asarray(cv_np.min(1)), jnp.asarray(cv_np.max(1))

    rng = np.random.RandomState(3)
    rand_pts = rng.uniform([-0.1, -5.1], [2.1, 0.1], size=(4000, 2))
    grid_pts = np.stack(np.meshgrid(np.linspace(0, 2, 17),
                                    np.linspace(-5, 0, 41)), -1).reshape(-1, 2)
    pts = jnp.asarray(np.concatenate([rand_pts, grid_pts]))

    i0, u0, f0 = locate_points(pts, cv, lo, hi)
    dims, span, K = plan_cell_hash(cv_np)
    build, locate = make_cell_hash(mesh.n_cells, dims, span, K)
    i1, u1, f1 = locate(build(cv), pts)
    assert np.array_equal(np.asarray(f0), np.asarray(f1))
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    m = np.asarray(f0)
    assert np.abs(np.asarray(u0) - np.asarray(u1))[m].max() < 1e-12


def test_grid_hash_scales_to_large_mesh():
    """Point location against a refine=3 Turek cylinder mesh (23552 cells,
    the production-scale regime): memory is O(n_p * K), where the all-pairs
    path would need an n_p x n_c x 4 x 2 f64 intermediate (~60 GB here)."""
    import jax.numpy as jnp
    from openifem_tpu.fsi.interp import make_cell_hash, plan_cell_hash
    from openifem_tpu.mesh import generators

    mesh = generators.flow_around_cylinder(2).refine_global(3)
    cv_np = mesh.vertices[mesh.cells]
    dims, span, K = plan_cell_hash(cv_np)
    assert K * span <= 64   # candidate lists stay small
    build, locate = make_cell_hash(mesh.n_cells, dims, span, K)
    state = build(jnp.asarray(cv_np))

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform([0.0, 0.0], [2.2, 0.41],
                                  size=(20000, 2)))
    idx, unit, found = locate(state, pts)
    found = np.asarray(found)
    # points outside the cylinder hole and inside the channel are found
    p = np.asarray(pts)
    r = np.linalg.norm(p - np.array([0.2, 0.2]), axis=1)
    clearly_fluid = r > 0.06
    assert found[clearly_fluid].all()
    assert not found[r < 0.045].any()   # inside the hole: not found
    # spot-check: interpolating coordinates recovers the points
    verts = np.asarray(state[1])
    sel = np.where(found)[0][:500]
    from openifem_tpu.fsi.interp import invert_bilinear  # noqa: F401
    cells = np.asarray(idx)[sel]
    uu = np.asarray(unit)[sel]
    x = np.einsum("pv,pvd->pd",
                  np.stack([(1 - uu[:, 0]) * (1 - uu[:, 1]),
                            uu[:, 0] * (1 - uu[:, 1]),
                            (1 - uu[:, 0]) * uu[:, 1],
                            uu[:, 0] * uu[:, 1]], axis=1),
                  verts[cells])
    assert np.abs(x - p[sel]).max() < 1e-8
