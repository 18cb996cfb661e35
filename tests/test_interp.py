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
