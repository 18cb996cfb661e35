"""Output + checkpoint/restart tests."""

import os

import numpy as np
import pytest

from openifem_tpu.mesh import generators
from openifem_tpu.parameters import AllParameters
from openifem_tpu.solvers.fluid import InsIM
from openifem_tpu.solvers.solid import LinearElasticity

REF = "/root/reference/tests"


def test_vtu_pvd_output(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = AllParameters.from_file(f"{REF}/fluid_cavity/fluid_cavity.prm")
    p.end_time = 0.02
    p.global_refinements[0] = 2
    f = InsIM(generators.hyper_cube(0.0, 1.0, dim=2), p)
    f.run(verbose=False)
    f.output_results()
    assert os.path.exists("fluid-000002.vtu")
    assert os.path.exists("fluid.pvd")
    txt = open("fluid-000002.vtu").read()
    assert "velocity" in txt and "pressure" in txt and "indicator" in txt


def test_checkpoint_restart_fluid(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = AllParameters.from_file(f"{REF}/fluid_cavity/fluid_cavity.prm")
    p.end_time = 0.04
    p.global_refinements[0] = 2
    mesh = generators.hyper_cube(0.0, 1.0, dim=2)
    f1 = InsIM(mesh, p)
    f1.run(verbose=False)
    ref = np.asarray(f1.present_solution)

    # run half, checkpoint, restart, continue
    p2 = AllParameters.from_file(f"{REF}/fluid_cavity/fluid_cavity.prm")
    p2.end_time = 0.04
    p2.global_refinements[0] = 2
    fa = InsIM(mesh, p2)
    fa.mesh = fa.mesh.refine_global(2)
    fa.setup()
    fa.run_one_step(True, verbose=False)
    fa.run_one_step(False, verbose=False)
    fa.save_checkpoint()

    fb = InsIM(generators.hyper_cube(0.0, 1.0, dim=2), p2)
    assert fb.load_checkpoint()
    assert fb.time.get_timestep() == 2
    while fb.time.end() - fb.time.current() > 1e-12:
        fb.run_one_step(False, verbose=False)
    out = np.asarray(fb.present_solution)
    assert np.allclose(out, ref, atol=1e-9)


def test_checkpoint_restart_solid(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = AllParameters.from_file(
        f"{REF}/solid_gravity_linearelastic/solid_gravity_linearelastic.prm")
    mesh = generators.sphere([0.0, 0.0], 0.25, dim=2)
    s1 = LinearElasticity(mesh, p)
    s1.run()
    ref = np.asarray(s1.get_current_solution())

    s2 = LinearElasticity(generators.sphere([0.0, 0.0], 0.25, dim=2), p)
    s2.mesh = s2.mesh.refine_global(p.global_refinements[1])
    s2.setup()
    s2.run_one_step(True)
    s2.run_one_step(False)
    s2.save_checkpoint()
    s2.output_results()

    s3 = LinearElasticity(generators.sphere([0.0, 0.0], 0.25, dim=2), p)
    assert s3.load_checkpoint()
    while s3.time.end() - s3.time.current() > 1e-12:
        s3.run_one_step(False)
    out = np.asarray(s3.get_current_solution())
    assert np.allclose(out, ref, atol=1e-10)
