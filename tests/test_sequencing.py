"""Grid-sequencing (nonlinear FMG) tests."""

import jax.numpy as jnp
import pytest

import naviflow_tpu as nf
from naviflow_tpu.algorithms import (
    SIMPLEConfig,
    build_ladder,
    grid_sequence_solve,
    prolong_state,
    simple_solve,
)
from naviflow_tpu.postprocessing.validation import infinity_norm_error
from naviflow_tpu.solvers import KrylovMomentumConfig, RBGSPressureConfig


def test_build_ladder_parity():
    assert build_ladder(1024, coarsest=32) == [1024, 512, 256, 128, 64, 32]
    assert build_ladder(255, coarsest=31) == [255, 127, 63, 31]
    assert build_ladder(63, coarsest=63) == [63]


def test_prolong_state_shapes_and_bcs():
    coarse = nf.StructuredMesh(nx=16, ny=16)
    fine = nf.StructuredMesh(nx=32, ny=32)
    bc = nf.lid_driven_cavity(1.0)
    s = nf.initialize_state(coarse, bc)
    sf = prolong_state(s, fine, bc)
    assert sf.u.shape == fine.u_shape and sf.v.shape == fine.v_shape
    assert float(sf.u[:, -1].min()) == 1.0  # lid preserved


def test_sequenced_solve_cuts_fine_iterations():
    fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
    bc = nf.lid_driven_cavity(1.0)
    mom = KrylovMomentumConfig(tolerance=1e-8, max_iterations=60)
    pres = RBGSPressureConfig(tolerance=1e-6, max_iterations=30000, omega=1.5)
    cfg = SIMPLEConfig(max_iterations=3000, tolerance=1e-5)
    mesh = nf.StructuredMesh(nx=31, ny=31)

    final, diag, summ = grid_sequence_solve(
        mesh, fluid, bc, simple_solve, cfg,
        momentum=mom, pressure=pres, loop="fused", coarsest=15,
        dtype=jnp.float64,
    )
    assert summ[-1]["converged"]
    # direct solve from rest for comparison
    state0 = nf.initialize_state(mesh, bc, jnp.float64)
    _, diag_direct = simple_solve(mesh, fluid, bc, state0, cfg,
                                  momentum=mom, pressure=pres, loop="fused")
    assert summ[-1]["iterations"] < int(diag_direct.iterations)
    assert infinity_norm_error(final.u, final.v, mesh, 100) < 0.15


def test_sequenced_per_level_momentum():
    """per_level_momentum swaps the fine-level inner solver (momentum-lite)
    without breaking convergence."""
    fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
    bc = nf.lid_driven_cavity(1.0)
    heavy = KrylovMomentumConfig(tolerance=1e-8, max_iterations=60)
    lite = KrylovMomentumConfig(tolerance=1e-5, max_iterations=12)
    pres = RBGSPressureConfig(tolerance=1e-6, max_iterations=30000, omega=1.5)
    cfg = SIMPLEConfig(max_iterations=3000, tolerance=1e-5)
    mesh = nf.StructuredMesh(nx=31, ny=31)

    final, diag, summ = grid_sequence_solve(
        mesh, fluid, bc, simple_solve, cfg,
        momentum=heavy, pressure=pres, loop="fused", coarsest=15,
        dtype=jnp.float64,
        per_level_momentum=lambda n: lite if n >= 31 else heavy,
    )
    assert summ[-1]["converged"]
    assert infinity_norm_error(final.u, final.v, mesh, 100) < 0.15
