"""Steady Newton–Krylov (JFNK) tests: convergence past the SIMPLE
fixed-point iteration, agreement with the SIMPLE steady state (same
discrete system => same root), and the QUICK scheme path.

Small grids, CPU, f64 (conftest).  The Re >= 7500 capability itself is a
hardware/scale run (benchmarks/scale_runs.py newton mode); these tests pin
the algorithmic contract.
"""

import jax.numpy as jnp
import pytest

import naviflow_tpu as nf
from naviflow_tpu.algorithms import (NewtonConfig, SIMPLEConfig,
                                     newton_solve, simple_solve)
from naviflow_tpu.solvers import KrylovMomentumConfig, RBGSPressureConfig
from naviflow_tpu.solvers.multigrid import MultigridConfig


def _setup(nx=31, re=100):
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=re)
    bc = nf.lid_driven_cavity(1.0)
    state = nf.initialize_state(mesh, bc, dtype=jnp.float64)
    return mesh, fluid, bc, state


MOM = KrylovMomentumConfig(tolerance=1e-10, max_iterations=100)
PRES = MultigridConfig(tolerance=1e-8, max_cycles=40)


def test_newton_converges_and_matches_simple_fixed_point():
    """From a 30-iteration SIMPLE warm start, Newton must converge the SAME
    discrete system (power-law) far below SIMPLE's stopping point, and land
    on the same steady state."""
    mesh, fluid, bc, state = _setup()

    warm, _ = simple_solve(
        mesh, fluid, bc, state,
        SIMPLEConfig(max_iterations=30, tolerance=0.0),
        momentum=MOM, pressure=PRES, loop="fused")

    final, diag = newton_solve(
        mesh, fluid, bc, warm,
        NewtonConfig(tolerance=1e-10, scheme="power_law", max_newton=25),
    )
    assert diag.converged, diag.residual_history
    # quadratic-phase sanity: far fewer Newton steps than the ~150 SIMPLE
    # iterations this case needs
    assert diag.iterations <= 20, diag.iterations

    # same root as the fully converged SIMPLE run
    ref, rdiag = simple_solve(
        mesh, fluid, bc, state,
        SIMPLEConfig(max_iterations=4000, tolerance=1e-10),
        momentum=MOM, pressure=PRES, loop="fused")
    assert bool(rdiag.converged)
    assert float(jnp.max(jnp.abs(final.u - ref.u))) < 5e-8
    assert float(jnp.max(jnp.abs(final.v - ref.v))) < 5e-8


def test_newton_quick_scheme_converges():
    """QUICK (9-pt) assembly is differentiable end-to-end: Newton drives the
    unrelaxed QUICK momentum norms below tolerance."""
    mesh, fluid, bc, state = _setup(re=400)

    warm, _ = simple_solve(
        mesh, fluid, bc, state,
        SIMPLEConfig(max_iterations=60, tolerance=0.0),
        momentum=KrylovMomentumConfig(tolerance=1e-10, max_iterations=100,
                                      scheme="quick"),
        pressure=PRES, loop="fused")

    final, diag = newton_solve(
        mesh, fluid, bc, warm,
        NewtonConfig(tolerance=1e-9, scheme="quick", max_newton=25),
    )
    assert diag.converged, diag.residual_history
    assert jnp.all(jnp.isfinite(final.u))
    # monotone tail: the line search never accepts an increase
    hist = diag.residual_history
    assert hist[-1] < hist[0]
