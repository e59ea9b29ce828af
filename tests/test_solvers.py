"""Linear-solver correctness: manufactured pressure systems and momentum solves."""

import numpy as np
import jax.numpy as jnp
import pytest

from naviflow_tpu.ops.poisson import (
    apply_poisson,
    poisson_coefficients,
    pressure_rhs,
)
from naviflow_tpu.solvers.pressure import (
    JacobiPressureConfig,
    RBGSPressureConfig,
    solve_pressure,
)

RNG = np.random.default_rng(7)


def _manufactured_system(nx, ny, variant="consistent"):
    """Build A from random d-fields and b = A p_exact (unpinned)."""
    d_u = RNG.random((nx + 1, ny)) + 0.5
    d_v = RNG.random((nx, ny + 1)) + 0.5
    c = poisson_coefficients(jnp.asarray(d_u), jnp.asarray(d_v),
                             dx=0.1, dy=0.1, rho=1.0, variant=variant)
    p_exact = jnp.asarray(RNG.normal(size=(nx, ny)))
    b = apply_poisson(p_exact, c, pinned=False)
    return c, p_exact, b


@pytest.mark.parametrize("cfg", [
    JacobiPressureConfig(tolerance=1e-10, max_iterations=200000, omega=0.8),
    RBGSPressureConfig(tolerance=1e-10, max_iterations=100000, omega=1.5),
])
def test_pressure_solver_recovers_manufactured_solution(cfg):
    nx = ny = 9
    c, p_exact, b = _manufactured_system(nx, ny)
    p, info = solve_pressure(b, c, jnp.zeros((nx, ny), b.dtype), cfg)
    assert float(info.rel_residual) < cfg.tolerance
    # gauge-invariant comparison on the connected component (exclude the
    # disconnected corner cells of the consistent variant): remove each
    # field's interior mean before comparing
    interior = np.s_[1:-1, 1:-1]
    ours = np.asarray(p)[interior]
    exact = np.asarray(p_exact)[interior]
    np.testing.assert_allclose(ours - ours.mean(), exact - exact.mean(),
                               rtol=1e-6, atol=1e-7)


def test_pressure_solver_reports_iterations():
    nx = ny = 9
    c, _, b = _manufactured_system(nx, ny)
    cfg = RBGSPressureConfig(tolerance=1e-6, max_iterations=100000, omega=1.5)
    _, info = solve_pressure(b, c, jnp.zeros((nx, ny), b.dtype), cfg)
    assert int(info.iterations) > 0
    assert info.residual_field.shape == (nx, ny)


def test_pinned_reference_variant_recovers_pinned_solution():
    nx = ny = 9
    d_u = RNG.random((nx + 1, ny)) + 0.5
    d_v = RNG.random((nx, ny + 1)) + 0.5
    c = poisson_coefficients(jnp.asarray(d_u), jnp.asarray(d_v),
                             dx=0.1, dy=0.1, rho=1.0, variant="reference")
    p_exact = jnp.asarray(RNG.normal(size=(nx, ny)))
    p_exact = p_exact.at[0, 0].set(0.0)
    b = apply_poisson(p_exact, c, pinned=True)
    cfg = RBGSPressureConfig(tolerance=1e-11, max_iterations=200000, omega=1.3)
    p, info = solve_pressure(b, c, jnp.zeros((nx, ny), b.dtype), cfg, pin=True)
    assert float(info.rel_residual) < cfg.tolerance
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_exact),
                               rtol=1e-6, atol=1e-7)
