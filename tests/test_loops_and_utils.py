"""Loop-mode equivalence and smoother-analysis utilities."""

import jax
import jax.numpy as jnp
import numpy as np

import naviflow_tpu as nf
from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
from naviflow_tpu.core.bc import apply_velocity_bcs, apply_velocity_bcs_window, lid_driven_cavity
from naviflow_tpu.ops.poisson import poisson_coefficients
from naviflow_tpu.ops.stencil9 import from_poisson
from naviflow_tpu.solvers import KrylovMomentumConfig, RBGSPressureConfig
from naviflow_tpu.solvers.chebyshev import (
    estimate_lambda_max,
    estimate_smoother_spectral_radius,
    optimal_jacobi_omega,
)

RNG = np.random.default_rng(9)


def test_chunked_loop_matches_fused():
    mesh = nf.StructuredMesh(nx=31, ny=31)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
    bc = lid_driven_cavity(1.0)
    state = nf.initialize_state(mesh, bc, dtype=jnp.float64)
    cfg = SIMPLEConfig(max_iterations=500, tolerance=1e-5)
    mom = KrylovMomentumConfig(tolerance=1e-10, max_iterations=100)
    pres = RBGSPressureConfig(tolerance=1e-7, max_iterations=50000, omega=1.5)
    f_fused, d_fused = simple_solve(mesh, fluid, bc, state, cfg,
                                    momentum=mom, pressure=pres, loop="fused")
    boundaries = []
    f_ch, d_ch = simple_solve(
        mesh, fluid, bc, state, cfg, momentum=mom, pressure=pres,
        loop="chunked:37", on_chunk=lambda it, tot, c: boundaries.append(it),
    )
    assert int(d_fused.iterations) == int(d_ch.iterations)
    np.testing.assert_allclose(np.asarray(f_fused.u), np.asarray(f_ch.u),
                               rtol=0, atol=1e-9)
    assert boundaries and boundaries[0] == 37


def test_on_chunk_early_stop():
    mesh = nf.StructuredMesh(nx=15, ny=15)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
    bc = lid_driven_cavity(1.0)
    state = nf.initialize_state(mesh, bc)
    cfg = SIMPLEConfig(max_iterations=1000, tolerance=1e-12)
    _, diag = simple_solve(
        mesh, fluid, bc, state, cfg,
        momentum=KrylovMomentumConfig(tolerance=1e-6, max_iterations=30),
        pressure=RBGSPressureConfig(tolerance=1e-5, max_iterations=5000),
        loop="chunked:10", on_chunk=lambda it, tot, c: False,
    )
    assert int(diag.iterations) == 10  # stopped at the first boundary


def test_lambda_max_of_poisson_operator():
    """For the 5-point Laplacian, lambda_max(D^-1 A) -> 2 as h -> 0."""
    nx = 33
    d_u = jnp.ones((nx + 1, nx), jnp.float64)
    d_v = jnp.ones((nx, nx + 1), jnp.float64)
    c = poisson_coefficients(d_u, d_v, dx=1.0, dy=1.0, rho=1.0, variant="symmetric")
    lam = float(estimate_lambda_max(from_poisson(c), (nx, nx), iterations=80))
    assert 1.8 < lam <= 2.01, lam
    # optimal damped-Jacobi weight for [0, lam]: 2/lam ~= 1
    assert 0.95 < float(optimal_jacobi_omega(lam)) < 1.15
    # the smoother radius at omega=2/3 must be < 1 (convergent smoother)
    rho = float(estimate_smoother_spectral_radius(from_poisson(c), (nx, nx), 2.0 / 3.0))
    assert rho < 1.0


def test_bc_window_matches_global():
    nx = ny = 12
    bc = lid_driven_cavity(1.0).with_condition("left", "velocity", {"v": 0.3})
    u = jnp.asarray(RNG.normal(size=(nx + 1, ny)))
    v = jnp.asarray(RNG.normal(size=(nx, ny + 1)))
    ug, vg = apply_velocity_bcs(u, v, bc)
    uw, vw = apply_velocity_bcs_window(u, v, bc, gi0=0, gj0=0, nx=nx, ny=ny)
    np.testing.assert_array_equal(np.asarray(ug), np.asarray(uw))
    np.testing.assert_array_equal(np.asarray(vg), np.asarray(vw))
