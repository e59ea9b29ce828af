"""Distributed SIMPLE on an 8-device virtual CPU mesh vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import naviflow_tpu as nf
from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
from naviflow_tpu.parallel.decompose import (
    Decomp,
    from_blocked_u,
    from_blocked_v,
    to_blocked_u,
    to_blocked_v,
)
from naviflow_tpu.parallel.dist_simple import (
    DistributedConfig,
    distributed_simple_solve,
)
from naviflow_tpu.parallel.sharding import make_device_mesh
from naviflow_tpu.postprocessing.validation import infinity_norm_error
from naviflow_tpu.solvers import JacobiMomentumConfig, CGPressureConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_blocked_layout_roundtrip():
    nx = ny = 16
    u = jnp.asarray(np.random.default_rng(0).normal(size=(nx + 1, ny)))
    v = jnp.asarray(np.random.default_rng(1).normal(size=(nx, ny + 1)))
    ub = to_blocked_u(u, 4)
    assert ub.shape == (4 * 5, ny)
    np.testing.assert_array_equal(np.asarray(from_blocked_u(ub, 4)), np.asarray(u))
    vb = to_blocked_v(v, 2)
    assert vb.shape == (nx, 2 * 9)
    np.testing.assert_array_equal(np.asarray(from_blocked_v(vb, 2)), np.asarray(v))


def test_distributed_simple_matches_single_device():
    """One full solve on a 2x4 mesh must converge to the single-device
    solution (same discrete problem, same physics)."""
    nx = ny = 32  # divisible by the mesh; MG not needed here
    mesh = nf.StructuredMesh(nx=nx, ny=ny)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
    bc = nf.lid_driven_cavity(1.0)
    state = nf.initialize_state(mesh, bc, dtype=jnp.float64)

    dmesh = make_device_mesh(8)  # (2, 4)
    final_d, diag_d = distributed_simple_solve(
        mesh, fluid, bc, state, dmesh,
        DistributedConfig(max_iterations=3000, tolerance=1e-5,
                          momentum_sweeps=2, pressure_solver="cg",
                          pressure_tol=1e-8, pressure_max_iter=4000),
    )
    assert diag_d["converged"], diag_d["final_residual"]

    final_s, diag_s = simple_solve(
        mesh, fluid, bc, state,
        SIMPLEConfig(max_iterations=3000, tolerance=1e-5),
        momentum=JacobiMomentumConfig(n_sweeps=2),
        pressure=CGPressureConfig(tolerance=1e-8, max_iterations=4000),
        loop="fused",
    )
    assert bool(diag_s.converged)

    # same converged flow field (both stopped at outer tol 1e-5, so the
    # fields each sit O(tol) from the common fixed point)
    du = float(jnp.max(jnp.abs(final_d.u - final_s.u)))
    dv = float(jnp.max(jnp.abs(final_d.v - final_s.v)))
    assert du < 3e-4 and dv < 3e-4, (du, dv)

    # physics sanity on the distributed result
    assert infinity_norm_error(final_d.u, final_d.v, mesh, 100) < 0.15


def test_distributed_mgcg_pressure_converges():
    """Hybrid distributed multigrid-CG: distributed fine smoothing +
    replicated coarse hierarchy (SURVEY §7 MG level redistribution)."""
    nx = ny = 32
    mesh = nf.StructuredMesh(nx=nx, ny=ny)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
    bc = nf.lid_driven_cavity(1.0)
    state = nf.initialize_state(mesh, bc, dtype=jnp.float64)
    dmesh = make_device_mesh(8)
    final, diag = distributed_simple_solve(
        mesh, fluid, bc, state, dmesh,
        DistributedConfig(max_iterations=2500, tolerance=1e-4,
                          pressure_solver="mgcg",
                          pressure_tol=1e-8, pressure_max_iter=40),
    )
    assert diag["converged"], diag["final_residual"]
    assert infinity_norm_error(final.u, final.v, mesh, 100) < 0.15


def test_distributed_rbgs_pressure_converges():
    nx = ny = 16
    mesh = nf.StructuredMesh(nx=nx, ny=ny)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
    bc = nf.lid_driven_cavity(1.0)
    state = nf.initialize_state(mesh, bc, dtype=jnp.float64)
    dmesh = make_device_mesh(4, shape=(2, 2))
    final, diag = distributed_simple_solve(
        mesh, fluid, bc, state, dmesh,
        DistributedConfig(max_iterations=4000, tolerance=1e-4,
                          momentum_sweeps=2, pressure_solver="rbgs",
                          pressure_tol=1e-7, pressure_max_iter=20000),
    )
    assert diag["converged"], diag["final_residual"]
