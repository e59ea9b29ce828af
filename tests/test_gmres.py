"""GMRES(m) correctness: manufactured pressure systems and cross-solver
momentum agreement (pattern of reference ``tests/test_matrix_solver.py:230-235``
— ``allclose(u_bicg, u_gmres)``)."""

import numpy as np
import jax.numpy as jnp
import pytest

import naviflow_tpu as nf
from naviflow_tpu.ops.poisson import apply_poisson, poisson_coefficients
from naviflow_tpu.solvers import (
    GMRESMomentumConfig,
    GMRESPressureConfig,
    IDRSMomentumConfig,
    KrylovMomentumConfig,
    gmres_solve,
    solve_pressure_krylov,
)
from naviflow_tpu.solvers.momentum import solve_u_momentum, solve_v_momentum

RNG = np.random.default_rng(11)


def _manufactured_system(nx, ny, variant="consistent"):
    d_u = RNG.random((nx + 1, ny)) + 0.5
    d_v = RNG.random((nx, ny + 1)) + 0.5
    c = poisson_coefficients(jnp.asarray(d_u), jnp.asarray(d_v),
                             dx=0.1, dy=0.1, rho=1.0, variant=variant)
    p_exact = jnp.asarray(RNG.normal(size=(nx, ny)))
    b = apply_poisson(p_exact, c, pinned=False)
    return c, p_exact, b


@pytest.mark.parametrize("precond", ["none", "jacobi"])
def test_gmres_pressure_recovers_manufactured_solution(precond):
    nx = ny = 9
    c, p_exact, b = _manufactured_system(nx, ny)
    cfg = GMRESPressureConfig(tolerance=1e-10, max_iterations=2000,
                              restart=20, preconditioner=precond)
    p, info = solve_pressure_krylov(b, c, jnp.zeros((nx, ny), b.dtype), cfg)
    assert float(info.rel_residual) < 1e-8
    interior = np.s_[1:-1, 1:-1]
    ours = np.asarray(p)[interior]
    exact = np.asarray(p_exact)[interior]
    np.testing.assert_allclose(ours - ours.mean(), exact - exact.mean(),
                               rtol=1e-6, atol=1e-7)


def test_gmres_core_matches_direct_solve():
    """gmres_solve on a small nonsymmetric diagonally dominant system."""
    n = 12
    A_mat = np.asarray(RNG.normal(size=(n * n, n * n)))
    A_mat = A_mat * 0.05 + np.eye(n * n) * (np.abs(A_mat).sum(1) * 0.1 + 1.0)
    x_exact = RNG.normal(size=(n, n))
    b = (A_mat @ x_exact.ravel()).reshape(n, n)

    b = jnp.asarray(b)
    A_dev = jnp.asarray(A_mat, b.dtype)
    A = lambda x: jnp.reshape(A_dev @ x.reshape(-1), (n, n))
    x, r, k = gmres_solve(b, A, lambda z: z, jnp.zeros((n, n), b.dtype),
                          1e-12, 600, 30)
    np.testing.assert_allclose(np.asarray(x), x_exact, rtol=1e-6, atol=1e-8)
    assert int(k) <= 600


def _cavity_setup(nx=10, re=100.0):
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=re)
    bc = nf.lid_driven_cavity(1.0)
    state = nf.initialize_state(mesh, bc)
    dx, dy = mesh.get_cell_sizes()
    # a non-trivial flow field so the momentum system isn't the identity
    u = state.u + 0.1 * jnp.asarray(RNG.random(state.u.shape))
    v = state.v + 0.1 * jnp.asarray(RNG.random(state.v.shape))
    p = jnp.asarray(RNG.random(state.p.shape)) * 0.01
    return u, v, p, dx, dy, fluid, bc


def test_momentum_cross_solver_agreement():
    """BiCGSTAB, GMRES and IDR(s) momentum predictors agree to tight
    tolerance on the same relaxed system (reference
    ``test_matrix_solver.py:230-235``)."""
    u, v, p, dx, dy, fluid, bc = _cavity_setup()
    kw = dict(dx=dx, dy=dy, rho=fluid.get_density(), mu=fluid.get_viscosity(),
              alpha=0.7, bc=bc)
    cfgs = {
        "bicgstab": KrylovMomentumConfig(tolerance=1e-12, max_iterations=400),
        "gmres": GMRESMomentumConfig(tolerance=1e-12, max_iterations=400,
                                     restart=20),
        "idrs": IDRSMomentumConfig(tolerance=1e-12, max_iterations=200),
    }
    u_stars = {}
    v_stars = {}
    for name, cfg in cfgs.items():
        u_star, d_u, _, _ = solve_u_momentum(u, v, p, cfg=cfg, **kw)
        v_star, d_v, _, _ = solve_v_momentum(u, v, p, cfg=cfg, **kw)
        assert np.isfinite(np.asarray(u_star)).all()
        u_stars[name] = np.asarray(u_star)
        v_stars[name] = np.asarray(v_star)
    np.testing.assert_allclose(u_stars["gmres"], u_stars["bicgstab"],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(v_stars["gmres"], v_stars["bicgstab"],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(u_stars["idrs"], u_stars["bicgstab"],
                               rtol=1e-6, atol=1e-8)


def test_gmres_momentum_solves_relaxed_system():
    """The GMRES momentum predictor drives the *relaxed* system residual
    (the linear system it actually solves — ``momentum.py`` contract) to the
    requested tolerance on the solved nodes."""
    from naviflow_tpu.core.bc import apply_velocity_bcs
    from naviflow_tpu.ops.powerlaw import relax_coefficients, u_momentum_coefficients
    from naviflow_tpu.ops.stencil import apply_stencil
    from naviflow_tpu.solvers.momentum import _u_interior_mask

    u, v, p, dx, dy, fluid, bc = _cavity_setup()
    kw = dict(dx=dx, dy=dy, rho=fluid.get_density(), mu=fluid.get_viscosity(),
              alpha=0.7, bc=bc)
    cfg = GMRESMomentumConfig(tolerance=1e-11, max_iterations=400, restart=20)
    u_star, _, _, _ = solve_u_momentum(u, v, p, cfg=cfg, **kw)

    ub, vb = apply_velocity_bcs(u, v, bc)
    c_un = u_momentum_coefficients(ub, vb, p, dx=dx, dy=dy,
                                   rho=fluid.get_density(),
                                   mu=fluid.get_viscosity())
    c_rel = relax_coefficients(c_un, ub, 0.7)
    mask = np.asarray(_u_interior_mask(u.shape))
    r = np.asarray(c_rel.src - apply_stencil(u_star, c_rel))[mask]
    bnorm = np.linalg.norm(np.asarray(c_rel.src)[mask])
    assert np.linalg.norm(r) <= 1e-9 * max(bnorm, 1.0)


def test_batched_pair_bicgstab_matches_sequential():
    """The batched u+v BiCGSTAB (one Krylov loop, per-system freeze —
    solvers/momentum._bicgstab_pair_masked) returns the same predictors,
    d-coefficients and residual norms as the sequential per-field solves,
    to reduction-reassociation roundoff."""
    from naviflow_tpu.solvers.momentum import solve_momentum_pair

    u, v, p, dx, dy, fluid, bc = _cavity_setup(nx=24)
    kw = dict(dx=dx, dy=dy, rho=fluid.get_density(),
              mu=fluid.get_viscosity(), alpha=0.7, bc=bc)
    cfg_pair = KrylovMomentumConfig(tolerance=1e-10, max_iterations=300,
                                    batch_pair="auto")
    cfg_seq = KrylovMomentumConfig(tolerance=1e-10, max_iterations=300,
                                   batch_pair="off")
    (us_p, du_p, ru_p, un_p), (vs_p, dv_p, rv_p, vn_p) = solve_momentum_pair(
        u, v, p, cfg=cfg_pair, **kw)
    (us_s, du_s, ru_s, un_s), (vs_s, dv_s, rv_s, vn_s) = solve_momentum_pair(
        u, v, p, cfg=cfg_seq, **kw)
    np.testing.assert_allclose(np.asarray(us_p), np.asarray(us_s),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(vs_p), np.asarray(vs_s),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(du_p), np.asarray(du_s), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv_s), rtol=1e-12)
    np.testing.assert_allclose(float(un_p), float(un_s), rtol=1e-4, atol=1e-10)
    np.testing.assert_allclose(float(vn_p), float(vn_s), rtol=1e-4, atol=1e-10)


def test_batched_pair_loose_tolerance_freeze():
    """At a loose tolerance the two systems converge at different
    iterations; the per-system freeze must stop each at ITS tolerance
    (iterates match the independent solves, not over-iterated ones)."""
    from naviflow_tpu.core.bc import apply_velocity_bcs
    from naviflow_tpu.ops.powerlaw import (relax_coefficients,
                                           u_momentum_coefficients,
                                           v_momentum_coefficients)
    from naviflow_tpu.solvers.momentum import (_bicgstab_masked,
                                               _bicgstab_pair_masked,
                                               _u_interior_mask,
                                               _v_interior_mask)

    u, v, p, dx, dy, fluid, bc = _cavity_setup(nx=16)
    ub, vb = apply_velocity_bcs(u, v, bc)
    kw = dict(dx=dx, dy=dy, rho=fluid.get_density(),
              mu=fluid.get_viscosity())
    cu = relax_coefficients(u_momentum_coefficients(ub, vb, p, **kw), ub, 0.7)
    cv = relax_coefficients(v_momentum_coefficients(ub, vb, p, **kw), vb, 0.7)
    mu_m, mv_m = _u_interior_mask(ub.shape), _v_interior_mask(vb.shape)
    for tol in (1e-3, 1e-6):
        us_b, vs_b = _bicgstab_pair_masked(ub, cu, mu_m, vb, cv, mv_m,
                                           tol, 200)
        us_s = _bicgstab_masked(ub, cu, mu_m, tol, 200)
        vs_s = _bicgstab_masked(vb, cv, mv_m, tol, 200)
        np.testing.assert_allclose(np.asarray(us_b), np.asarray(us_s),
                                   rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(vs_b), np.asarray(vs_s),
                                   rtol=1e-5, atol=1e-8)
