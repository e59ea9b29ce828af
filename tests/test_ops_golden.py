"""Operator-equivalence tests: JAX kernels vs independent NumPy golden oracles.

Pattern follows the reference's ``main_scripts/matrix_free_sanity.py`` —
random coefficient fields, exact agreement between formulations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from naviflow_tpu.ops import (
    apply_poisson,
    apply_stencil,
    d_coefficient,
    max_interior_divergence,
    poisson_coefficients,
    poisson_diagonal,
    pressure_rhs,
    relax_coefficients,
    u_momentum_coefficients,
    v_momentum_coefficients,
)
from naviflow_tpu.core.bc import apply_velocity_bcs, lid_driven_cavity

import golden


RNG = np.random.default_rng(42)


def _random_fields(nx, ny, lid=1.0):
    """Random interior velocities with cavity BCs applied, random pressure."""
    u = RNG.normal(size=(nx + 1, ny))
    v = RNG.normal(size=(nx, ny + 1))
    u[0, :] = u[nx, :] = 0.0
    u[:, 0] = 0.0
    u[:, ny - 1] = lid
    v[0, :] = v[nx - 1, :] = 0.0
    v[:, 0] = v[:, ny] = 0.0
    p = RNG.normal(size=(nx, ny))
    return u, v, p


@pytest.mark.parametrize("nx,ny", [(8, 8), (9, 7), (16, 16)])
def test_u_coefficients_match_golden(nx, ny):
    u, v, p = _random_fields(nx, ny)
    dx, dy, rho, mu = 1.0 / (nx - 1), 1.0 / (ny - 1), 1.0, 0.01
    ours = u_momentum_coefficients(jnp.asarray(u), jnp.asarray(v), jnp.asarray(p),
                                   dx=dx, dy=dy, rho=rho, mu=mu)
    ref = golden.golden_u_coefficients(u, v, p, dx, dy, rho, mu)
    for name, mine in [("a_e", ours.a_e), ("a_w", ours.a_w), ("a_n", ours.a_n),
                       ("a_s", ours.a_s), ("a_p", ours.a_p), ("src", ours.src)]:
        np.testing.assert_allclose(np.asarray(mine), ref[name], rtol=1e-12, atol=1e-14,
                                   err_msg=f"u-coefficient {name} mismatch")


@pytest.mark.parametrize("nx,ny", [(8, 8), (9, 7), (16, 16)])
def test_v_coefficients_match_golden(nx, ny):
    u, v, p = _random_fields(nx, ny)
    dx, dy, rho, mu = 1.0 / (nx - 1), 1.0 / (ny - 1), 1.0, 0.01
    ours = v_momentum_coefficients(jnp.asarray(u), jnp.asarray(v), jnp.asarray(p),
                                   dx=dx, dy=dy, rho=rho, mu=mu)
    ref = golden.golden_v_coefficients(u, v, p, dx, dy, rho, mu)
    for name, mine in [("a_e", ours.a_e), ("a_w", ours.a_w), ("a_n", ours.a_n),
                       ("a_s", ours.a_s), ("a_p", ours.a_p), ("src", ours.src)]:
        np.testing.assert_allclose(np.asarray(mine), ref[name], rtol=1e-12, atol=1e-14,
                                   err_msg=f"v-coefficient {name} mismatch")


def test_momentum_stencil_apply_matches_golden():
    nx, ny = 10, 9
    u, v, p = _random_fields(nx, ny)
    dx, dy = 1.0 / (nx - 1), 1.0 / (ny - 1)
    c = u_momentum_coefficients(jnp.asarray(u), jnp.asarray(v), jnp.asarray(p),
                                dx=dx, dy=dy, rho=1.0, mu=0.01)
    x = RNG.normal(size=(nx + 1, ny))
    ours = np.asarray(apply_stencil(jnp.asarray(x), c))
    cd = {k: np.asarray(getattr(c, k if k != "a_p" else "a_p")) for k in
          ("a_e", "a_w", "a_n", "a_s", "a_p")}
    ref = golden.golden_stencil_matvec(x, cd)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("pin", [True, False])
@pytest.mark.parametrize("variant", ["reference", "symmetric"])
def test_poisson_matvec_matches_dense(pin, variant):
    nx, ny = 10, 10
    d_u = RNG.random((nx + 1, ny)) + 0.1
    d_v = RNG.random((nx, ny + 1)) + 0.1
    dx = dy = 1.0
    c = poisson_coefficients(jnp.asarray(d_u), jnp.asarray(d_v),
                             dx=dx, dy=dy, rho=1.0, variant=variant)
    p = RNG.normal(size=(nx, ny))
    ours = np.asarray(apply_poisson(jnp.asarray(p), c, pinned=pin))
    A = golden.golden_pressure_matrix(d_u, d_v, dx, dy, 1.0, pin=pin, variant=variant)
    ref_flat = A @ golden.fortran_flatten(p)
    np.testing.assert_allclose(golden.fortran_flatten(ours), ref_flat,
                               rtol=1e-12, atol=1e-13)


def test_symmetric_variant_is_symmetric_and_reference_is_not():
    nx, ny = 8, 8
    d_u = RNG.random((nx + 1, ny)) + 0.1
    d_v = RNG.random((nx, ny + 1)) + 0.1
    A_sym = golden.golden_pressure_matrix(d_u, d_v, 1.0, 1.0, 1.0, pin=False,
                                          variant="symmetric")
    assert np.abs(A_sym - A_sym.T).max() < 1e-13
    A_ref = golden.golden_pressure_matrix(d_u, d_v, 1.0, 1.0, 1.0, pin=False,
                                          variant="reference")
    assert np.abs(A_ref - A_ref.T).max() > 1e-6  # the reference fold is asymmetric


def test_rhs_matches_golden():
    nx, ny = 12, 11
    u, v, _ = _random_fields(nx, ny)
    dx, dy = 1.0 / (nx - 1), 1.0 / (ny - 1)
    ours = np.asarray(pressure_rhs(jnp.asarray(u), jnp.asarray(v), dx=dx, dy=dy, rho=1.3))
    ref = golden.golden_rhs(u, v, dx, dy, 1.3)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-14)


def test_relaxation_and_d_coefficient():
    nx, ny = 9, 9
    u, v, p = _random_fields(nx, ny)
    dx, dy = 1.0 / (nx - 1), 1.0 / (ny - 1)
    alpha = 0.7
    c = u_momentum_coefficients(jnp.asarray(u), jnp.asarray(v), jnp.asarray(p),
                                dx=dx, dy=dy, rho=1.0, mu=0.01)
    cr = relax_coefficients(c, jnp.asarray(u), alpha)
    # a_p_rel = a_p/alpha on solved rows
    np.testing.assert_allclose(np.asarray(cr.a_p[1:nx, :]),
                               np.asarray(c.a_p[1:nx, :]) / alpha, rtol=1e-12)
    # src_rel = src + (1-alpha) a_p_rel u_old
    np.testing.assert_allclose(
        np.asarray(cr.src[1:nx, :]),
        np.asarray(c.src[1:nx, :]) + (1 - alpha) * np.asarray(cr.a_p[1:nx, :]) * u[1:nx, :],
        rtol=1e-12,
    )
    d_u = d_coefficient(cr.a_p, dy, is_u=True)
    # d = alpha*dy/a_p_unrelaxed on solved rows; zero on boundary rows
    np.testing.assert_allclose(np.asarray(d_u[1:nx, :]),
                               alpha * dy / np.asarray(c.a_p[1:nx, :]), rtol=1e-12)
    assert np.all(np.asarray(d_u[0, :]) == 0) and np.all(np.asarray(d_u[nx, :]) == 0)


def test_bc_application_cavity():
    nx, ny = 7, 7
    bc = lid_driven_cavity(1.0)
    u = jnp.asarray(RNG.normal(size=(nx + 1, ny)))
    v = jnp.asarray(RNG.normal(size=(nx, ny + 1)))
    u2, v2 = apply_velocity_bcs(u, v, bc)
    u2, v2 = np.asarray(u2), np.asarray(v2)
    assert np.all(u2[:, ny - 1] == 1.0)  # lid
    assert np.all(u2[0, 1:ny-1] == 0) and np.all(u2[nx, 1:ny-1] == 0) and np.all(u2[:, 0] == 0)
    assert u2[0, ny - 1] == 1.0 and u2[nx, ny - 1] == 1.0  # lid owns corners
    assert np.all(v2[:, ny] == 0) and np.all(v2[:, 0] == 0)
    assert np.all(v2[0, :] == 0) and np.all(v2[nx - 1, :] == 0)
    # interior untouched
    np.testing.assert_array_equal(u2[1:nx, 1 : ny - 1], np.asarray(u[1:nx, 1 : ny - 1]))


def test_divergence_of_linear_field():
    nx = ny = 16
    dx = dy = 1.0 / (nx - 1)
    # u = x, v = -y  =>  div = 0
    xf = np.arange(nx + 1) * dx
    yc = (np.arange(ny) + 0.5) * dy
    u = np.broadcast_to(xf[:, None], (nx + 1, ny)).copy()
    yf = np.arange(ny + 1) * dy
    v = np.broadcast_to(-yf[None, :], (nx, ny + 1)).copy()
    md = float(max_interior_divergence(jnp.asarray(u), jnp.asarray(v), dx=dx, dy=dy))
    assert md < 1e-12
