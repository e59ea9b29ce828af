"""Strip-blocked Chebyshev momentum kernel vs the XLA composition
(interpret mode; hardware iteration parity runs in
benchmarks/strip_parity_check.py)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

import naviflow_tpu as nf
from naviflow_tpu.core.bc import apply_velocity_bcs
from naviflow_tpu.ops.pallas_cheby import chebyshev_momentum_strips
from naviflow_tpu.ops.powerlaw import relax_coefficients
from naviflow_tpu.ops.stencil import apply_stencil, interior_mask
from naviflow_tpu.solvers.momentum import (
    ChebyshevMomentumConfig,
    _assemble_coeffs,
    _chebyshev_bounds,
    _chebyshev_iterate,
    _u_interior_mask,
    _v_interior_mask,
    solve_u_momentum,
    solve_v_momentum,
)

ALPHA = 0.7


def _cavity_fields(nx, ny, seed=3):
    rng = np.random.default_rng(seed)
    mesh = nf.StructuredMesh(nx=nx, ny=ny)
    bc = nf.lid_driven_cavity(1.0)
    st = nf.initialize_state(mesh, bc, dtype=jnp.float32)
    u = jnp.asarray(st.u + 0.1 * rng.normal(size=st.u.shape), jnp.float32)
    v = jnp.asarray(st.v + 0.1 * rng.normal(size=st.v.shape), jnp.float32)
    p = jnp.asarray(rng.normal(size=st.p.shape), jnp.float32)
    u, v = apply_velocity_bcs(u, v, bc)
    kw = dict(dx=1.0 / (nx - 1), dy=1.0 / (ny - 1), rho=1.0, mu=0.01)
    return mesh, bc, u, v, p, kw


@pytest.mark.parametrize("degree", [4, 6])
@pytest.mark.parametrize("is_u", [True, False])
def test_kernel_matches_xla_iterate(degree, is_u):
    """x* and the masked unrelaxed residual from the strip kernel equal
    the whole-array XLA composition (window shifts + halo exactness)."""
    nx = ny = 64
    _, _, u, v, p, kw = _cavity_fields(nx, ny)
    c_un = _assemble_coeffs(u, v, p, scheme="power_law", is_u=is_u, **kw)
    x0 = u if is_u else v
    c_rel = relax_coefficients(c_un, x0, ALPHA)
    mask = _u_interior_mask(u.shape) if is_u else _v_interior_mask(v.shape)
    theta, delta, sigma1 = _chebyshev_bounds(c_rel, mask)

    want_x = _chebyshev_iterate(x0, c_rel, mask, theta, delta, sigma1, degree)
    want_r = jnp.where(mask, c_un.src - apply_stencil(want_x, c_un), 0.0)

    got_x, got_r = chebyshev_momentum_strips(
        x0, c_rel, c_un, theta=theta, delta=delta, sigma1=sigma1,
        degree=degree, interpret=True)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=2e-5, atol=2e-5)


def test_kernel_rectangular_padding():
    """Non-square grid exercises the row padding (R_pad > NI) and the
    128-lane column padding."""
    nx, ny = 96, 72
    _, _, u, v, p, kw = _cavity_fields(nx, ny, seed=11)
    c_un = _assemble_coeffs(u, v, p, scheme="power_law", is_u=True, **kw)
    c_rel = relax_coefficients(c_un, u, ALPHA)
    mask = _u_interior_mask(u.shape)
    theta, delta, sigma1 = _chebyshev_bounds(c_rel, mask)
    want = _chebyshev_iterate(u, c_rel, mask, theta, delta, sigma1, 5)
    got, _ = chebyshev_momentum_strips(
        u, c_rel, c_un, theta=theta, delta=delta, sigma1=sigma1,
        degree=5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_integrated_solver_parity(monkeypatch):
    """solve_u/v_momentum through the strip path == the XLA path: same
    (x*, d, residual field, residual norm) — this also pins that the
    in-kernel pre-BC residual equals the post-BC XLA residual (the BC
    slabs are constants the masked solve never touches)."""
    import naviflow_tpu.ops.pallas_cheby as pc

    monkeypatch.setattr(pc, "supports_cheby_strips", lambda *a: True)
    monkeypatch.setattr(
        pc, "chebyshev_momentum_strips",
        functools.partial(chebyshev_momentum_strips, interpret=True))

    nx = ny = 64
    _, bc, u, v, p, kw = _cavity_fields(nx, ny, seed=7)
    cfg_strip = ChebyshevMomentumConfig(degree=4)
    cfg_xla = ChebyshevMomentumConfig(degree=4, backend="xla")
    for solve, args in ((solve_u_momentum, (u, v, p)),
                        (solve_v_momentum, (u, v, p))):
        got = solve(*args, alpha=ALPHA, bc=bc, cfg=cfg_strip, **kw)
        want = solve(*args, alpha=ALPHA, bc=bc, cfg=cfg_xla, **kw)
        for g, w, name in zip(got, want, ("x", "d", "rf", "norm")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-5, atol=2e-5, err_msg=name)
