"""Merged assemble+solve Chebyshev kernel vs the XLA composition
(interpret mode; hardware residual-trajectory parity runs in
benchmarks/asmcheby_probe.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import naviflow_tpu as nf
from naviflow_tpu.core.bc import apply_velocity_bcs
from naviflow_tpu.ops.pallas_asmcheby import fused_asmcheby_pair
from naviflow_tpu.ops.poisson import poisson_coefficients
from naviflow_tpu.ops.powerlaw import (
    d_coefficient,
    relax_coefficients,
    u_momentum_coefficients,
    v_momentum_coefficients,
)
from naviflow_tpu.ops.stencil import apply_stencil, interior_mask
from naviflow_tpu.solvers.momentum import (
    _bounds_from_rho,
    _chebyshev_bounds,
    _chebyshev_iterate,
    _u_interior_mask,
    _v_interior_mask,
)

ALPHA = 0.7


def _cavity_fields(nx, ny, seed=7):
    rng = np.random.default_rng(seed)
    mesh = nf.StructuredMesh(nx=nx, ny=ny)
    bc = nf.lid_driven_cavity(1.0)
    st = nf.initialize_state(mesh, bc, dtype=jnp.float32)
    u = jnp.asarray(st.u + 0.1 * rng.normal(size=st.u.shape), jnp.float32)
    v = jnp.asarray(st.v + 0.1 * rng.normal(size=st.v.shape), jnp.float32)
    p = jnp.asarray(rng.normal(size=st.p.shape), jnp.float32)
    u, v = apply_velocity_bcs(u, v, bc)
    kw = dict(dx=1.0 / (nx - 1), dy=1.0 / (ny - 1), rho=1.0, mu=0.01)
    return u, v, p, kw


@pytest.mark.parametrize("degree", [4, 6])
@pytest.mark.parametrize("variant", ["consistent", "symmetric"])
def test_merged_kernel_matches_xla_composition(degree, variant):
    """Given the SAME interval scalars, the merged kernel's x*, masked
    residuals, d-coefficients, pressure operator, and fresh Gershgorin
    maxima all equal the XLA composition (assembly -> relax -> iterate ->
    residual -> folds) to FMA-contraction tolerance."""
    nx = ny = 64
    u, v, p, kw = _cavity_fields(nx, ny)

    cu_un = u_momentum_coefficients(u, v, p, **kw)
    cu_rel = relax_coefficients(cu_un, u, ALPHA)
    cv_un = v_momentum_coefficients(u, v, p, **kw)
    cv_rel = relax_coefficients(cv_un, v, ALPHA)
    mask_u, mask_v = _u_interior_mask(u.shape), _v_interior_mask(v.shape)

    # the XLA bounds expose the raw rho through _bounds_from_rho's input;
    # recover it the same way the production carry would supply it
    def raw_rho(c_un, c_rel, mask):
        safe = jnp.where(c_rel.a_p == 0, jnp.ones_like(c_rel.a_p),
                         c_rel.a_p)
        nb = (jnp.abs(c_un.a_e) + jnp.abs(c_un.a_w)
              + jnp.abs(c_un.a_n) + jnp.abs(c_un.a_s))
        return jnp.max(jnp.where(mask, nb / safe, 0.0))

    rho_u, rho_v = raw_rho(cu_un, cu_rel, mask_u), raw_rho(cv_un, cv_rel,
                                                           mask_v)
    bounds_u = _bounds_from_rho(rho_u, 1.05)
    bounds_v = _bounds_from_rho(rho_v, 1.05)

    want_xu = _chebyshev_iterate(u, cu_rel, mask_u, *bounds_u, degree)
    want_ru = jnp.where(mask_u, cu_un.src - apply_stencil(want_xu, cu_un),
                        0.0)
    want_ru = jnp.where(interior_mask(want_ru.shape, 2, 2, 1, 1), want_ru,
                        0.0)
    want_xv = _chebyshev_iterate(v, cv_rel, mask_v, *bounds_v, degree)
    want_rv = jnp.where(mask_v, cv_un.src - apply_stencil(want_xv, cv_un),
                        0.0)
    want_rv = jnp.where(interior_mask(want_rv.shape, 1, 1, 2, 2), want_rv,
                        0.0)
    want_du = d_coefficient(cu_rel.a_p, kw["dy"], is_u=True)
    want_dv = d_coefficient(cv_rel.a_p, kw["dx"], is_u=False)
    want_pc = poisson_coefficients(want_du, want_dv, dx=kw["dx"],
                                   dy=kw["dy"], rho=kw["rho"],
                                   variant=variant)

    (got_xu, got_ru, got_xv, got_rv, got_du, got_dv, got_pc,
     got_rho_u, got_rho_v) = fused_asmcheby_pair(
        u, v, p, alpha=ALPHA, degree=degree, bounds_u=bounds_u,
        bounds_v=bounds_v, poisson_variant=variant, interpret=True, **kw)

    got_ru = jnp.where(interior_mask(got_ru.shape, 2, 2, 1, 1), got_ru, 0.0)
    got_rv = jnp.where(interior_mask(got_rv.shape, 1, 1, 2, 2), got_rv, 0.0)

    def close(a, b, tol=2e-5):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        assert float(jnp.max(jnp.abs(a - b))) / scale < tol

    close(got_xu, want_xu)
    close(got_xv, want_xv)
    close(got_ru, want_ru, tol=5e-5)
    close(got_rv, want_rv, tol=5e-5)
    close(got_du, want_du)
    close(got_dv, want_dv)
    for name in ("a_e", "a_w", "a_n", "a_s", "diag"):
        close(getattr(got_pc, name), getattr(want_pc, name))
    close(got_rho_u, rho_u, tol=1e-6)
    close(got_rho_v, rho_v, tol=1e-6)


def test_solve_momentum_pair_lagged_rho_interpret(monkeypatch):
    """The lagged-rho branch of solve_momentum_pair returns the same
    (x*, d, r, norm) tuple structure as the plain path, with the fourth
    element carrying fresh maxima — interpret mode, gates forced."""
    import naviflow_tpu.ops.pallas_asmcheby as pa
    import naviflow_tpu.solvers.momentum as mom

    monkeypatch.setattr(pa, "supports_asmcheby", lambda *a: True)
    real = pa.fused_asmcheby_pair
    monkeypatch.setattr(
        pa, "fused_asmcheby_pair",
        lambda *a, **k: real(*a, **{**k, "interpret": True}))

    nx = ny = 64
    u, v, p, kw = _cavity_fields(nx, ny)
    bc = nf.lid_driven_cavity(1.0)
    cfg = mom.ChebyshevMomentumConfig(degree=4)

    out = mom.solve_momentum_pair(u, v, p, alpha=ALPHA, bc=bc, cfg=cfg,
                                  poisson_variant="consistent",
                                  lagged_rho=(jnp.float32(0.999),
                                              jnp.float32(0.999)), **kw)
    (u_star, d_u, r_u, u_norm), (v_star, d_v, r_v, v_norm), pc, rho2 = out
    assert u_star.shape == u.shape and v_star.shape == v.shape
    assert jnp.isfinite(u_norm) and jnp.isfinite(v_norm)
    # fresh maxima are the physical Gershgorin ratios (~alpha), far from
    # the conservative 0.999 bootstrap
    assert 0.1 < float(rho2[0]) < 0.999 and 0.1 < float(rho2[1]) < 0.999

    # a second call with the fresh maxima must tighten the solve: its
    # unrelaxed residual norm should beat the 0.999-bootstrap call's
    out2 = mom.solve_momentum_pair(u, v, p, alpha=ALPHA, bc=bc, cfg=cfg,
                                   poisson_variant="consistent",
                                   lagged_rho=rho2, **kw)
    assert float(out2[0][3]) < float(u_norm)
