"""Strip-fused momentum assembly vs the global XLA assembly (interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

import naviflow_tpu as nf
from naviflow_tpu.ops.pallas_assembly import fused_assembly_pair
from naviflow_tpu.ops.powerlaw import (
    relax_coefficients,
    u_momentum_coefficients,
    v_momentum_coefficients,
)

NX = 64
ALPHA = 0.7


def test_fused_assembly_matches_global():
    """Both fields' (unrelaxed, relaxed) coefficient sets from the strip
    kernel == the global ops/powerlaw.py assembly (ULP tolerance for
    cross-program FMA contraction)."""
    rng = np.random.default_rng(9)
    mesh = nf.StructuredMesh(nx=NX, ny=NX)
    bc = nf.lid_driven_cavity(1.0)
    st = nf.initialize_state(mesh, bc, dtype=jnp.float32)
    u = jnp.asarray(st.u + 0.1 * rng.normal(size=st.u.shape), jnp.float32)
    v = jnp.asarray(st.v + 0.1 * rng.normal(size=st.v.shape), jnp.float32)
    p = jnp.asarray(rng.normal(size=st.p.shape), jnp.float32)
    from naviflow_tpu.core.bc import apply_velocity_bcs

    u, v = apply_velocity_bcs(u, v, bc)
    kw = dict(dx=1.0 / (NX - 1), dy=1.0 / (NX - 1), rho=1.0, mu=0.01)

    cu_un_w = u_momentum_coefficients(u, v, p, **kw)
    cu_rel_w = relax_coefficients(cu_un_w, u, ALPHA)
    cv_un_w = v_momentum_coefficients(u, v, p, **kw)
    cv_rel_w = relax_coefficients(cv_un_w, v, ALPHA)

    cu_un, cu_rel, cv_un, cv_rel = fused_assembly_pair(
        u, v, p, alpha=ALPHA, interpret=True, **kw)

    for name, got, want in (
            ("cu_un", cu_un, cu_un_w), ("cu_rel", cu_rel, cu_rel_w),
            ("cv_un", cv_un, cv_un_w), ("cv_rel", cv_rel, cv_rel_w)):
        for field in ("a_e", "a_w", "a_n", "a_s", "a_p", "src"):
            np.testing.assert_allclose(
                np.asarray(getattr(got, field)),
                np.asarray(getattr(want, field)),
                rtol=1e-5, atol=1e-5, err_msg=f"{name}.{field}")

    # with_bounds: the in-kernel Gershgorin fold == the XLA masked ratio
    # max of the relaxed systems (solvers/momentum._chebyshev_bounds raw
    # input) — same compiled kernel, extra (8,128) tiles
    from naviflow_tpu.solvers.momentum import (_u_interior_mask,
                                               _v_interior_mask)

    *_, rho_u, rho_v = fused_assembly_pair(
        u, v, p, alpha=ALPHA, interpret=True, with_bounds=True, **kw)

    def raw_rho(c_rel, mask):
        safe = np.where(c_rel.a_p == 0, 1.0, np.asarray(c_rel.a_p))
        nb = (np.abs(c_rel.a_e) + np.abs(c_rel.a_w)
              + np.abs(c_rel.a_n) + np.abs(c_rel.a_s))
        return np.max(np.where(np.asarray(mask), nb / safe, 0.0))

    np.testing.assert_allclose(
        float(rho_u), raw_rho(cu_rel_w, _u_interior_mask(u.shape)),
        rtol=1e-6, err_msg="rho_u")
    np.testing.assert_allclose(
        float(rho_v), raw_rho(cv_rel_w, _v_interior_mask(v.shape)),
        rtol=1e-6, err_msg="rho_v")


@pytest.mark.parametrize("variant", ["consistent", "symmetric", "reference"])
def test_fused_assembly_poisson_fold(variant):
    """d-coefficients + pressure-correction operator folded into the
    assembly kernel == ops/powerlaw.d_coefficient +
    ops/poisson.poisson_coefficients on the XLA assembly outputs."""
    from naviflow_tpu.core.bc import apply_velocity_bcs
    from naviflow_tpu.ops.poisson import poisson_coefficients
    from naviflow_tpu.ops.powerlaw import d_coefficient

    rng = np.random.default_rng(11)
    mesh = nf.StructuredMesh(nx=NX, ny=NX)
    bc = nf.lid_driven_cavity(1.0)
    st = nf.initialize_state(mesh, bc, dtype=jnp.float32)
    u = jnp.asarray(st.u + 0.1 * rng.normal(size=st.u.shape), jnp.float32)
    v = jnp.asarray(st.v + 0.1 * rng.normal(size=st.v.shape), jnp.float32)
    p = jnp.asarray(rng.normal(size=st.p.shape), jnp.float32)
    u, v = apply_velocity_bcs(u, v, bc)
    kw = dict(dx=1.0 / (NX - 1), dy=1.0 / (NX - 1), rho=1.0, mu=0.01)

    _, cu_rel, _, cv_rel, d_u, d_v, pc = fused_assembly_pair(
        u, v, p, alpha=ALPHA, interpret=True, poisson_variant=variant, **kw)

    d_u_w = d_coefficient(cu_rel.a_p, kw["dy"], is_u=True)
    d_v_w = d_coefficient(cv_rel.a_p, kw["dx"], is_u=False)
    pc_w = poisson_coefficients(d_u_w, d_v_w, dx=kw["dx"], dy=kw["dy"],
                                rho=kw["rho"], variant=variant)

    np.testing.assert_allclose(np.asarray(d_u), np.asarray(d_u_w),
                               rtol=1e-6, atol=1e-9, err_msg="d_u")
    np.testing.assert_allclose(np.asarray(d_v), np.asarray(d_v_w),
                               rtol=1e-6, atol=1e-9, err_msg="d_v")
    for field in ("a_e", "a_w", "a_n", "a_s", "diag"):
        np.testing.assert_allclose(
            np.asarray(getattr(pc, field)), np.asarray(getattr(pc_w, field)),
            rtol=1e-6, atol=1e-9, err_msg=f"pc.{field}")
