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
