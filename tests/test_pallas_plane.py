"""Plane-resident strip kernels (ops/pallas_plane.py) vs the value-level
XLA plane path (ops/plane.py), interpret mode; hardware certification
rides benchmarks/strip_parity_check.py + bench.py's numerics row."""

import jax.numpy as jnp
import numpy as np
import pytest

from naviflow_tpu.ops.plane import (
    PlaneStencil5,
    plane_fine_down,
    plane_fine_up,
    split_planes,
)
from naviflow_tpu.ops.pallas_plane import (
    H,
    _plane_rows,
    plane_strip_down,
    plane_strip_up,
    supports_plane_strip,
)
from naviflow_tpu.ops.poisson import poisson_coefficients
from naviflow_tpu.ops.stencil9 import from_poisson
from naviflow_tpu.solvers.multigrid import MultigridConfig

NX = 64
CFG = MultigridConfig(pre_smoothing=2, post_smoothing=2, smoother="gs")


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    d_u = jnp.asarray(rng.uniform(0.5, 1.5, (NX + 1, NX)), jnp.float32)
    d_v = jnp.asarray(rng.uniform(0.5, 1.5, (NX, NX + 1)), jnp.float32)
    pc = poisson_coefficients(d_u, d_v, dx=1.0 / NX, dy=1.0 / NX, rho=1.0,
                              variant="consistent")
    st = from_poisson(pc)
    p = jnp.asarray(rng.normal(size=(NX, NX)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(NX, NX)), jnp.float32)
    ec = jnp.asarray(rng.normal(size=(NX // 2, NX // 2)), jnp.float32)
    return st, p, b, ec


def test_gate_and_geometry():
    assert supports_plane_strip(NX, NX // 2, CFG, jnp.float32)
    assert not supports_plane_strip(NX, NX // 2, CFG, jnp.float64)
    T = _plane_rows(NX, NX // 2)
    assert T and NX % T == 0 and T + 2 * H <= NX
    # the motivating size: 4096^2 plane windows fit.  (Under the original
    # 16 MiB scoped-VMEM default the interleaved strips were gated OFF
    # here — the raised per-kernel limit (pallas_mg.kernel_params) now
    # admits them too; the fine_layout choice between the two is set by
    # hardware measurement, see solvers/multigrid.py.)
    from naviflow_tpu.ops.pallas_strip import _strip_rows

    assert _plane_rows(4096, 2048) > 0
    assert _strip_rows(4096, 4096) > 0


def test_plane_strip_down_matches_xla(problem):
    st, p, b, ec = problem
    ps = PlaneStencil5(st, b)
    R0, B0 = split_planes(p)
    want_R, want_B, want_rc = plane_fine_down(R0, B0, ps, CFG.pre_smoothing)
    got_R, got_B, got_rc = plane_strip_down(R0, B0, ps, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(got_R), np.asarray(want_R),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_B), np.asarray(want_B),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_rc), np.asarray(want_rc),
                               rtol=1e-5, atol=1e-4)


def test_plane_strip_up_matches_xla(problem):
    st, p, b, ec = problem
    ps = PlaneStencil5(st, b)
    R0, B0 = split_planes(p)
    want_R, want_B = plane_fine_up(R0, B0, ps, ec, CFG.post_smoothing)
    got_R, got_B = plane_strip_up(R0, B0, ps, ec, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(got_R), np.asarray(want_R),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_B), np.asarray(want_B),
                               rtol=1e-5, atol=1e-4)


def test_plane_strip_full_cycle_chain(problem):
    """Two chained down/up passes (as the V-cycle loop runs them) stay in
    lockstep with the XLA plane path — the halo-consumption accounting
    holds across repeated application."""
    st, p, b, ec = problem
    ps = PlaneStencil5(st, b)
    R_x, B_x = split_planes(p)
    R_k, B_k = R_x, B_x
    for _ in range(2):
        R_x, B_x, rc_x = plane_fine_down(R_x, B_x, ps, CFG.pre_smoothing)
        R_k, B_k, rc_k = plane_strip_down(R_k, B_k, ps, CFG, interpret=True)
        np.testing.assert_allclose(np.asarray(rc_k), np.asarray(rc_x),
                                   rtol=1e-4, atol=1e-3)
        R_x, B_x = plane_fine_up(R_x, B_x, ps, ec, CFG.post_smoothing)
        R_k, B_k = plane_strip_up(R_k, B_k, ps, ec, CFG, interpret=True)
        np.testing.assert_allclose(np.asarray(R_k), np.asarray(R_x),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(B_k), np.asarray(B_x),
                                   rtol=1e-4, atol=1e-3)
