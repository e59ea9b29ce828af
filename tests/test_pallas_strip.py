"""Temporal-blocking strip kernels vs the XLA fine-level ops (interpret
mode; the on-hardware certification rides bench.py's numerics row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naviflow_tpu.ops.poisson import poisson_coefficients
from naviflow_tpu.ops.stencil9 import apply5, from_poisson
from naviflow_tpu.ops.transfer_cc import prolong_cc, restrict_cc
from naviflow_tpu.ops.pallas_strip import (
    H,
    _strip_rows,
    strip_down,
    strip_up,
    supports_strip,
)
from naviflow_tpu.solvers.multigrid import MultigridConfig, _smooth

NX = 64


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(4)
    d_u = jnp.asarray(rng.uniform(0.5, 1.5, (NX + 1, NX)), jnp.float32)
    d_v = jnp.asarray(rng.uniform(0.5, 1.5, (NX, NX + 1)), jnp.float32)
    pc = poisson_coefficients(d_u, d_v, dx=1.0 / NX, dy=1.0 / NX, rho=1.0,
                              variant="consistent")
    st = from_poisson(pc)
    p = jnp.asarray(rng.normal(size=(NX, NX)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(NX, NX)), jnp.float32)
    ec = jnp.asarray(rng.normal(size=(NX // 2, NX // 2)), jnp.float32)
    return st, p, b, ec


CFG = MultigridConfig(pre_smoothing=2, post_smoothing=2, smoother="gs")


def test_gate_and_strip_geometry():
    assert supports_strip(NX, NX, True, CFG, jnp.float32)
    assert supports_strip(NX, NX, False, CFG, jnp.float32)  # 9-pt Galerkin
    assert not supports_strip(NX - 1, NX - 1, True, CFG, jnp.float32)  # odd
    T = _strip_rows(NX, NX)
    assert T and NX % T == 0 and T + 2 * H <= NX


def test_strip_nine_point_matches_xla():
    """9-point Galerkin-level strips (4-color GS, corner links live) ==
    the XLA path, on a real RAP coarse operator at 64^2."""
    from naviflow_tpu.ops.stencil9 import apply9, galerkin_coarsen

    rng = np.random.default_rng(13)
    nf_ = 2 * NX
    d_u = jnp.asarray(rng.uniform(0.5, 1.5, (nf_ + 1, nf_)), jnp.float32)
    d_v = jnp.asarray(rng.uniform(0.5, 1.5, (nf_, nf_ + 1)), jnp.float32)
    pc = poisson_coefficients(d_u, d_v, dx=1.0 / nf_, dy=1.0 / nf_, rho=1.0,
                              variant="consistent")
    st = galerkin_coarsen(from_poisson(pc), restrict_cc, prolong_cc, NX, NX)
    p = jnp.asarray(rng.normal(size=(NX, NX)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(NX, NX)), jnp.float32)
    ec = jnp.asarray(rng.normal(size=(NX // 2, NX // 2)), jnp.float32)

    x = _smooth(p, b, st, CFG, CFG.pre_smoothing, False, None)
    want_rc = restrict_cc(b - apply9(x, st))
    got_x, got_rc = strip_down(p, b, st, CFG, five=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(x),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_rc), np.asarray(want_rc),
                               rtol=1e-5, atol=1e-4)
    want_up = _smooth(x + prolong_cc(ec), b, st, CFG, CFG.post_smoothing,
                      False, None)
    got_up = strip_up(got_x, b, st, ec, CFG, five=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got_up), np.asarray(want_up),
                               rtol=1e-5, atol=1e-4)


def test_strip_down_matches_xla(problem):
    """pre-smooth + residual + restrict == the XLA sequence (the halo
    absorbs every half-sweep's window-edge invalidation)."""
    st, p, b, _ = problem
    want_x = _smooth(p, b, st, CFG, CFG.pre_smoothing, True, None)
    want_rc = restrict_cc(b - apply5(want_x, st))
    got_x, got_rc = strip_down(p, b, st, CFG, interpret=True)
    # ULP tolerance: FMA contraction differs between the interpreted
    # kernel and the jitted XLA program (same rationale as
    # tests/test_dist_mg.py); the smoothed field is O(100), so the noise
    # floor is ~1e-5 absolute
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_rc), np.asarray(want_rc),
                               rtol=1e-5, atol=1e-4)


def test_strip_up_matches_xla(problem):
    """prolong-correct + post-smooth == the XLA sequence (the clamped
    local row-prolongation is exact at physical edges and inside the halo
    slop everywhere else)."""
    st, p, b, ec = problem
    x = _smooth(p, b, st, CFG, CFG.pre_smoothing, True, None)
    want = _smooth(x + prolong_cc(ec), b, st, CFG, CFG.post_smoothing,
                   True, None)
    got = strip_up(x, b, st, ec, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_peeled_cycle_with_strips_matches_plain(problem):
    """The full peeled cycle with strip=True (forced via interpret-mode
    kernels) equals the plain XLA _cycle on the same hierarchy."""
    from unittest import mock

    import naviflow_tpu.ops.pallas_strip as ps
    from naviflow_tpu.solvers.multigrid import (
        _cycle, _peeled_cycle, levels_from_stencil)

    st, p, b, _ = problem
    levels = levels_from_stencil(st, NX, NX, CFG)
    want = _cycle(p, b, levels, 0, CFG)

    tail = lambda e0, rc: _cycle(e0, rc, levels[1:], 0, CFG)
    with mock.patch.object(ps, "strip_down",
                           lambda *a, **k: strip_down(*a, interpret=True)), \
         mock.patch.object(ps, "strip_up",
                           lambda *a, **k: strip_up(*a, interpret=True)):
        got = _peeled_cycle(p, b, levels, CFG, 1, tail, strip=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=3e-4)
