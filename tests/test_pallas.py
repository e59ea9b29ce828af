"""Pallas kernel correctness vs the pure-jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naviflow_tpu.ops.pallas_kernels import (
    HAVE_PALLAS,
    apply_poisson_pallas,
    rbgs_sweeps_pallas,
)
from naviflow_tpu.ops.poisson import apply_poisson, poisson_coefficients
from naviflow_tpu.solvers.pressure import rbgs_sweep

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")

RNG = np.random.default_rng(5)


def _system(nx=32, ny=32, dtype=jnp.float32):
    d_u = jnp.asarray((RNG.random((nx + 1, ny)) + 0.2).astype(np.float32), dtype)
    d_v = jnp.asarray((RNG.random((nx, ny + 1)) + 0.2).astype(np.float32), dtype)
    c = poisson_coefficients(d_u, d_v, dx=0.05, dy=0.05, rho=1.0,
                             variant="consistent")
    p = jnp.asarray(RNG.normal(size=(nx, ny)).astype(np.float32), dtype)
    b = jnp.asarray(RNG.normal(size=(nx, ny)).astype(np.float32), dtype)
    return p, b, c


@pytest.mark.parametrize("shape", [(32, 32), (63, 63), (48, 96)])
def test_matvec_kernel_matches_jnp(shape):
    p, b, c = _system(*shape)
    ours = apply_poisson_pallas(p, c, interpret=True)
    ref = apply_poisson(p, c, pinned=False)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n_sweeps", [1, 3])
def test_rbgs_kernel_matches_jnp(n_sweeps):
    p, b, c = _system(63, 63)
    ours = rbgs_sweeps_pallas(p, b, c, n_sweeps=n_sweeps, omega=1.5,
                              interpret=True)
    ref = p
    for _ in range(n_sweeps):
        ref = rbgs_sweep(ref, b, c, 1.5, pin=False)
    # roll-based vs pad-based neighbor sums differ in f32 accumulation order
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=5e-4, atol=2e-5)
