"""Error-free residual evaluation (ops/compensated.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from naviflow_tpu.ops.compensated import (
    compensated_linear_combination,
    compensated_norm,
    two_prod,
    two_sum,
)


def test_two_sum_two_prod_exact_f32():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    s, e = two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(np.asarray(s, np.float64) + np.asarray(e, np.float64), exact)
    p, e = two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)


def test_cancellation_resolved_f32():
    """a*x - a*x + tiny must return tiny exactly (plain f32 loses it)."""
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    tiny = jnp.asarray((1e-7 * rng.normal(size=(64, 64))).astype(np.float32))
    hi, _ = compensated_linear_combination([tiny, (a, x), (-a, x)])
    np.testing.assert_allclose(np.asarray(hi), np.asarray(tiny),
                               rtol=1e-6, atol=1e-13)


def test_compensated_residual_matches_f64():
    """5-pt momentum residual: compensated f32 == plain f64 reference to
    f32 roundoff of the exact value."""
    from naviflow_tpu.ops.powerlaw import u_momentum_coefficients
    from naviflow_tpu.solvers.momentum import _unrelaxed_residual

    rng = np.random.default_rng(2)
    nx = ny = 24
    u64 = jnp.asarray(rng.normal(size=(nx + 1, ny)))
    v64 = jnp.asarray(rng.normal(size=(nx, ny + 1)))
    p64 = jnp.asarray(rng.normal(size=(nx, ny)))
    kw = dict(dx=1.0 / (nx - 1), dy=1.0 / (ny - 1), rho=1.0, mu=0.01)
    c64 = u_momentum_coefficients(u64, v64, p64, **kw)
    r64, n64 = _unrelaxed_residual(u64, c64, is_u=True)

    f32 = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), t)
    r32, n32 = _unrelaxed_residual(f32(u64), f32(c64), is_u=True,
                                   compensated=True)
    # the compensated f32 residual of the f32-rounded inputs differs from
    # the f64 residual of the f64 inputs only by the input rounding itself
    scale = float(jnp.max(jnp.abs(np.asarray(c64.src))))
    np.testing.assert_allclose(np.asarray(r32, np.float64), np.asarray(r64),
                               atol=3e-6 * scale)
    assert abs(float(n32) - float(n64)) < 1e-4 * float(n64) + 1e-5
