"""Compensated (double-single) floating-point evaluation for residuals.

Purpose (VERDICT r1 item 7 / ROADMAP #9): the TPU path is float32, whose
outer-residual floor measured ~2e-7 — the residual field ``r = src - A x``
suffers catastrophic cancellation when the true residual is ~1e-7 of the
O(1) stencil terms, so 1e-7 convergence targets (reference regime, e.g.
``matrix_BiCGSTAB.py:21``) could previously only be demonstrated in f64 on
CPU.  These helpers evaluate the residual as an error-free transformation:
every product via Dekker TwoProduct (exact f32 split multiplication),
every accumulation via Knuth TwoSum, carrying a (hi, lo) double-single
pair — the hi word is the correctly rounded f32 of the EXACT residual.
~6x the flops of the plain stencil, but the op is bandwidth-bound, so the
measured cost is small; used only for the residual *measurement*, never
inside the solver iterations.

In f64 (CPU tests) the same code simply produces ~1e-31-accurate
residuals, so golden tests compare it against the plain f64 evaluation.
"""

from __future__ import annotations

import jax.numpy as jnp


def two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (any rounding mode)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(a):
    """Dekker split: a == hi + lo with hi/lo each having half-width
    mantissas.  Factor 2^ceil(p/2)+1: f32 (p=24) -> 4097, f64 (p=53) ->
    134217729."""
    factor = jnp.asarray(4097.0 if a.dtype == jnp.float32 else 134217729.0,
                         a.dtype)
    c = factor * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Dekker TwoProduct: p + e == a*b exactly (no FMA needed)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def compensated_linear_combination(terms):
    """sum of ``terms`` as a double-single (hi, lo) pair.

    ``terms``: list of either arrays (added exactly as-is) or (coef, x)
    pairs (multiplied with TwoProduct).  Accumulation by cascaded TwoSum
    with first-order error propagation (double-single "add" without
    renormalization at every step — errors are summed separately, which is
    exact to second order and sufficient for a 2^24 dynamic range).
    """
    hi = None
    lo = None
    for t in terms:
        if isinstance(t, tuple):
            p, e = two_prod(*t)
        else:
            p, e = t, None
        if hi is None:
            hi = p
            lo = jnp.zeros_like(p) if e is None else e
        else:
            hi, carry = two_sum(hi, p)
            lo = lo + carry if e is None else lo + (carry + e)
    # renormalize once
    s, e = two_sum(hi, lo)
    return s, e


def residual_5pt(x, src, a_e, a_w, a_n, a_s, a_p, shifts):
    """Exact-to-f32 residual r = src + sum(a_nb x_nb) - a_p x.

    ``shifts``: (xE, xW, xN, xS) pre-shifted neighbor arrays.  Returns the
    hi word of the double-single residual.
    """
    xE, xW, xN, xS = shifts
    hi, _ = compensated_linear_combination([
        src, (a_e, xE), (a_w, xW), (a_n, xN), (a_s, xS), (-a_p, x),
    ])
    return hi


def compensated_norm(x):
    """L2 norm with exact squaring + compensated accumulation."""
    p, e = two_prod(x, x)
    # Neumaier-style: sum hi and lo parts separately (the lo parts are
    # ~2^-24 of the his, so a plain sum of each is enough)
    s = jnp.sum(p, dtype=p.dtype) + jnp.sum(e, dtype=e.dtype)
    return jnp.sqrt(s)
