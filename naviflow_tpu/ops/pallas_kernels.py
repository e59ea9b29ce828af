"""Pallas TPU kernels for the hot pressure-solve ops.

The XLA-fused formulation of a red-black sweep is ~10 elementwise kernels
(4 shifted reads + combines, twice); at small grids each outer iteration
launches hundreds of such micro-kernels.  These Pallas kernels fuse an
entire block of sweeps — or a matvec — into ONE kernel whose working set
lives in VMEM for the whole duration.

Correctness trick: the 5-point coefficient arrays are zero on every link
that leaves the domain (``poisson_coefficients`` constructs them that way),
so the circular wrap of ``pltpu.roll`` is annihilated by the zero
coefficients — no edge masking is needed inside the kernel.

Each kernel operates on the full (nx, ny) arrays in VMEM (up to
``PALLAS_MAX_CELLS`` = 256^2 f32 — 7 arrays + double buffering against the
16 MB scoped-VMEM limit); the public wrappers fall back to the pure-jnp
path on other backends, under ``interpret=True`` on CPU for tests, or when
the arrays would not fit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .poisson import PoissonCoeffs, poisson_diagonal

try:  # pallas is TPU-only at lowering time; import is safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

# 7 full f32 arrays + double-buffering must fit the 16 MB VMEM scoped limit;
# 512^2 was measured to exceed it by 1.6 MB.
PALLAS_MAX_CELLS = 256 * 256

# Status note: on v5e these kernels are bit-exact vs the XLA path but ~6x
# slower per sweep at 128^2 — XLA's own fusion of the shift/mask formulation
# is already excellent for these stencils, so the jnp path remains the
# default and these kernels are kept as validated infrastructure (e.g. for
# future multi-sweep fusion across levels).


def _roll(x, shift, axis):
    if HAVE_PALLAS:
        # pltpu.roll requires a non-negative shift
        return pltpu.roll(x, shift % x.shape[axis], axis)
    return jnp.roll(x, shift, axis)  # pragma: no cover


def _nbsum(p, ae, aw, an, as_):
    # roll(-1, axis0) reads x[i+1]; wrap terms are killed by zero coefficients
    return (
        ae * _roll(p, -1, 0)
        + aw * _roll(p, 1, 0)
        + an * _roll(p, -1, 1)
        + as_ * _roll(p, 1, 1)
    )


def _rbgs_kernel(n_sweeps: int, omega: float, p_ref, b_ref, ae_ref, aw_ref,
                 an_ref, as_ref, invd_ref, out_ref):
    p = p_ref[:]
    b = b_ref[:]
    ae = ae_ref[:]
    aw = aw_ref[:]
    an = an_ref[:]
    as_ = as_ref[:]
    invd = invd_ref[:]
    shape = p.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    red = ((ii + jj) % 2 == 0)

    def half(p, color):
        p_new = (b + _nbsum(p, ae, aw, an, as_)) * invd
        return jnp.where(color, p + omega * (p_new - p), p)

    def body(_, p):
        p = half(p, red)
        return half(p, jnp.logical_not(red))

    out_ref[:] = jax.lax.fori_loop(0, n_sweeps, body, p)


def _matvec_kernel(p_ref, ae_ref, aw_ref, an_ref, as_ref, diag_ref, out_ref):
    p = p_ref[:]
    out_ref[:] = diag_ref[:] * p - _nbsum(p, ae_ref[:], aw_ref[:], an_ref[:], as_ref[:])


def _use_pallas(shape, interpret: bool):
    if not HAVE_PALLAS:
        return False
    if shape[0] * shape[1] > PALLAS_MAX_CELLS:
        return False
    return interpret or jax.default_backend() not in ("cpu",)


@functools.partial(jax.jit, static_argnames=("n_sweeps", "omega", "interpret"))
def rbgs_sweeps_pallas(p, b, c: PoissonCoeffs, *, n_sweeps: int = 1,
                       omega: float = 1.5, interpret: bool = False):
    """``n_sweeps`` fused red-black SOR sweeps in a single kernel launch.

    Numerics identical to iterating ``solvers.pressure.rbgs_sweep`` with
    ``pin=False`` (verified in tests/test_pallas.py).
    """
    invd = 1.0 / poisson_diagonal(c, pinned=False)
    if not _use_pallas(p.shape, interpret):
        from ..solvers.pressure import rbgs_sweep

        return jax.lax.fori_loop(
            0, n_sweeps, lambda _, q: rbgs_sweep(q, b, c, omega, pin=False), p
        )
    kernel = functools.partial(_rbgs_kernel, n_sweeps, omega)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        in_specs=[spec] * 7,
        out_specs=spec,
        interpret=interpret,
    )(p, b, c.a_e, c.a_w, c.a_n, c.a_s, invd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_poisson_pallas(p, c: PoissonCoeffs, *, interpret: bool = False):
    """Fused 5-point matvec (unpinned)."""
    if not _use_pallas(p.shape, interpret):
        from .poisson import apply_poisson

        return apply_poisson(p, c, pinned=False)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _matvec_kernel,
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        in_specs=[spec] * 6,
        out_specs=spec,
        interpret=interpret,
    )(p, c.a_e, c.a_w, c.a_n, c.a_s, c.diag)
