"""Fused whole-BiCGSTAB Pallas TPU kernel for the momentum predictor.

Second application of the whole-algorithm-fusion result measured for the
multigrid V-cycle (``ops/pallas_mg.py``, 2.4-2.9x): an XLA BiCGSTAB
iteration is ~10 micro-kernels (matvec shifts, three dot products, axpys),
so a 20-iteration momentum solve is ~200 dispatches per field per outer
iteration.  This kernel runs the ENTIRE masked BiCGSTAB
(``solvers/momentum._bicgstab_masked`` semantics) in one VMEM-resident
launch: the 5-point matvec as rolls, the dot products as in-kernel
cross-lane reductions, and the tolerance/breakdown stopping rule as an
in-kernel ``lax.while_loop`` (which lowers on Pallas TPU), identical to
the XLA path's.

Correctness notes:
* rolls vs zero-fill shifts: masked output nodes are >= 1 away from every
  edge, so their neighbor reads never wrap; boundary links into the mask
  are zeroed by Practice-B folding (``ops/powerlaw.py:76-83``) and ``x``
  enters pre-masked, so wrap garbage is annihilated twice over;
* the update algebra, breakdown guards, and masked-system formulation
  mirror ``_bicgstab_masked`` term for term (f32 differences come only
  from reduction order in the dots).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .stencil import StencilCoeffs

try:  # pallas is TPU-only at lowering time; import is safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

# x + 5 live Krylov vectors + 6 coefficient arrays, against the 16 MB
# scoped-VMEM limit with headroom for Mosaic temporaries
MAX_FIELD_BYTES = 2**20


def supports_fused_bicgstab(shape, dtype) -> bool:
    if not HAVE_PALLAS or dtype != jnp.float32:
        return False
    return (-(-shape[0] // 8) * 8) * (-(-shape[1] // 128) * 128) * 4 <= MAX_FIELD_BYTES


def _mk_kernel(maxiter: int, tol: float, lo_i, hi_i, lo_j, hi_j):
    def _roll(x, shift, axis):
        return pltpu.roll(x, shift % x.shape[axis], axis)

    def kernel(x0_ref, ae_ref, aw_ref, an_ref, as_ref, ap_ref, src_ref,
               out_ref):
        ae, aw = ae_ref[:], aw_ref[:]
        an, as_ = an_ref[:], as_ref[:]
        ap = ap_ref[:]
        shape = ap.shape
        ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        mask = ((ii >= lo_i) & (ii <= shape[0] - 1 - hi_i)
                & (jj >= lo_j) & (jj <= shape[1] - 1 - hi_j))
        mask_f = mask.astype(ap.dtype)

        def A(x):
            # apply_stencil with rolls; see module docstring for why the
            # circular wrap is harmless on masked nodes
            return (
                ap * x
                - ae * _roll(x, -1, 0)
                - aw * _roll(x, 1, 0)
                - an * _roll(x, -1, 1)
                - as_ * _roll(x, 1, 1)
            ) * mask_f

        # compensated dots: Mosaic's sequential reductions lose O(n*eps)
        # accuracy on large arrays, which both weakens the stopping test
        # and perturbs the breakdown-sensitive BiCGSTAB scalars
        from .compensated import fold_dot

        b = src_ref[:] * mask_f
        x = x0_ref[:] * mask_f
        r0 = b - A(x)
        rhat = r0
        one = jnp.asarray(1.0, ap.dtype)
        tol2 = (tol * jnp.maximum(jnp.sqrt(fold_dot(b, b)), 1e-30)) ** 2
        eps = jnp.asarray(jnp.finfo(ap.dtype).tiny * 1e6, ap.dtype)

        def cond(carry):
            x, r, rho, alpha, omega_, v, p, k, ok = carry
            return ok & (k < maxiter) & (fold_dot(r, r) > tol2)

        def body(carry):
            x, r, rho, alpha, omega_, v, p, k, ok = carry
            rho_new = fold_dot(rhat, r)
            good = (jnp.abs(rho) > eps) & (jnp.abs(omega_) > eps)
            beta = jnp.where(good,
                             (rho_new / jnp.where(rho == 0, one, rho))
                             * (alpha / jnp.where(omega_ == 0, one, omega_)),
                             0.0)
            p_new = r + beta * (p - omega_ * v)
            v_new = A(p_new)
            denom = fold_dot(rhat, v_new)
            good = good & (jnp.abs(denom) > eps)
            alpha_new = jnp.where(good,
                                  rho_new / jnp.where(denom == 0, one, denom),
                                  0.0)
            s = r - alpha_new * v_new
            t = A(s)
            tt = fold_dot(t, t)
            omega_new = jnp.where(tt > eps,
                                  fold_dot(t, s) / jnp.where(tt == 0, one, tt),
                                  0.0)
            x_new = x + alpha_new * p_new + omega_new * s
            r_new = s - omega_new * t
            return (x_new, r_new, rho_new, alpha_new, omega_new, v_new,
                    p_new, k + 1, good)

        carry = (x, r0, one, one, one, jnp.zeros_like(x), jnp.zeros_like(x),
                 jnp.asarray(0, jnp.int32), jnp.asarray(True))
        # in-kernel early exit: lax.while_loop lowers on Pallas TPU, so the
        # stopping rule is literally _bicgstab_masked's
        x, *_ = jax.lax.while_loop(cond, body, carry)
        out_ref[:] = jnp.where(mask, x, x0_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("tol", "maxiter", "margins",
                                             "interpret"))
def bicgstab_momentum_pallas(x0, c: StencilCoeffs, *, tol: float,
                             maxiter: int, margins=(1, 1, 1, 1),
                             interpret: bool = False):
    """Whole-solve fused masked BiCGSTAB.  ``margins`` are the interior-mask
    margins (lo_i, hi_i, lo_j, hi_j) of ``ops/stencil.interior_mask``."""
    kernel = _mk_kernel(maxiter, tol, *margins)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    from .pallas_mg import kernel_params
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x0.shape, x0.dtype),
        in_specs=[spec] * 7,
        out_specs=spec,
        compiler_params=kernel_params(),
        interpret=interpret,
    )(x0, c.a_e, c.a_w, c.a_n, c.a_s, c.a_p, c.src)
