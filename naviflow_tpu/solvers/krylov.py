"""Matrix-free Krylov pressure solvers: CG, preconditioned CG, BiCGSTAB,
and GMG-preconditioned CG.

TPU-native rebuild of the reference Krylov paths — SciPy ``cg``/``bicgstab``
on explicit CSR or LinearOperators, optionally preconditioned by SuperLU ILU,
PyAMG, or geometric-multigrid cycles (``matrix_BiCGSTAB.py``,
``matrix_free_BiCGSTAB.py``, ``preconditioned_cg_solver.py``,
``geo_multigrid_cg.py``).  Here every solver is a ``lax.while_loop`` whose
body is fused stencil matvecs and whole-grid reductions; on a sharded mesh
the reductions become ``psum`` collectives for free (they are ``jnp.sum`` /
``jnp.vdot`` over the sharded field).

Gauge handling: these run on the *consistent/symmetric* (singular, SPD on
the range) operator without pinning; the Krylov iterates stay in the
zero-mean complement automatically when b is compatible, and the returned
correction is mean-normalized.  (The reference pins row (0,0) instead, which
breaks symmetry — SURVEY §7 "gauge pinning" risk item; mean projection is
the alternative the reference itself mentions at ``simpler.py:31``.)

ILU preconditioning (SuperLU, inherently sequential triangular solves) is
replaced by Jacobi or multigrid preconditioning — the reference's own
top-tier configuration is GMG-preconditioned CG (``geo_multigrid_cg.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.poisson import PoissonCoeffs, apply_poisson, poisson_diagonal
from .multigrid import MultigridConfig, build_levels, make_preconditioner
from .pressure import PressureSolveInfo


@dataclasses.dataclass(frozen=True)
class CGPressureConfig:
    """(Preconditioned) conjugate gradients (reference
    ``preconditioned_cg_solver.py`` with the AMG preconditioner swapped for
    Jacobi/none; use :class:`MGCGPressureConfig` for the multigrid one)."""

    tolerance: float = 1e-7
    max_iterations: int = 2000
    preconditioner: str = "jacobi"  # 'none' | 'jacobi'
    kind: str = "cg"


@dataclasses.dataclass(frozen=True)
class BiCGSTABPressureConfig:
    """Matrix-free BiCGSTAB (reference ``matrix_free_BiCGSTAB.py``)."""

    tolerance: float = 1e-7
    max_iterations: int = 2000
    preconditioner: str = "jacobi"  # 'none' | 'jacobi'
    kind: str = "bicgstab"


@dataclasses.dataclass(frozen=True)
class MGCGPressureConfig:
    """GMG-preconditioned CG — the reference's north-star pressure path
    (``geo_multigrid_cg.py:73-203``): M = ``mg_cycles`` multigrid cycles."""

    tolerance: float = 1e-7
    max_iterations: int = 200
    mg_cycles: int = 1
    mg: MultigridConfig = MultigridConfig(pre_smoothing=2, post_smoothing=2)
    kind: str = "mgcg"


def _zero_mean(x):
    return x - jnp.mean(x)


def _pcg(b, A, M, x0, tol, maxiter):
    """Flexible preconditioned CG (Polak–Ribière beta) — tolerant of the
    mildly nonsymmetric multigrid preconditioner."""
    b = _zero_mean(b)
    x = _zero_mean(x0)
    r = b - A(x)
    z = M(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.linalg.norm(b)
    tol_abs = tol * jnp.where(bnorm > 0, bnorm, 1.0)

    eps = jnp.asarray(jnp.finfo(b.dtype).tiny * 1e6, b.dtype)

    def cond(carry):
        x, r, z, p, rz, k, ok = carry
        return ok & (k < maxiter) & (jnp.linalg.norm(r) > tol_abs)

    def body(carry):
        x, r, z, p, rz, k, ok = carry
        Ap = A(p)
        pAp = jnp.vdot(p, Ap)
        # breakdown guard: near-zero or negative curvature (f32 cancellation
        # on the singular system) ends the iteration instead of producing
        # a huge step
        good = pAp > eps * jnp.vdot(p, p)
        alpha = jnp.where(good, rz / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        x = x + alpha * p
        r_new = r - alpha * Ap
        z_new = M(r_new)
        rz_new = jnp.vdot(r_new, z_new)
        # Polak–Ribière (flexible) beta
        beta = jnp.where(
            jnp.abs(rz) > eps, jnp.vdot(r_new - r, z_new) / rz, 0.0
        )
        p = z_new + beta * p
        return (x, r_new, z_new, p, rz_new, k + 1, good)

    x, r, _, _, _, k, _ = jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, jnp.asarray(0, jnp.int32), jnp.asarray(True))
    )
    return x, r, k


def _bicgstab(b, A, M, x0, tol, maxiter):
    b = _zero_mean(b)
    x = _zero_mean(x0)
    r = b - A(x)
    rhat = r
    rho = alpha = omega = jnp.asarray(1.0, b.dtype)
    v = p = jnp.zeros_like(b)
    bnorm = jnp.linalg.norm(b)
    tol_abs = tol * jnp.where(bnorm > 0, bnorm, 1.0)

    eps = jnp.asarray(jnp.finfo(b.dtype).tiny * 1e6, b.dtype)

    def cond(carry):
        x, r, rho, alpha, omega, v, p, k, ok = carry
        return ok & (k < maxiter) & (jnp.linalg.norm(r) > tol_abs)

    def body(carry):
        x, r, rho, alpha, omega, v, p, k, ok = carry
        rho_new = jnp.vdot(rhat, r)
        good = (jnp.abs(rho) > eps) & (jnp.abs(omega) > eps)
        beta = jnp.where(good, (rho_new / jnp.where(rho == 0, 1.0, rho))
                         * (alpha / jnp.where(omega == 0, 1.0, omega)), 0.0)
        p = r + beta * (p - omega * v)
        ph = M(p)
        v = A(ph)
        denom = jnp.vdot(rhat, v)
        good = good & (jnp.abs(denom) > eps)
        alpha = jnp.where(good, rho_new / jnp.where(denom == 0, 1.0, denom), 0.0)
        s = r - alpha * v
        sh = M(s)
        t = A(sh)
        tt = jnp.vdot(t, t)
        omega_new = jnp.where(tt > eps, jnp.vdot(t, s) / jnp.where(tt == 0, 1.0, tt), 0.0)
        x = x + alpha * ph + omega_new * sh
        r = s - omega_new * t
        return (x, r, rho_new, alpha, omega_new, v, p, k + 1, good)

    carry = (x, r, rho, alpha, omega, v, p, jnp.asarray(0, jnp.int32),
             jnp.asarray(True))
    x, r, *_, k, _ = jax.lax.while_loop(cond, body, carry)
    return x, r, k


def _jacobi_M(c: PoissonCoeffs):
    inv_d = 1.0 / poisson_diagonal(c, pinned=False)
    return lambda r: r * inv_d


def solve_pressure_krylov(
    b, c: PoissonCoeffs, p0, cfg, *, d_u=None, d_v=None, dx=None, dy=None,
    rho=None, variant="consistent",
) -> Tuple[jax.Array, PressureSolveInfo]:
    """Krylov dispatch with the same contract as ``solve_pressure``.

    For ``mgcg`` the d-fields and grid spacing must be supplied so the
    multigrid hierarchy can be built.
    """
    A = lambda x: apply_poisson(x, c, pinned=False)
    if cfg.kind == "mgcg":
        levels = build_levels(d_u, d_v, cfg.mg, dx=dx, dy=dy, rho=rho, variant=variant)
        M = make_preconditioner(levels, cfg.mg, cfg.mg_cycles)
        x, r, k = _pcg(b, A, M, p0, cfg.tolerance, cfg.max_iterations)
    else:
        if cfg.preconditioner == "jacobi":
            M = _jacobi_M(c)
        elif cfg.preconditioner == "none":
            M = lambda r: r
        else:
            raise ValueError(f"Unknown preconditioner: {cfg.preconditioner}")
        if cfg.kind == "cg":
            x, r, k = _pcg(b, A, M, p0, cfg.tolerance, cfg.max_iterations)
        elif cfg.kind == "bicgstab":
            x, r, k = _bicgstab(b, A, M, p0, cfg.tolerance, cfg.max_iterations)
        else:
            raise ValueError(f"Unknown Krylov pressure solver: {cfg.kind}")

    x = _zero_mean(x)
    bnorm = jnp.linalg.norm(b)
    rel = jnp.linalg.norm(r) / jnp.where(bnorm > 0, bnorm, 1.0)
    return x, PressureSolveInfo(iterations=k, residual_field=r, rel_residual=rel)
