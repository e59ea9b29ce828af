"""Momentum predictor solvers (u*, v* from the linearized momentum equations).

TPU-native rebuild of the reference momentum-solver family.  The reference
delegates its inner linear solves to native libraries (PyAMG C++, PETSc C,
SuperLU ILU — ``AMG_solver.py``, ``matrix_momentum_solver.py``,
``matrix_free_momentum.py``); here each solver is a fused, jit-compiled
matrix-free iteration on the 5-point stencil — the TPU-native equivalent.

Contract preserved from the reference
(``base_momentum_solver.py:144-204``): each solve returns
``(star_field, d_coefficient, residual_field, residual_norm)`` where

* the linear system solved is the *relaxed* one (``a_p/alpha``,
  ``src + (1-alpha)(a_p/alpha) u_old`` — ``matrix_free_momentum.py:429-430``),
* ``d = spacing / a_p_relaxed`` (``matrix_free_momentum.py:449``),
* the residual is the *unrelaxed* algebraic residual
  ``r = src_un - A_un x`` with its L2 norm over interior nodes
  (``AMG_solver.py:240-296``, ``matrix_free_momentum.py:380-400``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.bc import BoundaryConditions, apply_velocity_bcs
from ..ops.highorder import (
    MomentumCoeffs9,
    apply_momentum9,
    neighbor_sum9,
    relax_coefficients9,
    u_momentum_coefficients9,
    v_momentum_coefficients9,
)
from ..ops.powerlaw import (
    d_coefficient,
    relax_coefficients,
    u_momentum_coefficients,
    v_momentum_coefficients,
)
from ..ops.stencil import (
    StencilCoeffs,
    apply_stencil,
    interior_mask,
    neighbor_sum,
    shift_e,
    shift_n,
    shift_s,
    shift_w,
)


def _apply(x, c):
    return apply_momentum9(x, c) if isinstance(c, MomentumCoeffs9) else apply_stencil(x, c)


def _nbsum(x, c):
    return neighbor_sum9(x, c) if isinstance(c, MomentumCoeffs9) else neighbor_sum(x, c)


def _assemble_coeffs(u, v, p, *, dx, dy, rho, mu, scheme, is_u):
    if scheme == "power_law":
        fn = u_momentum_coefficients if is_u else v_momentum_coefficients
        return fn(u, v, p, dx=dx, dy=dy, rho=rho, mu=mu)
    fn = u_momentum_coefficients9 if is_u else v_momentum_coefficients9
    return fn(u, v, p, dx=dx, dy=dy, rho=rho, mu=mu, scheme=scheme)


def _relax(coeffs, field, alpha):
    if isinstance(coeffs, MomentumCoeffs9):
        return relax_coefficients9(coeffs, field, alpha)
    return relax_coefficients(coeffs, field, alpha)


@dataclasses.dataclass(frozen=True)
class JacobiMomentumConfig:
    """Fixed-sweep weighted-Jacobi momentum solve
    (reference ``jacobi_solver.JacobiMomentumSolver``)."""

    n_sweeps: int = 1
    scheme: str = "power_law"  # 'power_law' | 'quick' | 'luds' | 'upwind'
    # error-free residual evaluation (ops/compensated.py) — enables 1e-7
    # outer targets on the f32 TPU path at ~zero cost (bandwidth-bound op)
    compensated_residual: bool = False
    kind: str = "jacobi"


@dataclasses.dataclass(frozen=True)
class RBGSMomentumConfig:
    """Fixed-sweep red-black Gauss-Seidel momentum solve — a TPU-friendly
    stand-in for the reference's sequential-GS options."""

    n_sweeps: int = 2
    omega: float = 1.0
    scheme: str = "power_law"
    kind: str = "rbgs"


@dataclasses.dataclass(frozen=True)
class ChebyshevMomentumConfig:
    """Reduction-LIGHT momentum inner solve: fixed-degree Chebyshev
    iteration on the Jacobi-preconditioned relaxed momentum system.

    Round-4/5 phase attribution (``benchmarks/profile_phases.py``,
    ``probe_step_parts.py``) pinned the large-grid SIMPLE step on the
    momentum BiCGSTAB's global reductions: every Krylov iteration is
    4 dots + 2 norms = full-array pipeline barriers, and at 2048^2 the
    two momentum solves cost 11.2 ms of a 15.4 ms step-body.  The
    relaxed momentum system is strongly diagonally dominant (Patankar
    relaxation divides the diagonal by ``alpha``: the Jacobi iteration
    ratio is bounded by ~``alpha`` + flux-imbalance), so a fixed-degree
    Chebyshev polynomial in ``D^-1 A`` — ``degree`` fused stencil
    applies, ZERO global reductions in the iteration — reaches BiCGSTAB-
    grade error reduction for this inner role.  Eigenvalue bounds come
    from one Gershgorin max-reduction per solve (2 barriers/solve total
    vs BiCGSTAB's 6/iteration); cf. the reference's own fixed-sweep
    ``jacobi_solver.JacobiMomentumSolver`` (the role model) and its
    omega-tuning studies (``spectral_radius_damping.py``), whose
    TPU-native upgrade this is (SURVEY §7)."""

    degree: int = 6
    # spectral-bound safety margin on the Gershgorin radius (the momentum
    # operator is nonsymmetric; a slightly inflated interval keeps the
    # complex convection eigenvalues inside the Chebyshev ellipse)
    bound_margin: float = 1.05
    scheme: str = "power_law"
    compensated_residual: bool = False
    # 'auto'/'pallas': strip-blocked VMEM-resident solve+residual kernel
    # (ops/pallas_cheby.py) on large TPU grids; 'xla' forces the composed
    # whole-array iteration (parity escape hatch)
    backend: str = "auto"
    # 'auto': take the Gershgorin ratio max from the fused assembly
    # kernel's folded partial maxima when that kernel runs (saves two
    # five-array HBM reads + two reduction barriers per outer iteration);
    # 'off' recomputes the bounds in XLA (parity escape hatch)
    assembly_bounds: str = "auto"
    # 'auto': merge the coefficient assembly INTO the solve kernel on
    # large TPU grids (ops/pallas_asmcheby.py — the 16 coefficient
    # arrays never touch HBM; Chebyshev interval from the previous
    # outer iteration's Gershgorin maxima, carried by the SIMPLE loop);
    # 'off' keeps the separate assembly + solve kernels (paired-
    # measurement / parity escape hatch)
    merged_assembly: str = "auto"
    kind: str = "chebyshev"


@dataclasses.dataclass(frozen=True)
class IDRSMomentumConfig:
    """IDR(s) momentum solve (reference ``matrix_free_momentum._idrs``,
    :175-340 — the Sonneveld & van Gijzen induced-dimension-reduction
    method).  We implement the biorthogonal variant with van Gijzen's
    basis update ``U_k = U_{k:s} c + om*v`` (the reference overwrites U_k
    before the product, a translation slip); the shadow-space loop is
    statically unrolled (s is small), so the whole solve is one
    ``lax.while_loop`` of fused stencil ops."""

    tolerance: float = 1e-7
    max_iterations: int = 30  # outer G-space builds (~(s+1) matvecs each)
    s: int = 4
    angle: float = 0.7
    scheme: str = "power_law"
    kind: str = "idrs"


@dataclasses.dataclass(frozen=True)
class GMRESMomentumConfig:
    """Matrix-free restarted GMRES(m) momentum solve (the reference exposes
    GMRES via SciPy ``gmres`` in ``BiCGSTAB_solver.py:317-390`` /
    ``matrix_free_momentum.py:175`` and as a PETSc KSP type; the ILU
    preconditioner becomes Jacobi scaling — the relaxed momentum system is
    strongly diagonally dominant)."""

    tolerance: float = 1e-7
    max_iterations: int = 40  # total Arnoldi steps
    restart: int = 10
    scheme: str = "power_law"
    compensated_residual: bool = False
    kind: str = "gmres"


@dataclasses.dataclass(frozen=True)
class KrylovMomentumConfig:
    """Matrix-free Krylov momentum solve (reference
    ``matrix_free_momentum.py`` BiCGSTAB path, sans ILU — the relaxed
    momentum system is strongly diagonally dominant, so Jacobi-preconditioned
    BiCGSTAB converges in a handful of iterations)."""

    tolerance: float = 1e-7
    max_iterations: int = 50
    scheme: str = "power_law"
    compensated_residual: bool = False
    # evaluate the Krylov dots with compensated pairwise reductions; set
    # automatically when the solve is traced inside a fused Pallas kernel
    # (see _bicgstab_masked docstring) — not needed on the XLA path
    compensated_dots: bool = False
    # 'auto'/'pallas': on TPU, run the whole masked BiCGSTAB as ONE fused
    # VMEM-resident kernel (ops/pallas_krylov.py) when the field fits;
    # 'xla' forces the composed while_loop
    backend: str = "auto"
    # 'auto': where the fused per-field kernel does NOT fit (large grids),
    # batch the u and v solves into one Krylov loop — half the reduction
    # barriers (_bicgstab_pair_masked).  'off' forces sequential solves.
    batch_pair: str = "auto"
    kind: str = "bicgstab"


def _u_interior_mask(shape):
    # u solved nodes: i in [1, nx-1], j in [1, ny-2]
    return interior_mask(shape, lo_i=1, hi_i=1, lo_j=1, hi_j=1)


def _v_interior_mask(shape):
    return interior_mask(shape, lo_i=1, hi_i=1, lo_j=1, hi_j=1)


def _jacobi_sweeps(x0, c, mask, n_sweeps: int):
    """n weighted-Jacobi sweeps on interior nodes of the (relaxed) system.

    x_new = (sum(a_nb x_nb) + src) / a_p on masked nodes
    (reference ``jacobi_solver.py:68-77``, omega=1).
    """
    safe_ap = jnp.where(c.a_p == 0, jnp.ones_like(c.a_p), c.a_p)

    def body(_, x):
        x_new = (_nbsum(x, c) + c.src) / safe_ap
        return jnp.where(mask, x_new, x)

    return jax.lax.fori_loop(0, n_sweeps, body, x0)


def _rbgs_sweeps(x0, c, mask, n_sweeps: int, omega: float):
    """Red-black Gauss-Seidel with SOR on interior nodes.

    For 9-point (second-neighbor) schemes the two-color split is only an
    approximate Gauss-Seidel (the +-2 links connect same-color nodes), which
    is fine as a relaxation method."""
    shape = x0.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    red = ((ii + jj) % 2 == 0) & mask
    black = ((ii + jj) % 2 == 1) & mask
    safe_ap = jnp.where(c.a_p == 0, jnp.ones_like(c.a_p), c.a_p)

    def half(x, color):
        x_new = x + omega * ((_nbsum(x, c) + c.src) / safe_ap - x)
        return jnp.where(color, x_new, x)

    def body(_, x):
        return half(half(x, red), black)

    return jax.lax.fori_loop(0, n_sweeps, body, x0)


def _bounds_from_rho(rho_raw, margin: float):
    """Chebyshev interval scalars from the raw masked Gershgorin ratio
    maximum (shared by :func:`_chebyshev_bounds` and the in-assembly
    folded maxima of ``ops/pallas_assembly.fused_assembly_pair``)."""
    rho = jnp.minimum(rho_raw * margin, 0.999)
    lmin = 1.0 - rho
    lmax = 1.0 + rho
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    sigma1 = theta / delta
    return theta, delta, sigma1


def _chebyshev_bounds(c, mask, margin: float = 1.05):
    """Spectral interval for ``D^-1 A`` from Gershgorin: every disk is
    centered at 1 with radius ``sum(a_nb)/a_p`` (power-law neighbor
    coefficients are nonnegative), so the spectrum lies in
    ``[1 - rho, 1 + rho]`` with ``rho = max_masked ratio`` — ONE global
    reduction per solve.  Returns ``(theta, delta, sigma1)`` scalars."""
    safe_ap = jnp.where(c.a_p == 0, jnp.ones_like(c.a_p), c.a_p)
    if isinstance(c, MomentumCoeffs9):
        from ..ops.highorder import _OFFSETS

        nb_abs = sum(jnp.abs(getattr(c, name)) for name in _OFFSETS)
    else:
        nb_abs = (jnp.abs(c.a_e) + jnp.abs(c.a_w)
                  + jnp.abs(c.a_n) + jnp.abs(c.a_s))
    ratio = jnp.where(mask, nb_abs / safe_ap, 0.0)
    return _bounds_from_rho(jnp.max(ratio), margin)


def _chebyshev_iterate(x0, c, mask, theta, delta, sigma1, degree: int):
    """The reduction-free part of the Chebyshev solve: ``degree`` fused
    stencil applies + axpys (standard D'Azevedo/hypre three-term
    recurrence), given precomputed interval scalars.  Shared verbatim by
    the XLA path and the strip-blocked Pallas kernel
    (``ops/pallas_cheby.py``) so the two trace identical arithmetic."""
    dtype = x0.dtype
    mask_f = mask.astype(dtype)
    safe_ap = jnp.where(c.a_p == 0, jnp.ones_like(c.a_p), c.a_p)
    inv_d = mask_f / safe_ap

    def A(x):
        return _apply(x, c) * mask_f

    b = c.src * mask_f
    x = x0 * mask_f
    r = b - A(x)
    d = (r * inv_d) / theta
    x = x + d
    rho_k = 1.0 / sigma1
    for _ in range(degree - 1):
        r = b - A(x)
        rho_next = 1.0 / (2.0 * sigma1 - rho_k)
        d = (rho_next * rho_k) * d + (2.0 * rho_next / delta) * (r * inv_d)
        x = x + d
        rho_k = rho_next
    return jnp.where(mask, x, x0)


def _chebyshev_masked(x0, c, mask, degree: int, margin: float = 1.05,
                      bounds=None):
    """Fixed-degree Chebyshev iteration on the masked momentum system,
    preconditioned by the diagonal (see :class:`ChebyshevMomentumConfig`).
    ``bounds``: optional precomputed ``(theta, delta, sigma1)`` (the
    in-assembly Gershgorin fold) — skips the five-array read + max."""
    if bounds is None:
        bounds = _chebyshev_bounds(c, mask, margin)
    theta, delta, sigma1 = bounds
    return _chebyshev_iterate(x0, c, mask, theta, delta, sigma1, degree)


def _bicgstab_masked(x0, c, mask, tol: float, maxiter: int,
                     compensated_dots: bool = False):
    """Matrix-free BiCGSTAB restricted to masked nodes (boundary nodes are
    held fixed; Practice-B folding makes the masked system self-contained).

    ``compensated_dots``: evaluate the Krylov dots/norms with the pairwise
    two-sum reductions of ``ops/compensated.py``.  Set when this function is
    traced INSIDE a Pallas kernel (``ops/pallas_step.py``): Mosaic's
    sequential in-kernel reductions lose O(n*eps) on 64k-element arrays,
    which weakened the stopping tests enough that the 255^2 fused step
    creeped at ~3.5e-5.  The XLA path keeps plain ``jnp.sum`` (tree
    reductions are already accurate, and fold passes would cost HBM
    bandwidth there)."""
    mask_f = mask.astype(x0.dtype)
    if compensated_dots:
        from ..ops.compensated import fold_dot
        dot = fold_dot
    else:
        dot = lambda a, b: jnp.sum(a * b)

    def A(x):
        return _apply(x, c) * mask_f

    b = c.src * mask_f
    r0 = b - A(x0 * mask_f)
    x = x0 * mask_f
    rhat = r0
    rho = alpha = omega_ = jnp.asarray(1.0, x0.dtype)
    v = p = jnp.zeros_like(x0)
    bnorm = jnp.sqrt(dot(b, b))
    tol2 = (tol * jnp.maximum(bnorm, 1e-30)) ** 2
    eps = jnp.asarray(jnp.finfo(x0.dtype).tiny * 1e6, x0.dtype)

    def cond(carry):
        x, r, rhat, rho, alpha, omega_, v, p, k, ok = carry
        return ok & (k < maxiter) & (dot(r, r) > tol2)

    def body(carry):
        x, r, rhat, rho, alpha, omega_, v, p, k, ok = carry
        rho_new = dot(rhat, r)
        good = (jnp.abs(rho) > eps) & (jnp.abs(omega_) > eps)
        beta = jnp.where(good, (rho_new / jnp.where(rho == 0, 1.0, rho))
                         * (alpha / jnp.where(omega_ == 0, 1.0, omega_)), 0.0)
        p = r + beta * (p - omega_ * v)
        v = A(p)
        denom = dot(rhat, v)
        good = good & (jnp.abs(denom) > eps)
        alpha = jnp.where(good, rho_new / jnp.where(denom == 0, 1.0, denom), 0.0)
        s = r - alpha * v
        t = A(s)
        tt = dot(t, t)
        omega_new = jnp.where(tt > eps, dot(t, s) / jnp.where(tt == 0, 1.0, tt), 0.0)
        x = x + alpha * p + omega_new * s
        r = s - omega_new * t
        return (x, r, rhat, rho_new, alpha, omega_new, v, p, k + 1, good)

    carry = (x, r0, rhat, rho, alpha, omega_, v, p, jnp.asarray(0, jnp.int32),
             jnp.asarray(True))
    x, *_ = jax.lax.while_loop(cond, body, carry)
    return jnp.where(mask, x, x0)


def _shift_e3(x):
    return jnp.pad(x[:, 1:, :], ((0, 0), (0, 1), (0, 0)))


def _shift_w3(x):
    return jnp.pad(x[:, :-1, :], ((0, 0), (1, 0), (0, 0)))


def _shift_n3(x):
    return jnp.pad(x[:, :, 1:], ((0, 0), (0, 0), (0, 1)))


def _shift_s3(x):
    return jnp.pad(x[:, :, :-1], ((0, 0), (0, 0), (1, 0)))


def _bicgstab_pair_masked(xu0, cu, mask_u, xv0, cv, mask_v,
                          tol: float, maxiter: int):
    """The u and v momentum solves BATCHED into one Krylov loop.

    The two predictor systems are independent, but running them
    sequentially doubles the serialized reduction rounds — and at
    1024^2+ the masked BiCGSTAB is reduction-latency-bound, not
    FLOP-bound (measured round 4, ``benchmarks/profile_phases.py``:
    6.8 ms of an 18.1 ms step at 2048^2 is the two Krylov loops; each
    iteration's 4 dots + 2 norms are full-array pipeline barriers).
    Stacking the padded systems into a ``(2, nx+1, ny+1)`` batch halves
    the number of barriers: every dot becomes one fused reduction to a
    ``(2,)`` vector and every scalar of the recurrence becomes a
    2-vector broadcast.

    Per-system arithmetic is IDENTICAL to :func:`_bicgstab_masked`
    (padded cells are masked out of the operator and carry zeros through
    every reduction); each system freezes — its whole carry held — once
    ITS residual passes tolerance, so iteration counts and iterates
    match the sequential solves to reduction-reassociation roundoff.
    The loop runs until both systems are done.
    """
    nxp1, ny = xu0.shape
    nx, nyp1 = xv0.shape
    M, N = max(nxp1, nx), max(ny, nyp1)

    def pad2(x, fill=0.0):
        return jnp.pad(x, ((0, M - x.shape[0]), (0, N - x.shape[1])),
                       constant_values=fill)

    def stack(fu, fv, fill=0.0):
        return jnp.stack([pad2(fu, fill), pad2(fv, fill)])

    mask = stack(mask_u.astype(xu0.dtype), mask_v.astype(xv0.dtype))
    a_e = stack(cu.a_e, cv.a_e)
    a_w = stack(cu.a_w, cv.a_w)
    a_n = stack(cu.a_n, cv.a_n)
    a_s = stack(cu.a_s, cv.a_s)
    a_p = stack(cu.a_p, cv.a_p, fill=1.0)
    b = stack(cu.src, cv.src) * mask
    x0 = stack(xu0, xv0)

    def A(x):
        return (a_p * x - a_e * _shift_e3(x) - a_w * _shift_w3(x)
                - a_n * _shift_n3(x) - a_s * _shift_s3(x)) * mask

    def dot(a, bb):
        return jnp.sum(a * bb, axis=(1, 2))

    x = x0 * mask
    r0 = b - A(x)
    rhat = r0
    ones = jnp.ones((2,), x0.dtype)
    rho = alpha = omega_ = ones
    v = p = jnp.zeros_like(x)
    bnorm = jnp.sqrt(dot(b, b))
    tol2 = (tol * jnp.maximum(bnorm, 1e-30)) ** 2
    eps = jnp.asarray(jnp.finfo(x0.dtype).tiny * 1e6, x0.dtype)

    def sel(act, new, old):
        return jnp.where(act[:, None, None], new, old)

    def cond(carry):
        x, r, rhat, rho, alpha, omega_, v, p, k, ok = carry
        return (k < maxiter) & jnp.any(ok & (dot(r, r) > tol2))

    def body(carry):
        x, r, rhat, rho, alpha, omega_, v, p, k, ok = carry
        act = ok & (dot(r, r) > tol2)
        rho_new = dot(rhat, r)
        good = (jnp.abs(rho) > eps) & (jnp.abs(omega_) > eps)
        beta = jnp.where(good, (rho_new / jnp.where(rho == 0, 1.0, rho))
                         * (alpha / jnp.where(omega_ == 0, 1.0, omega_)), 0.0)
        p_new = r + beta[:, None, None] * (p - omega_[:, None, None] * v)
        v_new = A(p_new)
        denom = dot(rhat, v_new)
        good = good & (jnp.abs(denom) > eps)
        alpha_new = jnp.where(good, rho_new / jnp.where(denom == 0, 1.0, denom),
                              0.0)
        s = r - alpha_new[:, None, None] * v_new
        t = A(s)
        tt = dot(t, t)
        omega_new = jnp.where(tt > eps, dot(t, s) / jnp.where(tt == 0, 1.0, tt),
                              0.0)
        x_new = x + alpha_new[:, None, None] * p_new \
            + omega_new[:, None, None] * s
        r_new = s - omega_new[:, None, None] * t
        return (sel(act, x_new, x), sel(act, r_new, r), rhat,
                jnp.where(act, rho_new, rho), jnp.where(act, alpha_new, alpha),
                jnp.where(act, omega_new, omega_), sel(act, v_new, v),
                sel(act, p_new, p), k + 1, jnp.where(act, good, ok))

    carry = (x, r0, rhat, rho, alpha, omega_, v, p,
             jnp.asarray(0, jnp.int32), jnp.ones((2,), bool))
    x, *_ = jax.lax.while_loop(cond, body, carry)
    xu = jnp.where(mask_u, x[0, :nxp1, :ny], xu0)
    xv = jnp.where(mask_v, x[1, :nx, :nyp1], xv0)
    return xu, xv


def _gmres_masked(x0, c, mask, tol: float, maxiter: int, restart: int):
    """Restarted GMRES(m) on the masked momentum system with Jacobi right
    preconditioning (see GMRESMomentumConfig)."""
    from .krylov import gmres_solve

    mask_f = mask.astype(x0.dtype)

    def A(x):
        return _apply(x, c) * mask_f

    inv_d = jnp.where(c.a_p == 0, jnp.zeros_like(c.a_p), 1.0 / c.a_p) * mask_f
    M = lambda r: r * inv_d
    b = c.src * mask_f
    x, _, _ = gmres_solve(b, A, M, x0 * mask_f, tol, maxiter, restart)
    return jnp.where(mask, x, x0)


def _idrs_masked(x0, c, mask, tol: float, max_outer: int, s: int, angle: float):
    """IDR(s) on the masked momentum system (see IDRSMomentumConfig)."""
    dtype = x0.dtype
    mask_f = mask.astype(dtype)

    def A(x):
        return _apply(x, c) * mask_f

    b = c.src * mask_f
    x = x0 * mask_f
    r = b - A(x)
    P = jax.random.normal(jax.random.PRNGKey(0), (s,) + x0.shape, dtype)
    pdot = lambda a, w: jnp.einsum("ij,ij->", a, w)

    U = jnp.zeros((s,) + x0.shape, dtype)
    G = jnp.zeros((s,) + x0.shape, dtype)
    Ms = jnp.eye(s, dtype=dtype)
    om = jnp.asarray(1.0, dtype)
    bnorm = jnp.linalg.norm(b)
    tolb = tol * jnp.maximum(bnorm, 1e-30)

    def cond(carry):
        x, r, U, G, Ms, om, it = carry
        return (it < max_outer) & (jnp.linalg.norm(r) >= tolb)

    def body(carry):
        x, r, U, G, Ms, om, it = carry
        f = jnp.stack([pdot(P[i], r) for i in range(s)])
        for k in range(s):  # static unroll
            ck = jnp.linalg.solve(Ms[k:, k:], f[k:])
            v = r - jnp.einsum("m,mij->ij", ck, G[k:])
            u_new = jnp.einsum("m,mij->ij", ck, U[k:]) + om * v
            g_new = A(u_new)
            for i in range(k):
                alpha = pdot(P[i], g_new) / jnp.where(Ms[i, i] == 0, 1e-30, Ms[i, i])
                g_new = g_new - alpha * G[i]
                u_new = u_new - alpha * U[i]
            col = jnp.stack(
                [pdot(P[i], g_new) if i >= k else jnp.asarray(0.0, dtype)
                 for i in range(s)]
            )
            Ms = Ms.at[:, k].set(col)
            beta = f[k] / jnp.where(Ms[k, k] == 0, 1e-30, Ms[k, k])
            x = x + beta * u_new
            r = r - beta * g_new
            U = U.at[k].set(u_new)
            G = G.at[k].set(g_new)
            if k < s - 1:
                f = f.at[k + 1 :].add(-beta * Ms[k + 1 :, k])
        # dimension-reduction omega step (reference :309-330)
        t = A(r)
        nr = jnp.linalg.norm(r)
        nt = jnp.linalg.norm(t)
        ts = pdot(t, r)
        rho = jnp.abs(ts / jnp.maximum(nt * nr, 1e-30))
        om = ts / jnp.maximum(nt * nt, 1e-30)
        om = jnp.where(rho < angle, om * angle / jnp.maximum(rho, 1e-30), om)
        x = x + om * r
        r = r - om * t
        return (x, r, U, G, Ms, om, it + 1)

    carry = (x, r, U, G, Ms, om, jnp.asarray(0, jnp.int32))
    x, *_ = jax.lax.while_loop(cond, body, carry)
    return jnp.where(mask, x, x0)


def _inner_solve(x0, c_rel, mask, cfg, bounds=None):
    if cfg.kind == "jacobi":
        return _jacobi_sweeps(x0, c_rel, mask, cfg.n_sweeps)
    if cfg.kind == "rbgs":
        return _rbgs_sweeps(x0, c_rel, mask, cfg.n_sweeps, cfg.omega)
    if cfg.kind == "chebyshev":
        return _chebyshev_masked(x0, c_rel, mask, cfg.degree,
                                 cfg.bound_margin, bounds=bounds)
    if cfg.kind == "bicgstab":
        if (getattr(cfg, "backend", "auto") in ("auto", "pallas")
                and not isinstance(c_rel, MomentumCoeffs9)
                and jax.default_backend() == "tpu"):
            from ..ops.pallas_krylov import (bicgstab_momentum_pallas,
                                            supports_fused_bicgstab)

            if supports_fused_bicgstab(x0.shape, x0.dtype):
                return bicgstab_momentum_pallas(
                    x0, c_rel, tol=cfg.tolerance,
                    maxiter=cfg.max_iterations)
        return _bicgstab_masked(
            x0, c_rel, mask, cfg.tolerance, cfg.max_iterations,
            compensated_dots=getattr(cfg, "compensated_dots", False))
    if cfg.kind == "gmres":
        return _gmres_masked(x0, c_rel, mask, cfg.tolerance, cfg.max_iterations,
                             cfg.restart)
    if cfg.kind == "idrs":
        return _idrs_masked(x0, c_rel, mask, cfg.tolerance, cfg.max_iterations,
                            cfg.s, cfg.angle)
    raise ValueError(f"Unknown momentum solver kind: {cfg.kind}")


def _unrelaxed_residual(x_star, c_un, *, is_u: bool, compensated: bool = False):
    """r = src_un - A_un x, border-zeroed field + interior L2 norm
    (reference ``AMG_solver._calculate_unrelaxed_residual``).

    ``compensated=True`` evaluates the residual as an error-free
    transformation (``ops/compensated.py``): in f32 the plain evaluation
    floors near 2e-7 relative (cancellation of O(1) stencil terms), the
    compensated one resolves the exact residual to f32 roundoff — the
    TPU path to the reference's 1e-7 convergence regime.
    """
    if compensated:
        from ..ops.compensated import compensated_linear_combination, compensated_norm

        if isinstance(c_un, MomentumCoeffs9):
            from ..ops.highorder import _OFFSETS, shift

            terms = [c_un.src] + [
                (getattr(c_un, name), shift(x_star, di, dj))
                for name, (di, dj) in _OFFSETS.items()
            ] + [(-c_un.a_p, x_star)]
        else:
            terms = [
                c_un.src,
                (c_un.a_e, shift_e(x_star)),
                (c_un.a_w, shift_w(x_star)),
                (c_un.a_n, shift_n(x_star)),
                (c_un.a_s, shift_s(x_star)),
                (-c_un.a_p, x_star),
            ]
        r, _ = compensated_linear_combination(terms)
    else:
        r = c_un.src - _apply(x_star, c_un)
    ni, nj = r.shape
    if is_u:
        nx, ny = ni - 1, nj
        interior = r[1:nx, 1 : ny - 1]
        rf = jnp.where(interior_mask(r.shape, 2, 2, 1, 1), r, 0.0)
    else:
        nx, ny = ni, nj - 1
        interior = r[1 : nx - 1, 1:ny]
        rf = jnp.where(interior_mask(r.shape, 1, 1, 2, 2), r, 0.0)
    if compensated:
        from ..ops.compensated import compensated_norm

        norm = compensated_norm(interior)
    else:
        norm = jnp.linalg.norm(interior)
    return rf, norm


def _cheby_strips_applicable(cfg, shape, dtype, c_rel):
    """Gate for the strip-blocked Chebyshev solve+residual kernel
    (ops/pallas_cheby.py): five-point systems on large TPU grids."""
    if getattr(cfg, "kind", None) != "chebyshev":
        return False
    if getattr(cfg, "backend", "auto") not in ("auto", "pallas"):
        return False
    if getattr(cfg, "compensated_residual", False):
        return False  # the compensated residual stays on the XLA path
    if not isinstance(c_rel, StencilCoeffs):
        return False  # 9-point QUICK/LUDS systems
    from ..ops.pallas_cheby import supports_cheby_strips

    return supports_cheby_strips(shape, dtype)


def _cheby_strip_field(x0, c_un, c_rel, mask, cfg, *, is_u: bool,
                       bounds=None):
    """One field through the fused strip kernel.  Returns the same
    ``(x_star, r_field, r_norm)`` as the XLA composition: the kernel's
    masked residual zeroes exactly the complement of the norm region, so
    its L2 IS the reference interior norm, and the diagnostics field is a
    further border mask of it (``_unrelaxed_residual`` margins)."""
    from ..ops.pallas_cheby import chebyshev_momentum_strips

    if bounds is None:
        bounds = _chebyshev_bounds(c_rel, mask, cfg.bound_margin)
    theta, delta, sigma1 = bounds
    x_star, r_m = chebyshev_momentum_strips(
        x0, c_rel, c_un, theta=theta, delta=delta, sigma1=sigma1,
        degree=cfg.degree)
    margins = (2, 2, 1, 1) if is_u else (1, 1, 2, 2)
    r_field = jnp.where(interior_mask(r_m.shape, *margins), r_m, 0.0)
    return x_star, r_field, jnp.linalg.norm(r_m)


def solve_u_momentum(u, v, p, *, dx, dy, rho, mu, alpha, bc: BoundaryConditions, cfg,
                     coeffs=None, gersh_rho=None, d_pre=None):
    """u-momentum predictor.  Returns (u_star, d_u, r_field, r_norm).

    ``coeffs``: optional precomputed ``(c_un, c_rel)`` pair (the strip-fused
    assembly of :func:`solve_momentum_pair`); BCs must already be applied.
    ``gersh_rho``: optional raw masked Gershgorin ratio maximum of the
    relaxed system (folded into the assembly kernel) — used by the
    Chebyshev solver in place of its own five-array read + max barrier.
    ``d_pre``: optional precomputed d-coefficient field (same fold).
    """
    u, v = apply_velocity_bcs(u, v, bc)
    if coeffs is not None:
        c_un, c_rel = coeffs
    else:
        c_un = _assemble_coeffs(u, v, p, dx=dx, dy=dy, rho=rho, mu=mu,
                                scheme=getattr(cfg, "scheme", "power_law"),
                                is_u=True)
        c_rel = _relax(c_un, u, alpha)
    mask = _u_interior_mask(u.shape)
    d_u = (d_pre if d_pre is not None
           else d_coefficient(c_rel.a_p, dy, is_u=True))
    bounds = (None if gersh_rho is None
              else _bounds_from_rho(gersh_rho,
                                    getattr(cfg, "bound_margin", 1.05)))
    if _cheby_strips_applicable(cfg, u.shape, u.dtype, c_rel):
        u_star, r_field, r_norm = _cheby_strip_field(
            u, c_un, c_rel, mask, cfg, is_u=True, bounds=bounds)
        u_star, _ = apply_velocity_bcs(u_star, v, bc)
        return u_star, d_u, r_field, r_norm
    u_star = _inner_solve(u, c_rel, mask, cfg, bounds=bounds)
    u_star, _ = apply_velocity_bcs(u_star, v, bc)
    r_field, r_norm = _unrelaxed_residual(
        u_star, c_un, is_u=True,
        compensated=getattr(cfg, "compensated_residual", False))
    return u_star, d_u, r_field, r_norm


def solve_v_momentum(u, v, p, *, dx, dy, rho, mu, alpha, bc: BoundaryConditions, cfg,
                     coeffs=None, gersh_rho=None, d_pre=None):
    """v-momentum predictor.  Returns (v_star, d_v, r_field, r_norm)."""
    u, v = apply_velocity_bcs(u, v, bc)
    if coeffs is not None:
        c_un, c_rel = coeffs
    else:
        c_un = _assemble_coeffs(u, v, p, dx=dx, dy=dy, rho=rho, mu=mu,
                                scheme=getattr(cfg, "scheme", "power_law"),
                                is_u=False)
        c_rel = _relax(c_un, v, alpha)
    mask = _v_interior_mask(v.shape)
    d_v = (d_pre if d_pre is not None
           else d_coefficient(c_rel.a_p, dx, is_u=False))
    bounds = (None if gersh_rho is None
              else _bounds_from_rho(gersh_rho,
                                    getattr(cfg, "bound_margin", 1.05)))
    if _cheby_strips_applicable(cfg, v.shape, v.dtype, c_rel):
        v_star, r_field, r_norm = _cheby_strip_field(
            v, c_un, c_rel, mask, cfg, is_u=False, bounds=bounds)
        _, v_star = apply_velocity_bcs(u, v_star, bc)
        return v_star, d_v, r_field, r_norm
    v_star = _inner_solve(v, c_rel, mask, cfg, bounds=bounds)
    _, v_star = apply_velocity_bcs(u, v_star, bc)
    r_field, r_norm = _unrelaxed_residual(
        v_star, c_un, is_u=False,
        compensated=getattr(cfg, "compensated_residual", False))
    return v_star, d_v, r_field, r_norm


def asmcheby_enabled(nx, ny, cfg, scheme="power_law",
                     dtype=jnp.float32) -> bool:
    """Static gate for the merged in-kernel-assembling Chebyshev path
    (``ops/pallas_asmcheby.py``).  The SIMPLE loop uses this to decide —
    at build time, from the mesh dims — whether to carry the lagged
    Gershgorin maxima in its ``extra`` state; it must therefore predict
    :func:`solve_momentum_pair`'s merged branch exactly."""
    if getattr(cfg, "kind", None) != "chebyshev":
        return False
    if getattr(cfg, "backend", "auto") not in ("auto", "pallas"):
        return False
    if getattr(cfg, "merged_assembly", "auto") == "off":
        return False
    if getattr(cfg, "compensated_residual", False):
        return False  # the compensated residual stays on the XLA path
    from ..ops.pallas_asmcheby import supports_asmcheby

    return supports_asmcheby(nx, ny, scheme, dtype,
                             getattr(cfg, "backend", "auto"), cfg.degree)


def solve_momentum_pair(u, v, p, *, dx, dy, rho, mu, alpha,
                        bc: BoundaryConditions, cfg,
                        poisson_variant: str | None = None,
                        lagged_rho=None):
    """Both momentum predictors, with the coefficient assembly of the two
    fields fused into one strip-blocked Pallas pass on large TPU grids
    (``ops/pallas_assembly.py`` — measured 0.64 ms/iter of XLA assembly at
    1024^2 against a ~0.1 ms streaming roofline).  Falls back to the
    separate :func:`solve_u_momentum` / :func:`solve_v_momentum` path
    everywhere else.  Returns ``((u_star, d_u, r_u, u_norm),
    (v_star, d_v, r_v, v_norm))``.

    ``poisson_variant``: when set, ALSO returns a third element — the
    pressure-correction operator ``pc`` folded into the assembly kernel
    (``fused_assembly_pair(poisson_variant=...)``), or ``None`` where the
    fused assembly did not run (the caller rebuilds it in XLA).

    ``lagged_rho``: when not None — a ``(rho_u, rho_v)`` pair of the
    previous outer iteration's masked Gershgorin ratio maxima — run the
    merged assemble+solve kernel (``ops/pallas_asmcheby.py``: the 16
    coefficient arrays never touch HBM; the Chebyshev interval comes
    from the lagged maxima) and return a FOURTH element, the fresh
    ``(rho_u, rho_v)`` pair for the next iteration.  The caller must
    pass this only when :func:`asmcheby_enabled` is True for the same
    configuration (the SIMPLE loop's ``extra``-carry shape depends on
    it)."""
    from ..ops.pallas_assembly import (fused_assembly_pair,
                                      supports_fused_assembly)

    nxp1, ny = u.shape
    scheme = getattr(cfg, "scheme", "power_law")
    if lagged_rho is not None:
        if not asmcheby_enabled(nxp1 - 1, ny, cfg, scheme, u.dtype):
            raise ValueError(
                "lagged_rho passed but the merged asmcheby kernel is not "
                "applicable here — the caller's static gate is out of "
                "sync with asmcheby_enabled")
        if poisson_variant is None:
            raise ValueError("the merged asmcheby path requires the "
                             "poisson fold (poisson_variant set)")
        from ..ops.pallas_asmcheby import fused_asmcheby_pair

        margin = getattr(cfg, "bound_margin", 1.05)
        ub, vb = apply_velocity_bcs(u, v, bc)
        (u_star, r_u, v_star, r_v, d_u, d_v, pc,
         rho_u_new, rho_v_new) = fused_asmcheby_pair(
            ub, vb, p, dx=dx, dy=dy, rho=rho, mu=mu, alpha=alpha,
            degree=cfg.degree,
            bounds_u=_bounds_from_rho(lagged_rho[0], margin),
            bounds_v=_bounds_from_rho(lagged_rho[1], margin),
            poisson_variant=poisson_variant)
        u_star, v_star = apply_velocity_bcs(u_star, v_star, bc)
        # norms + diagnostics margins: _cheby_strip_field semantics (the
        # kernel's masked residual complement IS the norm region)
        u_norm = jnp.linalg.norm(r_u)
        v_norm = jnp.linalg.norm(r_v)
        r_u = jnp.where(interior_mask(r_u.shape, 2, 2, 1, 1), r_u, 0.0)
        r_v = jnp.where(interior_mask(r_v.shape, 1, 1, 2, 2), r_v, 0.0)
        return ((u_star, d_u, r_u, u_norm), (v_star, d_v, r_v, v_norm),
                pc, (rho_u_new, rho_v_new))
    coeffs = None
    rho_u = rho_v = None
    d_u_f = d_v_f = pc_f = None
    if supports_fused_assembly(nxp1 - 1, ny, scheme, u.dtype,
                               getattr(cfg, "backend", "auto")):
        u, v = apply_velocity_bcs(u, v, bc)
        # in-assembly Gershgorin fold: the Chebyshev bounds come out
        # of the kernel, saving two five-array reads + two barriers
        want_bounds = (getattr(cfg, "kind", None) == "chebyshev"
                       and getattr(cfg, "assembly_bounds", "auto") == "auto")
        res = fused_assembly_pair(
            u, v, p, dx=dx, dy=dy, rho=rho, mu=mu, alpha=alpha,
            with_bounds=want_bounds, poisson_variant=poisson_variant)
        cu_un, cu_rel, cv_un, cv_rel = res[:4]
        i = 4
        if want_bounds:
            rho_u, rho_v = res[i:i + 2]
            i += 2
        if poisson_variant is not None:
            d_u_f, d_v_f, pc_f = res[i:i + 3]
        coeffs = (cu_un, cu_rel, cv_un, cv_rel)

    if _pair_krylov_applicable(cfg, u.shape, v.shape, u.dtype,
                               scheme, coeffs):
        # batched u+v BiCGSTAB: one Krylov loop, half the reduction
        # barriers (see _bicgstab_pair_masked) — the large-grid regime
        # where the per-field fused VMEM kernel no longer fits
        ub, vb = apply_velocity_bcs(u, v, bc)
        if coeffs is not None:
            cu_un, cu_rel, cv_un, cv_rel = coeffs
        else:
            cu_un = _assemble_coeffs(ub, vb, p, dx=dx, dy=dy, rho=rho,
                                     mu=mu, scheme=scheme, is_u=True)
            cu_rel = _relax(cu_un, ub, alpha)
            cv_un = _assemble_coeffs(ub, vb, p, dx=dx, dy=dy, rho=rho,
                                     mu=mu, scheme=scheme, is_u=False)
            cv_rel = _relax(cv_un, vb, alpha)
        u_star, v_star = _bicgstab_pair_masked(
            ub, cu_rel, _u_interior_mask(ub.shape),
            vb, cv_rel, _v_interior_mask(vb.shape),
            cfg.tolerance, cfg.max_iterations)
        u_star, v_star = apply_velocity_bcs(u_star, v_star, bc)
        d_u = (d_u_f if d_u_f is not None
               else d_coefficient(cu_rel.a_p, dy, is_u=True))
        d_v = (d_v_f if d_v_f is not None
               else d_coefficient(cv_rel.a_p, dx, is_u=False))
        comp = getattr(cfg, "compensated_residual", False)
        r_u, u_norm = _unrelaxed_residual(u_star, cu_un, is_u=True,
                                          compensated=comp)
        r_v, v_norm = _unrelaxed_residual(v_star, cv_un, is_u=False,
                                          compensated=comp)
        out_u = (u_star, d_u, r_u, u_norm)
        out_v = (v_star, d_v, r_v, v_norm)
        return ((out_u, out_v) if poisson_variant is None
                else (out_u, out_v, pc_f))

    if coeffs is not None:
        cu_un, cu_rel, cv_un, cv_rel = coeffs
        out_u = solve_u_momentum(u, v, p, dx=dx, dy=dy, rho=rho, mu=mu,
                                 alpha=alpha, bc=bc, cfg=cfg,
                                 coeffs=(cu_un, cu_rel), gersh_rho=rho_u,
                                 d_pre=d_u_f)
        out_v = solve_v_momentum(u, v, p, dx=dx, dy=dy, rho=rho, mu=mu,
                                 alpha=alpha, bc=bc, cfg=cfg,
                                 coeffs=(cv_un, cv_rel), gersh_rho=rho_v,
                                 d_pre=d_v_f)
        return ((out_u, out_v) if poisson_variant is None
                else (out_u, out_v, pc_f))
    out_u = solve_u_momentum(u, v, p, dx=dx, dy=dy, rho=rho, mu=mu,
                             alpha=alpha, bc=bc, cfg=cfg)
    out_v = solve_v_momentum(u, v, p, dx=dx, dy=dy, rho=rho, mu=mu,
                             alpha=alpha, bc=bc, cfg=cfg)
    return ((out_u, out_v) if poisson_variant is None
            else (out_u, out_v, None))


def _pair_krylov_applicable(cfg, u_shape, v_shape, dtype, scheme, coeffs):
    """Batched-pair BiCGSTAB gate: 5-point power-law systems where the
    per-field fused VMEM kernel (ops/pallas_krylov.py) does NOT apply —
    i.e. the large grids whose cost is reduction barriers, not FLOPs.
    ``batch_pair='off'`` forces the sequential path (parity studies)."""
    if getattr(cfg, "kind", None) != "bicgstab":
        return False
    if getattr(cfg, "batch_pair", "auto") == "off":
        return False
    if getattr(cfg, "compensated_dots", False):
        return False  # the batched dots are plain reassociated sums — a
        # config that asked for compensated reductions must not silently
        # lose them (advisor r4); the sequential path honors the flag
    if getattr(cfg, "backend", "auto") == "xla":
        return False  # sequential-parity escape hatch alongside
        # batch_pair='off' (advisor r4)
    if scheme != "power_law":
        return False  # 9-point QUICK/LUDS systems use MomentumCoeffs9
    if (getattr(cfg, "backend", "auto") in ("auto", "pallas")
            and jax.default_backend() == "tpu"):
        from ..ops.pallas_krylov import supports_fused_bicgstab

        if (supports_fused_bicgstab(u_shape, dtype)
                and supports_fused_bicgstab(v_shape, dtype)):
            return False  # the one-kernel-per-field path wins when it fits
    return True
