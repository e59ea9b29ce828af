"""SIMPLE pressure–velocity coupling as one fused, jit-compiled while-loop.

TPU-native rebuild of the reference outer iteration
(``naviflow_oo/solver/Algorithms/simple.py:78-269``).  The Python
while-loop + per-iteration native-library calls become a single
``jax.lax.while_loop`` whose body is the complete SIMPLE step — momentum
predictor, pressure-correction solve, relaxed pressure update, velocity
correction — traced once and compiled to one XLA program.  Residual
histories live in fixed-size device buffers written at the iteration index.

Semantics preserved from the reference loop body (``simple.py:114-212``):
1. u*, v* from the *relaxed* momentum systems, coefficients evaluated at the
   old (u, v, p*);
2. p' from the continuity defect of (u*, v*) with d_u, d_v;
3. ``p = p* + alpha_p p'`` then zero-gradient pressure BCs
   (``base_algorithm.py:161-197``);
4. ``u = u* + d_u (p'_W - p'_P)`` etc., then velocity BCs;
5. convergence on ``max(u_norm, v_norm) <= tol`` where the momentum norms are
   interior L2 norms of the unrelaxed residuals (``simple.py:174``), and the
   pressure rel-norm is ``l2(r_interior)/max_hist`` (``gauss_seidel.py:189-200``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.bc import BoundaryConditions, enforce_pressure_bcs
from ..core.fluid import FluidProperties
from ..core.mesh import StructuredMesh
from ..core.state import FlowState
from ..ops.poisson import max_interior_divergence, poisson_coefficients, pressure_rhs
from ..solvers.momentum import JacobiMomentumConfig, solve_u_momentum, solve_v_momentum
from ..solvers.pressure import RBGSPressureConfig, solve_pressure
from ..solvers.velocity import update_velocity


@dataclasses.dataclass(frozen=True)
class SIMPLEConfig:
    alpha_p: float = 0.3
    alpha_u: float = 0.7
    max_iterations: int = 1000
    tolerance: float = 1e-5
    # 'consistent' (default; converges to machine floor) or 'reference'
    # (bit-parity with the reference operator, stalls near 1e-3 — see
    # ops/poisson.py docstring).
    poisson_variant: str = "consistent"
    # The reference overwrites boundary pressure cells with their interior
    # neighbors every iteration (``base_algorithm.py:161-197``).  On a
    # staggered grid every pressure cell is a genuine unknown; the overwrite
    # zeroes the momentum pressure source at boundary-adjacent nodes and
    # locks the outer iteration into a boundary limit cycle (residual floor
    # ~5e-3).  Off by default; enable only for reference-parity runs.
    overwrite_boundary_pressure: bool = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolveDiagnostics:
    """Per-iteration histories (fixed-size buffers, valid up to ``iterations``)."""

    iterations: jax.Array  # int32: outer iterations executed
    converged: jax.Array  # bool
    final_residual: jax.Array
    u_res_history: jax.Array  # (max_iterations,)
    v_res_history: jax.Array
    p_res_history: jax.Array
    total_res_history: jax.Array
    inner_iters_history: jax.Array  # (max_iterations,) int32 pressure inner iters
    u_residual_field: jax.Array
    v_residual_field: jax.Array
    p_residual_field: jax.Array
    max_divergence: jax.Array


def _simple_step(u, v, p, p_max_l2, *, dx, dy, rho, mu, bc, cfg, mom_cfg, pres_cfg):
    """One SIMPLE outer iteration.  Returns new fields + residual info."""
    p_star = p

    u_star, d_u, r_u, u_norm = solve_u_momentum(
        u, v, p_star, dx=dx, dy=dy, rho=rho, mu=mu, alpha=cfg.alpha_u, bc=bc, cfg=mom_cfg
    )
    v_star, d_v, r_v, v_norm = solve_v_momentum(
        u, v, p_star, dx=dx, dy=dy, rho=rho, mu=mu, alpha=cfg.alpha_u, bc=bc, cfg=mom_cfg
    )

    pin = cfg.poisson_variant == "reference"
    b = pressure_rhs(u_star, v_star, dx=dx, dy=dy, rho=rho, pin=pin)
    pc = poisson_coefficients(d_u, d_v, dx=dx, dy=dy, rho=rho, variant=cfg.poisson_variant)
    p_prime, pinfo = solve_pressure(b, pc, jnp.zeros_like(p), pres_cfg, pin=pin)

    p_new = p_star + cfg.alpha_p * p_prime
    if cfg.overwrite_boundary_pressure:
        p_new = enforce_pressure_bcs(p_new, bc)

    u_new, v_new = update_velocity(u_star, v_star, p_prime, d_u, d_v, bc)

    # Pressure relative norm: interior L2 scaled by its running maximum
    # (reference ``gauss_seidel.py:189-200``).
    p_l2 = jnp.linalg.norm(pinfo.residual_field[1:-1, 1:-1])
    p_max_l2 = jnp.maximum(p_max_l2, p_l2)
    p_rel = jnp.where(p_max_l2 > 0, p_l2 / p_max_l2, jnp.ones_like(p_l2))

    return (
        u_new,
        v_new,
        p_new,
        p_max_l2,
        (u_norm, v_norm, p_rel, pinfo.iterations, r_u, r_v, pinfo.residual_field),
    )


@functools.lru_cache(maxsize=32)
def _build_solve(mesh, fluid, bc, cfg, mom_cfg, pres_cfg, dtype_name):
    dx, dy = mesh.get_cell_sizes()
    rho, mu = fluid.get_density(), fluid.get_viscosity()
    dtype = jnp.dtype(dtype_name)
    n = cfg.max_iterations

    step = functools.partial(
        _simple_step,
        dx=dx,
        dy=dy,
        rho=rho,
        mu=mu,
        bc=bc,
        cfg=cfg,
        mom_cfg=mom_cfg,
        pres_cfg=pres_cfg,
    )

    def solve(u0, v0, p0):
        big = jnp.asarray(jnp.inf, dtype)
        carry0 = dict(
            u=u0,
            v=v0,
            p=p0,
            it=jnp.asarray(0, jnp.int32),
            total=big,
            p_max_l2=jnp.asarray(0.0, dtype),
            hist_u=jnp.zeros((n,), dtype),
            hist_v=jnp.zeros((n,), dtype),
            hist_p=jnp.zeros((n,), dtype),
            hist_total=jnp.zeros((n,), dtype),
            hist_inner=jnp.zeros((n,), jnp.int32),
            r_u=jnp.zeros_like(u0),
            r_v=jnp.zeros_like(v0),
            r_p=jnp.zeros_like(p0),
        )

        def cond(c):
            return (c["it"] < n) & (c["total"] > cfg.tolerance)

        def body(c):
            u, v, p, p_max_l2, info = step(c["u"], c["v"], c["p"], c["p_max_l2"])
            u_norm, v_norm, p_rel, inner_its, r_u, r_v, r_p = info
            total = jnp.maximum(u_norm, v_norm)  # simple.py:174
            it = c["it"]
            return dict(
                u=u,
                v=v,
                p=p,
                it=it + 1,
                total=total.astype(dtype),
                p_max_l2=p_max_l2,
                hist_u=c["hist_u"].at[it].set(u_norm.astype(dtype)),
                hist_v=c["hist_v"].at[it].set(v_norm.astype(dtype)),
                hist_p=c["hist_p"].at[it].set(p_rel.astype(dtype)),
                hist_total=c["hist_total"].at[it].set(total.astype(dtype)),
                hist_inner=c["hist_inner"].at[it].set(inner_its),
                r_u=r_u,
                r_v=r_v,
                r_p=r_p,
            )

        c = jax.lax.while_loop(cond, body, carry0)
        diag = SolveDiagnostics(
            iterations=c["it"],
            converged=c["total"] <= cfg.tolerance,
            final_residual=c["total"],
            u_res_history=c["hist_u"],
            v_res_history=c["hist_v"],
            p_res_history=c["hist_p"],
            total_res_history=c["hist_total"],
            inner_iters_history=c["hist_inner"],
            u_residual_field=c["r_u"],
            v_residual_field=c["r_v"],
            p_residual_field=c["r_p"],
            max_divergence=max_interior_divergence(c["u"], c["v"], dx=dx, dy=dy),
        )
        return FlowState(u=c["u"], v=c["v"], p=c["p"]), diag

    return jax.jit(solve)


def simple_solve(
    mesh: StructuredMesh,
    fluid: FluidProperties,
    bc: BoundaryConditions,
    state: FlowState,
    cfg: SIMPLEConfig = SIMPLEConfig(),
    momentum: object = JacobiMomentumConfig(),
    pressure: object = RBGSPressureConfig(),
) -> Tuple[FlowState, SolveDiagnostics]:
    """Run SIMPLE to convergence (or ``max_iterations``) in one compiled call.

    All configuration objects are static: each distinct combination compiles
    one specialized XLA program (cached across calls).
    """
    fn = _build_solve(
        mesh, fluid, bc, cfg, momentum, pressure, jnp.dtype(state.dtype).name
    )
    return fn(state.u, state.v, state.p)
