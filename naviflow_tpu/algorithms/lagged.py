"""Lagged Galerkin coarse-hierarchy carry, shared by all SIMPLE-family
algorithms.

With ``MultigridConfig(coarse_rebuild_every=K > 1)`` the coarse Galerkin
operators (the RAP build, measured ~30% of a SIMPLE step at 255^2) are
rebuilt only every K outer iterations and carried across iterations in the
algorithm's ``extra`` pytree.  The *fine* operator is always assembled from
the current d-coefficients, so the pressure solve's fixed point is the exact
solution of the current system; staleness only affects the coarse-grid
error-correction rate (and in practice barely that — the d-fields drift
slowly near convergence).

Not applicable to ``smoother='chebyshev'`` (its per-level spectral bounds
are not carried); those configs silently rebuild every iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uses_lagged_mg(pres_cfg) -> bool:
    return (
        getattr(pres_cfg, "kind", "") == "multigrid"
        and getattr(pres_cfg, "coarse_rebuild_every", 1) > 1
        and getattr(pres_cfg, "smoother", "gs") != "chebyshev"
    )


def make_lagged_mg(pres_cfg, *, dx, dy, rho, variant):
    """Build the three pieces of the lagged-hierarchy protocol.

    Returns ``(refresh, solve, extra0)``:

    * ``refresh(d_u, d_v, mg_extra) -> coarse`` — rebuilds the coarse
      stencil tuple when ``age % K == 0``, else reuses the carried one;
    * ``solve(b, pc, d_u, d_v, p_like, coarse) -> (p', PressureSolveInfo)``
      — multigrid solve on [fresh fine level] + [carried coarse levels];
    * ``extra0(dtype, nx, ny) -> (age0, coarse0)`` — structural placeholder
      carry (age 0 forces a rebuild on the first iteration).

    ``mg_extra`` convention: ``(age: int32, coarse: tuple[Stencil9, ...])``;
    algorithms advance it as ``(age + 1, refresh(...))``.
    """
    from ..ops.stencil9 import from_poisson
    from ..solvers.multigrid import build_levels, coarse_stencils, multigrid_solve

    K = pres_cfg.coarse_rebuild_every

    def refresh(d_u, d_v, mg_extra):
        age, coarse_old = mg_extra
        return jax.lax.cond(
            age % K == 0,
            lambda: coarse_stencils(
                build_levels(d_u, d_v, pres_cfg, dx=dx, dy=dy, rho=rho,
                             variant=variant)
            ),
            lambda: coarse_old,
        )

    def solve(b, pc, d_u, d_v, p_like, coarse):
        fine_st = from_poisson(pc)
        levels = [(fine_st, fine_st.c.shape, True, None)] + [
            (st, st.c.shape, False, None) for st in coarse
        ]
        return multigrid_solve(
            b, d_u, d_v, jnp.zeros_like(p_like), pres_cfg,
            dx=dx, dy=dy, rho=rho, variant=variant, levels=levels,
        )

    def extra0(dt, nx, ny):
        d_u0 = jnp.ones((nx + 1, ny), dt) * dy
        d_v0 = jnp.ones((nx, ny + 1), dt) * dx
        coarse0 = coarse_stencils(
            build_levels(d_u0, d_v0, pres_cfg, dx=dx, dy=dy, rho=rho,
                         variant=variant)
        )
        return (jnp.asarray(0, jnp.int32), coarse0)

    return refresh, solve, extra0
