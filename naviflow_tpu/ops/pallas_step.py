"""The ENTIRE SIMPLE outer iteration as one Pallas TPU kernel.

Endpoint of the whole-algorithm-fusion line (``pallas_mg.py`` fused the
pressure solve and the RAP rebuild, ``pallas_krylov.py`` the momentum
BiCGSTAB): with the assembly/BC/correction code scatter-free
(``ops/stencil.where_set`` — Mosaic lowers pad/slice/while_loop but not
scatter), the full step body of ``algorithms/simple.make_simple_step``
traces INSIDE a kernel unchanged:

  velocity BCs -> power-law assembly -> relax -> masked BiCGSTAB
  (in-kernel while_loop) -> continuity RHS -> Poisson coefficients ->
  whole multigrid solve (``pallas_mg.mg_solve_value``) -> pressure/velocity
  correction -> residual norms

so one outer iteration is ONE kernel launch — including the Galerkin
RAP rebuild itself (``pallas_mg.galerkin_rap_value``): in-kernel the
rebuild is a handful of MXU matmuls and rolls, so the fused step runs
with ALWAYS-FRESH coarse operators (the semantics of
``coarse_rebuild_every=1``) at less than the XLA path's lagged cost.

This is the latency-bound small-grid path (VMEM-gated like the other
fused kernels); the XLA-composed step remains the fallback and the
reference semantics (`simple.py:114-212`) are bit-matched through the
same shared functions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .pallas_mg import (HAVE_PALLAS, VMEM_BUDGET_BYTES, _padded_bytes,
                        _transfer_matrices, galerkin_rap_value,
                        mg_solve_value, supports_fused)
from .poisson import poisson_coefficients, pressure_rhs
from .stencil9 import Stencil9

if HAVE_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

# see supports_fused_step: the whole-step kernel gets a higher budget than
# the shared 8 MB because its 255^2 instantiation is measured to fit
STEP_VMEM_BUDGET_BYTES = 12 * 2**20


def step_shapes(nx: int, ny: int, pres_cfg):
    """The multigrid level shapes the step kernel will use (odd/vertex)."""
    shapes = [(nx, ny)]
    while min(shapes[-1]) > pres_cfg.coarsest_grid_size:
        nxc = (shapes[-1][0] - 1) // 2
        nyc = (shapes[-1][1] - 1) // 2
        shapes.append((nxc, nyc))
    return shapes


def supports_fused_step(nx, ny, simple_cfg, mom_cfg, pres_cfg, dtype) -> bool:
    """Gate: TPU pallas available, power-law BiCGSTAB momentum, supported
    multigrid config, odd square grid, everything in VMEM."""
    if not HAVE_PALLAS or dtype != jnp.float32:
        return False
    if (getattr(mom_cfg, "kind", "") != "bicgstab"
            or getattr(mom_cfg, "scheme", "power_law") != "power_law"):
        return False
    if getattr(pres_cfg, "kind", "") != "multigrid":
        return False
    # no in-kernel FMG bootstrap: the fused step's pressure solve starts
    # from zeros, so only plain V-cycles keep XLA-path semantics
    if getattr(pres_cfg, "cycle_type", "v") != "v":
        return False
    shapes = step_shapes(nx, ny, pres_cfg)
    fake_levels = [
        (Stencil9(*(jnp.zeros((1, 1), dtype),) * 9), shp, lvl == 0, None)
        for lvl, shp in enumerate(shapes)
    ]
    if not supports_fused(fake_levels, pres_cfg):
        return False
    # hierarchy + ~30 step-level field temporaries (u/v/p, 2x coefficient
    # sets, Krylov vectors, RAP chain) at the fine shape.  The round-2
    # build capped this at the shared 8 MB because the 255^2 step, though
    # it compiled, creeped at ~3.5e-5 outer residual: Mosaic's sequential
    # in-kernel reductions weakened the stopping tests.  Round 3 replaced
    # every in-kernel norm/dot with compensated pairwise fold reductions
    # (ops/compensated.fold_sum), fixing the creep, so the budget is the
    # step kernel's own 12 MB — which admits 255^2 (naive estimate ~11 MB
    # against the ~16 MB scoped-VMEM ceiling; Mosaic's liveness scheduling
    # makes the naive estimate conservative for this kernel's long
    # dependency chain).  Validated on hardware by
    # benchmarks/tpu_numerics_check.py and the bench.py numerics row.
    total = 30 * _padded_bytes(nx, ny)
    for lvl, (snx, sny) in enumerate(shapes):
        total += ((5 if lvl == 0 else 9) + 3) * _padded_bytes(snx, sny)
    return total <= STEP_VMEM_BUDGET_BYTES


def _mk_step_kernel(meta, L, *, dx, dy, rho, mu, bc, simple_cfg, mom_cfg,
                    pres_cfg):
    from ..core.bc import enforce_pressure_bcs
    from ..solvers.momentum import solve_u_momentum, solve_v_momentum
    from ..solvers.velocity import update_velocity

    # backend='xla' so the momentum solve traces inline (no nested
    # pallas_call); compensated_dots because Mosaic's sequential in-kernel
    # reductions weaken the stopping tests at 255^2 (see _bicgstab_masked)
    mom_xla = dataclasses.replace(mom_cfg, backend="xla",
                                  compensated_dots=True,
                                  compensated_residual=True)
    pin = simple_cfg.poisson_variant == "reference"

    shapes = tuple(shp for shp, _ in meta)

    def kernel(*refs):
        u_ref, v_ref, p_ref, pmax_ref = refs[:4]
        trans = [tuple(refs[4 + 4 * l + k][:] for k in range(4))
                 for l in range(L - 1)]
        (u_out, v_out, p_out, pmax_out, ru_out, rv_out, rp_out,
         unorm_out, vnorm_out, prel_out, cyc_out) = refs[-11:]

        u, v, p = u_ref[:], v_ref[:], p_ref[:]
        p_max_l2 = pmax_ref[:][0, 0]

        u_star, d_u, r_u, u_norm = solve_u_momentum(
            u, v, p, dx=dx, dy=dy, rho=rho, mu=mu,
            alpha=simple_cfg.alpha_u, bc=bc, cfg=mom_xla)
        v_star, d_v, r_v, v_norm = solve_v_momentum(
            u, v, p, dx=dx, dy=dy, rho=rho, mu=mu,
            alpha=simple_cfg.alpha_u, bc=bc, cfg=mom_xla)

        b = pressure_rhs(u_star, v_star, dx=dx, dy=dy, rho=rho, pin=pin)
        pc = poisson_coefficients(d_u, d_v, dx=dx, dy=dy, rho=rho,
                                  variant=simple_cfg.poisson_variant)
        fine5 = (pc.diag, -pc.a_e, -pc.a_w, -pc.a_n, -pc.a_s)
        stencils = [fine5] + galerkin_rap_value(fine5, shapes, trans)
        p_prime, r_p, cycles, _ = mg_solve_value(
            jnp.zeros_like(p), b, stencils, trans, meta, pres_cfg,
            mean_normalize=not pin)

        p_new = p + simple_cfg.alpha_p * p_prime
        if simple_cfg.overwrite_boundary_pressure:
            p_new = enforce_pressure_bcs(p_new, bc)
        u_new, v_new = update_velocity(u_star, v_star, p_prime, d_u, d_v, bc)

        from .compensated import fold_norm2
        p_l2 = jnp.sqrt(fold_norm2(r_p[1:-1, 1:-1]))
        p_max_new = jnp.maximum(p_max_l2, p_l2)
        p_rel = jnp.where(p_max_new > 0, p_l2 / p_max_new,
                          jnp.ones_like(p_l2))

        u_out[:] = u_new
        v_out[:] = v_new
        p_out[:] = p_new
        ru_out[:] = r_u
        rv_out[:] = r_v
        rp_out[:] = r_p
        pmax_out[:] = jnp.reshape(p_max_new, (1, 1))
        unorm_out[:] = jnp.reshape(u_norm, (1, 1))
        vnorm_out[:] = jnp.reshape(v_norm, (1, 1))
        prel_out[:] = jnp.reshape(p_rel, (1, 1))
        cyc_out[:] = jnp.reshape(cycles, (1, 1))

    return kernel


def fused_simple_step(u, v, p, p_max_l2, *, dx, dy, rho, mu, bc,
                      simple_cfg, mom_cfg, pres_cfg, interpret: bool = False):
    """One SIMPLE outer iteration as one kernel launch (in-kernel RAP,
    always-fresh coarse operators).

    Returns ``(u', v', p', p_max', u_norm, v_norm, p_rel, cycles,
    r_u, r_v, r_p)`` matching ``make_simple_step``'s step contract.
    """
    nx, ny = p.shape
    shapes = step_shapes(nx, ny, pres_cfg)
    L = len(shapes)
    meta = tuple((shp, lvl == 0) for lvl, shp in enumerate(shapes))

    inputs = [u, v, p, jnp.reshape(p_max_l2, (1, 1))]
    for (nf_, _), (nc_, _) in zip(shapes, shapes[1:]):
        inputs += [jnp.asarray(m) for m in _transfer_matrices(nf_, nc_)]

    f32 = p.dtype
    out_shapes = [
        jax.ShapeDtypeStruct(u.shape, f32),      # u'
        jax.ShapeDtypeStruct(v.shape, f32),      # v'
        jax.ShapeDtypeStruct(p.shape, f32),      # p'
        jax.ShapeDtypeStruct((1, 1), f32),       # p_max'
        jax.ShapeDtypeStruct(u.shape, f32),      # r_u
        jax.ShapeDtypeStruct(v.shape, f32),      # r_v
        jax.ShapeDtypeStruct(p.shape, f32),      # r_p
        jax.ShapeDtypeStruct((1, 1), f32),       # u_norm
        jax.ShapeDtypeStruct((1, 1), f32),       # v_norm
        jax.ShapeDtypeStruct((1, 1), f32),       # p_rel
        jax.ShapeDtypeStruct((1, 1), jnp.int32),  # inner cycles
    ]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = _mk_step_kernel(meta, L, dx=dx, dy=dy, rho=rho, mu=mu, bc=bc,
                             simple_cfg=simple_cfg, mom_cfg=mom_cfg,
                             pres_cfg=pres_cfg)
    (u2, v2, p2, pmax2, r_u, r_v, r_p, u_norm, v_norm, p_rel,
     cycles) = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[spec] * len(inputs),
        out_specs=[spec] * len(out_shapes),
        interpret=interpret,
    )(*inputs)
    return (u2, v2, p2, pmax2[0, 0], u_norm[0, 0], v_norm[0, 0],
            p_rel[0, 0], cycles[0, 0], r_u, r_v, r_p)
