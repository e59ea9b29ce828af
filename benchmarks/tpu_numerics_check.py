"""On-hardware numerics validation for the fused Pallas kernels.

CPU interpret mode computes exact f32 and CANNOT catch TPU-specific
precision hazards (the MXU's default bf16 f32-matmul mode corrupted the
Galerkin coarse operators — 0.7% compounding to 86% down a 255^2
hierarchy — and NaN'd Re=1000 solves before mm() forced
precision=HIGHEST).  Run this on the real TPU after touching any fused
kernel:

    python benchmarks/tpu_numerics_check.py

Checks:
1. fused-RAP parity vs the XLA galerkin_coarsen build at 255^2 on
   realistic Re=1000 d-coefficients (tolerance 1e-4 per level);
2. a full 255^2 Re=1000 solve to 1e-5 with the default (fused) backends
   must converge with the XLA path's iteration count (+-5%).
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from naviflow_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import naviflow_tpu as nf
from naviflow_tpu.algorithms.simple import SIMPLEConfig, simple_solve
from naviflow_tpu.ops.pallas_mg import galerkin_levels_pallas
from naviflow_tpu.ops.poisson import pressure_rhs
from naviflow_tpu.postprocessing.validation import infinity_norm_error
from naviflow_tpu.solvers import KrylovMomentumConfig
from naviflow_tpu.solvers.momentum import solve_u_momentum, solve_v_momentum
from naviflow_tpu.solvers.multigrid import MultigridConfig, build_levels

XLA_ITERS_255_RE1000 = 2411  # BENCHMARKS.md reference count


def main():
    nx = 255
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    bc = nf.lid_driven_cavity(1.0)
    dx, dy = mesh.get_cell_sizes()
    mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=25,
                               backend="xla")
    st = nf.initialize_state(mesh, bc)
    u_s, d_u, _, _ = solve_u_momentum(st.u, st.v, st.p, dx=dx, dy=dy,
                                      rho=1.0, mu=1e-3, alpha=0.7, bc=bc,
                                      cfg=mom)
    v_s, d_v, _, _ = solve_v_momentum(st.u, st.v, st.p, dx=dx, dy=dy,
                                      rho=1.0, mu=1e-3, alpha=0.7, bc=bc,
                                      cfg=mom)
    cfg = MultigridConfig(tolerance=1e-2, max_cycles=6, check_every=2,
                          coarsest_sweeps=8, backend="xla")
    levels = build_levels(d_u, d_v, cfg, dx=dx, dy=dy, rho=1.0,
                          variant="consistent")

    sts = jax.jit(lambda fs: galerkin_levels_pallas(
        fs, [lv[1] for lv in levels], True))(levels[0][0])
    for (st_ref, shp, _, _), st_f in zip(levels[1:], sts):
        worst = 0.0
        for name in ("c", "e", "w", "n", "s", "ne", "nw", "se", "sw"):
            a = getattr(st_ref, name)
            b = getattr(st_f, name)
            d = float(jnp.max(jnp.abs(a - b)))
            s = float(jnp.max(jnp.abs(a))) + 1e-30
            worst = max(worst, d / s)
        print(f"RAP parity {shp}: worst rel {worst:.3e}")
        assert worst < 1e-4, f"RAP corrupted at {shp}: {worst}"

    fluid = nf.FluidProperties(density=1.0, reynolds_number=1000)
    final, diag = simple_solve(
        mesh, fluid, bc, st,
        SIMPLEConfig(max_iterations=5000, tolerance=1e-5),
        momentum=KrylovMomentumConfig(tolerance=1e-6, max_iterations=25),
        pressure=MultigridConfig(tolerance=1e-2, max_cycles=6, check_every=2,
                                 coarsest_sweeps=8),
        loop="chunked:2000")
    iters = int(diag.iterations)
    err = infinity_norm_error(final.u, final.v, mesh, 1000)
    print(f"255^2 Re=1000 fused-default: converged={bool(diag.converged)} "
          f"iters={iters} ghia={err:.4f}")
    assert bool(diag.converged), float(diag.final_residual)
    assert abs(iters - XLA_ITERS_255_RE1000) <= 0.05 * XLA_ITERS_255_RE1000
    print("TPU NUMERICS OK")


if __name__ == "__main__":
    main()
