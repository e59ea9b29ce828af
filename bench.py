"""Benchmark: SIMPLE + Galerkin-multigrid lid-driven cavity on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline configuration mirrors the reference's only published number
(BASELINE.md: GMG V-cycle SIMPLE, Re=100 cavity, 4.98 s wall to residual
~1e-3 on an Apple M3 Pro, 116 outer iterations — ``main_scripts/05
geo_multigrid/README.md``).  We run the same physics at the same grid and
tolerance and report wall-clock + MLUPS; ``vs_baseline`` is the speedup
(baseline_seconds / ours).

Env overrides: BENCH_NX (grid, default 63), BENCH_RE (default 100),
BENCH_TOL (outer tolerance, default 1e-3), BENCH_MAXIT.
"""

import json
import os
import sys
import time

REFERENCE_WALL_S = 4.98  # reference 05 geo_multigrid/README.md:22-26 (63^2 Re=100)


def main():
    from naviflow_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import naviflow_tpu as nf
    from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
    from naviflow_tpu.solvers import KrylovMomentumConfig
    from naviflow_tpu.solvers.multigrid import MultigridConfig
    from naviflow_tpu.postprocessing.validation import infinity_norm_error

    nx = int(os.environ.get("BENCH_NX", 63))
    re = float(os.environ.get("BENCH_RE", 100))
    tol = float(os.environ.get("BENCH_TOL", 1e-3))
    maxit = int(os.environ.get("BENCH_MAXIT", 4000))

    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=re)
    bc = nf.lid_driven_cavity(1.0)

    cfg = SIMPLEConfig(max_iterations=maxit, tolerance=tol)
    mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=40)
    pres = MultigridConfig(tolerance=1e-3, max_cycles=20, cycle_type="v")

    # warm-up run: compile (persistent-cached across processes)
    state = nf.initialize_state(mesh, bc)
    final, diag = simple_solve(mesh, fluid, bc, state, cfg, momentum=mom, pressure=pres)
    jax.block_until_ready(final.u)

    # timed run
    state = nf.initialize_state(mesh, bc)
    t0 = time.perf_counter()
    final, diag = simple_solve(mesh, fluid, bc, state, cfg, momentum=mom, pressure=pres)
    jax.block_until_ready(final.u)
    wall = time.perf_counter() - t0

    iters = int(diag.iterations)
    mlups = iters * nx * nx / wall / 1e6
    err = infinity_norm_error(final.u, final.v, mesh, re)

    print(
        json.dumps(
            {
                "metric": f"wall_clock_to_{tol:g}_residual_{nx}x{nx}_Re{int(re)}_GMG_SIMPLE",
                "value": round(wall, 4),
                "unit": "s",
                "vs_baseline": round(REFERENCE_WALL_S / wall, 2) if nx == 63 else None,
                "outer_iterations": iters,
                "converged": bool(diag.converged),
                "final_residual": float(diag.final_residual),
                "max_divergence": float(diag.max_divergence),
                "ghia_infinity_error": round(err, 5),
                "mlups_outer": round(mlups, 3),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    # keep stdout clean for the one JSON line
    import warnings

    warnings.filterwarnings("ignore")
    os.environ.setdefault("JAX_LOG_COMPILES", "0")
    main()
