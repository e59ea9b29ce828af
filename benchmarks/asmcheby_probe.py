"""Merged in-kernel-assembling Chebyshev momentum solve: paired
production-step certification (round-5 ROADMAP #6, the "drop the 16-array
coefficient round-trip" item).

Two cases in the SAME window, both the real SIMPLE step with the
production large-grid config:

  merged   ChebyshevMomentumConfig(merged_assembly='auto')  — ONE kernel
           assembles + solves both fields (ops/pallas_asmcheby.py);
           Chebyshev interval from the lagged Gershgorin maxima
  split    merged_assembly='off' — the separate assembly kernel + (at
           >= 2048^2) per-field solve kernels, current-iteration bounds

Equal physics check: the fixed-N-step outer residual (the lag shifts the
inner-solve contraction rate only; equal trajectories to ~1e-3 relative
mean the lag costs no outer iterations).  Timing: marginal ms/iter by the
two-point slope.  Rows -> CYCLE_TIMING.jsonl, kind=asmcheby.

Usage: python benchmarks/asmcheby_probe.py [nx] [n_fixed]
"""

import json
import os
import struct
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from naviflow_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import naviflow_tpu as nf
from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
from naviflow_tpu.solvers import ChebyshevMomentumConfig
from naviflow_tpu.solvers.multigrid import MultigridConfig

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "CYCLE_TIMING.jsonl")


def _emit(row):
    row = dict(row, kind="asmcheby", date=time.strftime("%Y-%m-%d"),
               hw=str(jax.devices()[0]))
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_fixed = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    only = os.environ.get("ASMCHEBY_ONLY")
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=1000)
    bc = nf.lid_driven_cavity(1.0)
    if nx < 2048:
        pres = MultigridConfig(tolerance=1e-2, max_cycles=8, cycle_type="v",
                               check_every=1, pre_smoothing=1,
                               post_smoothing=1, coarsest_sweeps=32,
                               coarse_rebuild_every=8)
    else:
        pres = MultigridConfig(tolerance=1e-2, max_cycles=8, cycle_type="v",
                               check_every=2, coarsest_sweeps=32,
                               coarse_rebuild_every=8)

    def fresh():
        seed = struct.unpack("<I", os.urandom(4))[0]
        noise = jax.random.uniform(jax.random.PRNGKey(seed), mesh.p_shape,
                                   jnp.float32, 0.0, 1e-7)
        return nf.initialize_state(mesh, bc).replace(
            p=nf.initialize_state(mesh, bc).p + noise)

    for name, merged in (("merged", "auto"), ("split", "off")):
        if only and name not in only.split(","):
            continue
        mom = ChebyshevMomentumConfig(degree=4, merged_assembly=merged)
        if os.environ.get("ASMCHEBY_CONVERGE"):
            # iteration-count parity to tolerance (the lag must cost no
            # outer iterations); chunked to dodge the execution kill
            cfgc = SIMPLEConfig(max_iterations=12000, tolerance=1e-5)
            t0 = time.perf_counter()
            _, diag = simple_solve(mesh, fluid, bc, fresh(), cfgc,
                                   momentum=mom, pressure=pres,
                                   loop="chunked:400")
            _emit({"nx": nx, "case": f"{name}-converge",
                   "iterations": int(diag.iterations),
                   "converged": bool(diag.converged),
                   "final_residual": float(diag.final_residual),
                   "wall_s": round(time.perf_counter() - t0, 1)})
            continue
        solve = lambda s, c: simple_solve(mesh, fluid, bc, s, c,
                                          momentum=mom, pressure=pres,
                                          loop="fused")
        try:
            _, diag = solve(fresh(), SIMPLEConfig(max_iterations=n_fixed,
                                                  tolerance=0.0))
            res = float(diag.final_residual)

            def timed_block(n):
                c = SIMPLEConfig(max_iterations=n, tolerance=0.0)
                solve(fresh(), c)  # compile
                st = fresh()
                float(jnp.sum(st.p))
                t0 = time.perf_counter()
                _, dg = solve(st, c)
                float(dg.final_residual)
                return time.perf_counter() - t0

            n0 = 20 if nx >= 2048 else 30
            ms = (timed_block(4 * n0) - timed_block(n0)) / (3 * n0) * 1e3
            _emit({"nx": nx, "case": name, "n_fixed": n_fixed,
                   "residual_after_fixed": res,
                   "ms_per_iteration": round(ms, 3)})
        except Exception as e:
            _emit({"nx": nx, "case": name,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"})


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
