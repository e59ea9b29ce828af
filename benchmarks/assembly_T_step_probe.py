"""In-step effect of the folded-assembly strip height (round-5 cap raise).

`assembly_cap_probe.py` measured the STANDALONE kernel (plain, 18
outputs) across caps; the production step runs the FOLDED kernel
(bounds + poisson operator, 25 outputs), whose liveness class is its own
(`pallas_assembly._CAP_CELLS_FOLDED`; the 2048^2 T=128 folded compile
measured 66.12 MiB vs the 64 MiB scoped limit).  This probe times the
REAL production step (gersh_fold_probe configuration) at each folded-cap
candidate in the SAME window, so the in-step win of the raise is a
paired measurement, and records Mosaic exclusions.

Rows -> CYCLE_TIMING.jsonl, kind=assembly-T-step.

Usage: python benchmarks/assembly_T_step_probe.py [nx] [n_fixed]
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
import naviflow_tpu.ops.pallas_assembly as pa
from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
from naviflow_tpu.solvers import ChebyshevMomentumConfig
from naviflow_tpu.solvers.multigrid import MultigridConfig

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "CYCLE_TIMING.jsonl")


def _emit(row):
    row = dict(row, kind="assembly-T-step", date="2026-08-19",
               hw=str(jax.devices()[0]))
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_fixed = int(sys.argv[2]) if len(sys.argv) > 2 else 40
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
    mom = ChebyshevMomentumConfig(degree=4)

    def fresh():
        seed = struct.unpack("<I", os.urandom(4))[0]
        noise = jax.random.uniform(jax.random.PRNGKey(seed), mesh.p_shape,
                                   jnp.float32, 0.0, 1e-7)
        return nf.initialize_state(mesh, bc).replace(
            p=nf.initialize_state(mesh, bc).p + noise)

    solve = lambda s, c: simple_solve(mesh, fluid, bc, s, c, momentum=mom,
                                      pressure=pres, loop="fused")

    for cap in (96 * 1024, 280 * 1024):
        old = pa._CAP_CELLS_FOLDED
        pa._CAP_CELLS_FOLDED = cap
        try:
            T = pa._strip_rows_assembly(nx, nx, folded=True)
            row = dict(nx=nx, cap_cells_folded=cap, T_folded=T,
                       n_fixed=n_fixed)
            if T == 0:
                row["excluded"] = "no T fits"
                _emit(row)
                continue
            _, diag = solve(fresh(), SIMPLEConfig(max_iterations=n_fixed,
                                                  tolerance=0.0))
            row["residual_after_fixed"] = float(diag.final_residual)

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
            row["ms_per_iteration"] = round(ms, 3)
            _emit(row)
        except Exception as e:
            _emit(dict(nx=nx, cap_cells_folded=cap,
                       error=f"{type(e).__name__}: {str(e)[:200]}"))
        finally:
            pa._CAP_CELLS_FOLDED = old


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
