"""In-assembly Gershgorin fold: paired step timing (round-5 ROADMAP #6a).

The Chebyshev momentum bounds cost two five-array HBM reads + two global
max barriers per outer iteration when computed in XLA; folding the masked
ratio maxima into the strip-fused assembly kernel
(``ops/pallas_assembly.fused_assembly_pair(with_bounds=True)``) makes
them two scalar reads of already-resident VMEM data.  This probe times
the production step with ``assembly_bounds='auto'`` (fold) vs ``'off'``
(XLA recompute) under the MOMENTUM_BUDGET methodology: fixed-N-step
outer residual (equal trajectories = equal convergence) + marginal
ms/iter, appended to CYCLE_TIMING.jsonl with kind=gersh-fold.

Usage: python benchmarks/gersh_fold_probe.py [nx] [n_fixed]
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
    row = dict(row, kind="gersh-fold", date="2026-08-19",
               hw=str(jax.devices()[0]))
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_fixed = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=1000)
    bc = nf.lid_driven_cavity(1.0)

    # the production large-grid pressure config (bench.py _bench_large_grid)
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

    candidates = [
        ("fold_both", "auto", "auto"),   # production
        ("bounds_only", "auto", "off"),
        ("pc_only", "off", "auto"),
        ("xla_glue", "off", "off"),      # pre-fold baseline
    ]
    only = os.environ.get("GERSH_PROBE_ONLY")
    if only:
        names = only.split(",")
        candidates = [c for c in candidates if c[0] in names]

    for name, ab, fp in candidates:
        mom = ChebyshevMomentumConfig(degree=4, assembly_bounds=ab)
        solve = lambda s, c: simple_solve(mesh, fluid, bc, s, c,
                                          momentum=mom, pressure=pres,
                                          loop="fused")
        mk_cfg = lambda n: SIMPLEConfig(max_iterations=n, tolerance=0.0,
                                        fold_poisson=fp)
        _, diag = solve(fresh(), mk_cfg(n_fixed))
        res = float(diag.final_residual)

        def timed_block(n):
            c = mk_cfg(n)
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


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
