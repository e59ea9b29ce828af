"""Pressure-cycle budget sweep at large grids (round-5 GLUPS chase).

After the Chebyshev-momentum landing, the 1024^2 step is 1.43 ms/iter
with the pressure V-cycles its largest phase (probe_step_parts: cycles
0.68, body 0.49, momentum 0.07).  This probe sweeps the cycle-budget
knobs — check_every (pairs vs singles), coarsest_sweeps, pre/post
smoothing — with the MOMENTUM_BUDGET methodology: fixed-N-step outer
residual (equal trajectories = equal convergence) + marginal ms/iter,
appended to CYCLE_TIMING.jsonl with kind=cycle-budget.

Usage: python benchmarks/cycle_budget_probe.py [nx] [n_fixed]
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
    row = dict(row, kind="cycle-budget", date=time.strftime("%Y-%m-%d"),
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
    mom = ChebyshevMomentumConfig(degree=4)

    base = dict(tolerance=1e-2, max_cycles=8, cycle_type="v",
                check_every=2, coarsest_sweeps=32, coarse_rebuild_every=8)
    candidates = [
        ("base_ce2_cs32", {}),
        ("ce1", dict(check_every=1)),
        ("cs16", dict(coarsest_sweeps=16)),
        ("ce1_cs16", dict(check_every=1, coarsest_sweeps=16)),
        ("pre1post1", dict(pre_smoothing=1, post_smoothing=1)),
        ("ce1_pre1post1", dict(check_every=1, pre_smoothing=1,
                               post_smoothing=1)),
        ("rebuild16", dict(coarse_rebuild_every=16)),
        # fixed-cycle fast path (tolerance<=0 -> fori_loop, no per-check
        # residual apply+norm; round-5, post-merged-kernel): the adaptive
        # ce1 config averages ~1-2 cycles/step, so fixed 1/2 cycles with
        # zero check overhead may beat it if the outer trajectory holds
        ("fixed1_pre1post1", dict(tolerance=0.0, max_cycles=1,
                                  pre_smoothing=1, post_smoothing=1)),
        ("fixed2_pre1post1", dict(tolerance=0.0, max_cycles=2,
                                  pre_smoothing=1, post_smoothing=1)),
        ("fixed2", dict(tolerance=0.0, max_cycles=2)),
        ("fixed1", dict(tolerance=0.0, max_cycles=1)),
    ]
    only = os.environ.get("CYCLE_PROBE_ONLY")
    if only:
        names = only.split(",")
        candidates = [c for c in candidates if c[0] in names]

    def fresh():
        seed = struct.unpack("<I", os.urandom(4))[0]
        noise = jax.random.uniform(jax.random.PRNGKey(seed), mesh.p_shape,
                                   jnp.float32, 0.0, 1e-7)
        return nf.initialize_state(mesh, bc).replace(
            p=nf.initialize_state(mesh, bc).p + noise)

    for name, over in candidates:
        pres = MultigridConfig(**{**base, **over})
        cfg = SIMPLEConfig(max_iterations=n_fixed, tolerance=0.0)
        solve = lambda s, c: simple_solve(mesh, fluid, bc, s, c,
                                          momentum=mom, pressure=pres,
                                          loop="fused")
        _, diag = solve(fresh(), cfg)
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
        _emit({"nx": nx, "pressure": name, "n_fixed": n_fixed,
               "residual_after_fixed": res,
               "ms_per_iteration": round(ms, 3)})


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
