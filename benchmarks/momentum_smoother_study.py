"""Reduction-light momentum inner solve study (round-5 verdict next #1).

Round-4's phase attribution said the momentum solve dominates the
large-grid step; probe_step_parts.py then measured (2048^2, TPU v5e):

  step w/o momentum-Krylov w/o cycles   4.2 ms/iter
  + batched-pair BiCGSTAB(5)           15.4        (the round-4 default!)
  + sequential BiCGSTAB(5)              7.4
  + 8-sweep Jacobi (no reductions)      4.9
  full production step, pair b5        16.0

i.e. the round-4 batched pair solver is a large REGRESSION at 2048^2
(its padded (2,M,N) layout + pair barriers cost more than the barrier
halving saves), and a fixed-sweep Jacobi momentum smoother — zero global
reductions, the TPU-native analog of the reference's own
``jacobi_solver.JacobiMomentumSolver`` — removes the momentum solve from
the step's critical path entirely.

This study certifies the accuracy side: fixed-N-step outer-residual
comparison (the MOMENTUM_BUDGET methodology: SIMPLE re-linearizes every
outer step, so equal residual trajectories = equal convergence) plus
marginal ms/iter for each candidate, appended to MOMENTUM_BUDGET.jsonl.

Usage: python benchmarks/momentum_smoother_study.py [nx] [n_fixed]
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
from naviflow_tpu.solvers import (ChebyshevMomentumConfig,
                                  JacobiMomentumConfig, KrylovMomentumConfig)
from naviflow_tpu.solvers.momentum import RBGSMomentumConfig
from naviflow_tpu.solvers.multigrid import MultigridConfig

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "MOMENTUM_BUDGET.jsonl")


def _emit(row):
    row = dict(row, date="2026-08-19", hw=str(jax.devices()[0]))
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_fixed = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=1000)
    bc = nf.lid_driven_cavity(1.0)
    pres = MultigridConfig(tolerance=1e-2, max_cycles=8, cycle_type="v",
                           check_every=2, coarsest_sweeps=32,
                           coarse_rebuild_every=8)

    candidates = [
        ("pair_b5", KrylovMomentumConfig(tolerance=1e-6, max_iterations=5)),
        ("seq_b5", KrylovMomentumConfig(tolerance=1e-6, max_iterations=5,
                                        batch_pair="off")),
        ("jacobi4", JacobiMomentumConfig(n_sweeps=4)),
        ("jacobi8", JacobiMomentumConfig(n_sweeps=8)),
        ("jacobi12", JacobiMomentumConfig(n_sweeps=12)),
        ("rbgs2", RBGSMomentumConfig(n_sweeps=2)),
        ("rbgs4", RBGSMomentumConfig(n_sweeps=4)),
        # backend='auto' routes through the strip-blocked VMEM kernel
        # (ops/pallas_cheby.py) on large TPU grids; 'xla' is the
        # whole-array composition it replaces
        ("cheby4", ChebyshevMomentumConfig(degree=4)),
        ("cheby6", ChebyshevMomentumConfig(degree=6)),
        ("cheby4_xla", ChebyshevMomentumConfig(degree=4, backend="xla")),
        ("cheby6_xla", ChebyshevMomentumConfig(degree=6, backend="xla")),
    ]
    only = os.environ.get("MOM_STUDY_ONLY")
    if only:
        names = only.split(",")
        candidates = [c for c in candidates if c[0] in names]

    def fresh():
        seed = struct.unpack("<I", os.urandom(4))[0]
        noise = jax.random.uniform(jax.random.PRNGKey(seed), mesh.p_shape,
                                   jnp.float32, 0.0, 1e-7)
        return nf.initialize_state(mesh, bc).replace(
            p=nf.initialize_state(mesh, bc).p + noise)

    for name, mom in candidates:
        # fixed-step residual trajectory (accuracy certification)
        cfg = SIMPLEConfig(max_iterations=n_fixed, tolerance=0.0)
        solve = lambda s: simple_solve(mesh, fluid, bc, s, cfg,
                                       momentum=mom, pressure=pres,
                                       loop="fused")
        _, diag = solve(fresh())
        res = float(diag.final_residual)

        # marginal ms/iter: two-point slope (cf. bench._bench_large_grid)
        def timed_block(n):
            c = SIMPLEConfig(max_iterations=n, tolerance=0.0)
            sl = lambda s: simple_solve(mesh, fluid, bc, s, c,
                                        momentum=mom, pressure=pres,
                                        loop="fused")
            sl(fresh())  # compile
            st = fresh()
            float(jnp.sum(st.p))
            t0 = time.perf_counter()
            _, dg = sl(st)
            float(dg.final_residual)
            return time.perf_counter() - t0

        n0 = 20 if nx >= 2048 else 30
        ms = (timed_block(4 * n0) - timed_block(n0)) / (3 * n0) * 1e3
        _emit({"nx": nx, "momentum": name, "n_fixed": n_fixed,
               "residual_after_fixed": res,
               "ms_per_iteration": round(ms, 3)})


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
