"""Pin the large-grid step-body fixed work (round-5, verdict weak #1).

profile_phases.py at 2048^2 measured the REAL step body with
max_cycles=0 at 17.8 ms/iter vs 8.0 ms for the hand-composed equivalent
phases — ~9 ms of step-body work the phase account missed.  This probe
times the real step under targeted config swaps to attribute it:

  base        real step, max_cycles=0, pair BiCGSTAB budget B (the prod path)
  mom0        same, BiCGSTAB budget 0  (stacking + r0 only — no Krylov loop)
  seq         same, batch_pair='off'   (sequential per-field BiCGSTAB)
  jacobi8     same, 8-sweep Jacobi momentum (no reductions at all)
  cycles      base + the production 8-cycle pressure solve

Usage: python benchmarks/probe_step_parts.py [nx] [budget]
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
from naviflow_tpu.algorithms.simple import SIMPLEConfig, make_simple_step
from naviflow_tpu.algorithms.lagged import make_lagged_mg
from naviflow_tpu.solvers import JacobiMomentumConfig, KrylovMomentumConfig
from naviflow_tpu.solvers.multigrid import MultigridConfig


def timeit(name, fn, args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    walls = []
    for _ in range(2):
        seed = struct.unpack("<I", os.urandom(4))[0]
        eps = jax.random.uniform(jax.random.PRNGKey(seed), (), jnp.float32,
                                 0.0, 1e-12)
        a2 = [a + eps if hasattr(a, "dtype") and a.dtype == jnp.float32
              else jax.tree_util.tree_map(lambda x: x, a) for a in args]
        float(jnp.sum(a2[0]))
        t0 = time.perf_counter()
        out = fn(*a2)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        walls.append(time.perf_counter() - t0)
    ms = (min(walls) - 0.025) / reps * 1e3
    print(json.dumps({"case": name, "ms_per_iter": round(ms, 3)}))
    return ms


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=1000)
    bc = nf.lid_driven_cavity(1.0)
    dx, dy = mesh.get_cell_sizes()
    rho, mu = fluid.get_density(), fluid.get_viscosity()
    state = nf.initialize_state(mesh, bc)
    u, v, p = state.u, state.v, state.p
    reps = 20

    def run_case(name, mom_cfg, max_cycles):
        pres = MultigridConfig(
            tolerance=(1e-2 if max_cycles else 1e30), max_cycles=max_cycles,
            check_every=2 if max_cycles else 1,
            coarsest_sweeps=32 if max_cycles else 1, coarse_rebuild_every=8)
        step = make_simple_step(dx=dx, dy=dy, rho=rho, mu=mu, bc=bc,
                                cfg=SIMPLEConfig(), mom_cfg=mom_cfg,
                                pres_cfg=pres)
        _, _, extra0 = make_lagged_mg(pres, dx=dx, dy=dy, rho=rho,
                                      variant="consistent")
        ex = (jnp.asarray(0.0, jnp.float32), extra0(jnp.float32, nx, nx))

        def chain(u, v, p, ex):
            def it(i, carry):
                u, v, p, ex = carry
                u, v, p, ex, info = step(u, v, p, ex)
                return (u, v, p, ex)
            return jax.lax.fori_loop(0, reps, it, (u, v, p, ex))

        return timeit(name, jax.jit(chain), (u, v, p, ex), reps)

    from naviflow_tpu.solvers import ChebyshevMomentumConfig

    base = run_case("base_pair_b%d_nocycles" % budget,
                    KrylovMomentumConfig(tolerance=1e-6,
                                         max_iterations=budget), 0)
    mom0 = run_case("mom0_nocycles",
                    KrylovMomentumConfig(tolerance=1e-6, max_iterations=0), 0)
    seq = run_case("seq_b%d_nocycles" % budget,
                   KrylovMomentumConfig(tolerance=1e-6, max_iterations=budget,
                                        batch_pair="off"), 0)
    jac = run_case("jacobi8_nocycles", JacobiMomentumConfig(n_sweeps=8), 0)
    chs = run_case("cheby4_strip_nocycles",
                   ChebyshevMomentumConfig(degree=4), 0)
    chx = run_case("cheby4_xla_nocycles",
                   ChebyshevMomentumConfig(degree=4, backend="xla"), 0)
    full = run_case("base_pair_b%d_8cycles" % budget,
                    KrylovMomentumConfig(tolerance=1e-6,
                                         max_iterations=budget), 8)
    fullc = run_case("cheby4_strip_8cycles",
                     ChebyshevMomentumConfig(degree=4), 8)
    print(json.dumps({"case": "deltas", "nx": nx,
                      "krylov_loop": round(base - mom0, 3),
                      "stack_and_r0_etc": round(mom0 - 0, 3),
                      "seq_vs_pair": round(seq - base, 3),
                      "jacobi8_vs_pair": round(jac - base, 3),
                      "cheby4_strip_vs_pair": round(chs - base, 3),
                      "cheby4_strip_vs_xla": round(chs - chx, 3),
                      "cycles": round(full - base, 3),
                      "cheby_full": round(fullc, 3)}))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
