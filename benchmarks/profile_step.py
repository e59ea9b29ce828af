"""Surgical decomposition of the large-grid SIMPLE step cost.

profile_1024.py showed the per-op microbenches are tunnel-noisy; this
script times whole jitted sub-programs (chained reps) and attributes the
full-step cost by subtraction:

  step(full)  vs  step(momentum only, max_cycles~0)  vs  mg solve alone
  vs RAP rebuild alone.

Usage: python benchmarks/profile_step.py [nx]
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
from naviflow_tpu.algorithms.simple import make_simple_step
from naviflow_tpu.ops.poisson import pressure_rhs
from naviflow_tpu.solvers import KrylovMomentumConfig
from naviflow_tpu.solvers.momentum import solve_u_momentum, solve_v_momentum
from naviflow_tpu.solvers.multigrid import (
    MultigridConfig,
    build_levels,
    coarse_stencils,
    multigrid_solve,
)


def bench_steps(mesh, fluid, bc, state, mom, pres, n=30, tag="step"):
    cfg = SIMPLEConfig(max_iterations=n, tolerance=0.0)
    fn = lambda s: simple_solve(mesh, fluid, bc, s, cfg, momentum=mom,
                                pressure=pres, loop="fused")
    fn(state)
    walls = []
    for _ in range(2):
        seed = struct.unpack("<I", os.urandom(4))[0]
        s2 = state.replace(p=state.p + jax.random.uniform(
            jax.random.PRNGKey(seed), state.p.shape, jnp.float32, 0.0, 1e-9))
        float(jnp.sum(s2.p))
        t0 = time.perf_counter()
        _, dg = fn(s2)
        float(dg.final_residual)
        walls.append(time.perf_counter() - t0)
    ms = (min(walls) - 0.025) / n * 1e3
    print(json.dumps({"component": tag, "ms_per_iter": round(ms, 3)}))
    return ms


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=1000)
    bc = nf.lid_driven_cavity(1.0)
    dx, dy = mesh.get_cell_sizes()
    rho, mu = fluid.get_density(), fluid.get_viscosity()

    mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=25)
    pres = MultigridConfig(tolerance=1e-2, max_cycles=8, cycle_type="v",
                           check_every=2, coarsest_sweeps=32,
                           coarse_rebuild_every=8)

    # warmed state
    state0 = nf.initialize_state(mesh, bc)
    seed = struct.unpack("<I", os.urandom(4))[0]
    state0 = state0.replace(p=state0.p + jax.random.uniform(
        jax.random.PRNGKey(seed), mesh.p_shape, jnp.float32, 0.0, 1e-7))
    state, _ = simple_solve(mesh, fluid, bc, state0,
                            SIMPLEConfig(max_iterations=30, tolerance=0.0),
                            momentum=mom, pressure=pres, loop="fused")

    # ---- full step (baseline) -------------------------------------------
    t_full = bench_steps(mesh, fluid, bc, state, mom, pres, tag="full_step")

    # ---- pressure-free step: MG budget cut to a single cheap cycle -------
    pres_min = MultigridConfig(tolerance=1e30, max_cycles=0, cycle_type="v",
                               check_every=1, coarsest_sweeps=1,
                               coarse_rebuild_every=8)
    t_nopres = bench_steps(mesh, fluid, bc, state, mom, pres_min,
                           tag="step_no_pressure_cycles")

    # ---- momentum-free-ish step: 1-sweep Jacobi momentum -----------------
    from naviflow_tpu.solvers.momentum import JacobiMomentumConfig

    t_jacmom = bench_steps(mesh, fluid, bc, state,
                           JacobiMomentumConfig(n_sweeps=1), pres,
                           tag="step_jacobi1_momentum")

    # ---- mg solve alone (real d_u, d_v, b) -------------------------------
    u_s, d_u, _, _ = solve_u_momentum(state.u, state.v, state.p, dx=dx, dy=dy,
                                      rho=rho, mu=mu, alpha=0.7, bc=bc, cfg=mom)
    v_s, d_v, _, _ = solve_v_momentum(state.u, state.v, state.p, dx=dx, dy=dy,
                                      rho=rho, mu=mu, alpha=0.7, bc=bc, cfg=mom)
    b = pressure_rhs(u_s, v_s, dx=dx, dy=dy, rho=rho, pin=False)
    levels = build_levels(d_u, d_v, pres, dx=dx, dy=dy, rho=rho,
                          variant="consistent")

    reps = 10
    mg = jax.jit(lambda b, p: jax.lax.fori_loop(
        0, reps,
        lambda i, c: (multigrid_solve(c[0] * 0.993 + b * 1e-6, d_u, d_v,
                                      jnp.zeros_like(p), pres, dx=dx, dy=dy,
                                      rho=rho, levels=levels)[0], c[1]),
        (b, p))[0])
    mg(b, state.p)
    walls = []
    for _ in range(2):
        seed = struct.unpack("<I", os.urandom(4))[0]
        bb = b + jax.random.uniform(jax.random.PRNGKey(seed), (), jnp.float32,
                                    0.0, 1e-12)
        float(jnp.sum(bb))
        t0 = time.perf_counter()
        out = mg(bb, state.p)
        float(jnp.sum(out))
        walls.append(time.perf_counter() - t0)
    print(json.dumps({"component": "mg_solve_wall",
                      "ms_per_solve": round((min(walls) - 0.025) / reps * 1e3,
                                            3)}))

    # ---- RAP rebuild alone (chained via a scalar data dependency) --------
    reps = 5

    def rap_once(du, dv, eps):
        sts = coarse_stencils(build_levels(du + eps, dv, pres, dx=dx, dy=dy,
                                           rho=rho, variant="consistent"))
        return sts[0].c[0, 0]

    rap5 = jax.jit(lambda du, dv: jax.lax.fori_loop(
        0, reps, lambda i, s: rap_once(du, dv, s * 1e-25), jnp.float32(0)))
    rap5(d_u, d_v)
    walls = []
    for _ in range(2):
        seed = struct.unpack("<I", os.urandom(4))[0]
        dd = d_u + jax.random.uniform(jax.random.PRNGKey(seed), (),
                                      jnp.float32, 0.0, 1e-15)
        float(jnp.sum(dd))
        t0 = time.perf_counter()
        float(rap5(dd, d_v))
        walls.append(time.perf_counter() - t0)
    print(json.dumps({"component": "rap_rebuild_wall",
                      "ms_per_build": round((min(walls) - 0.025) / reps * 1e3,
                                            3)}))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
