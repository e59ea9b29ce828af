"""Per-iteration SIMPLE step timing: XLA vs fused-Pallas V-cycles, and
f32 vs bf16 smoothing (real TPU; VERDICT r1 items 9/10).

Usage:
    python benchmarks/cycle_timing.py pallas   # 63/127/255 xla vs pallas
    python benchmarks/cycle_timing.py bf16     # 1024/2048 f32 vs bf16

Methodology: chained fused blocks of outer iterations (output feeds the
next call's input, forcing serial device execution), timed through a host
value fetch, fresh perturbed inputs per case (the tunnel memoizes
identical executions).  Appends JSON lines to CYCLE_TIMING.jsonl.
"""

import json
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from naviflow_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import naviflow_tpu as nf
from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
from naviflow_tpu.solvers import KrylovMomentumConfig
from naviflow_tpu.solvers.multigrid import MultigridConfig


def _emit(row):
    line = json.dumps(row)
    print(line, flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "CYCLE_TIMING.jsonl"), "a") as f:
        f.write(line + "\n")


def time_step_block(nx, pres, n_iters, re=100.0, mom=None):
    """MARGINAL ms/iter by a two-point slope: median-of-3 chained walls at
    n_iters and 4*n_iters, slope = (w4 - w1) / (3 * n_iters).

    Round-4 finding: each fused-solve *call* carries a fixed cost that is
    NOT per-iteration work (donated-carry/hierarchy setup + tunnel
    dispatch/fetch) — measured ~232 ms per call at 4096^2, which inflated
    a 6-iteration block to 119.9 "ms/iter" when the true marginal cost
    was 81 ms (n=24 block: 90.7).  Long production runs amortize that
    fixed cost to ~nothing, so the slope is the honest per-iteration
    number; naive wall/n overstates it at exactly the large sizes where
    few iterations fit the tunnel watchdog."""
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=re)
    bc = nf.lid_driven_cavity(1.0)
    if mom is None:
        mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=25)

    def timed_block(n):
        cfg = SIMPLEConfig(max_iterations=n, tolerance=0.0)
        solve = lambda s: simple_solve(mesh, fluid, bc, s, cfg,
                                       momentum=mom, pressure=pres,
                                       loop="fused")
        seed = struct.unpack("<I", os.urandom(4))[0]
        noise = jax.random.uniform(jax.random.PRNGKey(seed), mesh.p_shape,
                                   jnp.float32, 0.0, 1e-7)
        state = nf.initialize_state(mesh, bc)
        state = state.replace(p=state.p + noise)
        out, _ = solve(state)  # compile + warm
        walls = []
        for _ in range(3):
            float(jnp.sum(out.p))
            t0 = time.perf_counter()
            out, diag = solve(out)  # chained: input is previous output
            float(diag.final_residual)
            walls.append(time.perf_counter() - t0)
        return sorted(walls)[1]

    w1 = timed_block(n_iters)
    w4 = timed_block(4 * n_iters)
    return (w4 - w1) / (3 * n_iters) * 1e3


def run_pallas():
    for nx in (63, 127, 255, 511):
        n_iters = 100 if nx <= 127 else (50 if nx <= 255 else 25)
        for backend in ("xla", "pallas"):
            pres = MultigridConfig(tolerance=1e-2, max_cycles=6,
                                   cycle_type="v", check_every=2,
                                   coarsest_sweeps=32, coarse_rebuild_every=8,
                                   backend=backend)
            ms = time_step_block(nx, pres, n_iters)
            _emit(dict(kind="mg-backend", nx=nx, backend=backend,
                       ms_per_iteration=round(ms, 3)))


def run_bf16():
    for nx in (1024, 2048):
        n_iters = 30 if nx <= 1024 else 12
        for sd in ("float32", "bfloat16"):
            pres = MultigridConfig(tolerance=1e-2, max_cycles=8,
                                   cycle_type="v", check_every=2,
                                   coarsest_sweeps=32, coarse_rebuild_every=8,
                                   smoother_dtype=sd)
            ms = time_step_block(nx, pres, n_iters, re=1000.0)
            _emit(dict(kind="smoother-dtype", nx=nx, smoother_dtype=sd,
                       ms_per_iteration=round(ms, 3)))


def run_momlite():
    """ROADMAP 'momentum-lite': after a sequencing warm start the momentum
    system barely changes per iteration — compare the default
    BiCGSTAB(25, 1e-6) against a light (8, 1e-4) fine-level solve,
    end-to-end on a sequenced 1024^2 cavity."""
    from naviflow_tpu.algorithms import grid_sequence_solve
    from naviflow_tpu.postprocessing.validation import infinity_norm_error

    nx = 1024
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=1000)
    bc = nf.lid_driven_cavity(1.0)
    cfg = SIMPLEConfig(max_iterations=20000, tolerance=1e-5)
    pres = MultigridConfig(tolerance=1e-2, max_cycles=8, cycle_type="v",
                           check_every=2, coarsest_sweeps=32,
                           coarse_rebuild_every=8)
    heavy = KrylovMomentumConfig(tolerance=1e-6, max_iterations=25)
    lite = KrylovMomentumConfig(tolerance=1e-4, max_iterations=8)

    for name, per_level in (("heavy", None),
                            ("lite-fine", lambda n: lite if n >= nx else heavy)):
        seed = struct.unpack("<I", os.urandom(4))[0]
        t0 = time.perf_counter()
        final, diag, summ = grid_sequence_solve(
            mesh, fluid, bc, simple_solve, cfg, momentum=heavy,
            pressure=pres, loop="chunked:300", perturb_seed=seed,
            per_level_momentum=per_level)
        wall = time.perf_counter() - t0
        err = infinity_norm_error(final.u, final.v, mesh, 1000)
        _emit(dict(kind="momentum-lite", variant=name,
                   wall_seconds=round(wall, 1),
                   fine_iterations=summ[-1]["iterations"],
                   converged=all(s["converged"] for s in summ),
                   ghia_infinity_error=round(float(err), 5)))


def run_breakdown(nx=63):
    """Component differencing of one SIMPLE iteration at ``nx^2`` with the
    fused kernels active: vary one knob at a time against the bench
    config."""
    from naviflow_tpu.solvers import JacobiMomentumConfig

    base = dict(tolerance=1e-2, max_cycles=6, cycle_type="v", check_every=2,
                coarsest_sweeps=32, coarse_rebuild_every=8)
    mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=20)
    cases = [
        ("full", mom, MultigridConfig(**base)),
        ("mg-2cycles", mom, MultigridConfig(**{**base, "max_cycles": 2})),
        ("mg-0cycles", mom, MultigridConfig(**{**base, "max_cycles": 0})),
        ("mom-jacobi1", JacobiMomentumConfig(n_sweeps=1),
         MultigridConfig(**base)),
        ("rap-every-iter", mom,
         MultigridConfig(**{**base, "coarse_rebuild_every": 1})),
        ("coarsest-8", mom, MultigridConfig(**{**base, "coarsest_sweeps": 8})),
    ]
    for name, m, pres in cases:
        cfg = SIMPLEConfig(max_iterations=100, tolerance=0.0)
        mesh = nf.StructuredMesh(nx=nx, ny=nx)
        fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
        bc = nf.lid_driven_cavity(1.0)
        solve = lambda s: simple_solve(mesh, fluid, bc, s, cfg,
                                       momentum=m, pressure=pres,
                                       loop="fused")
        seed = struct.unpack("<I", os.urandom(4))[0]
        noise = jax.random.uniform(jax.random.PRNGKey(seed), mesh.p_shape,
                                   jnp.float32, 0.0, 1e-7)
        state = nf.initialize_state(mesh, bc)
        state = state.replace(p=state.p + noise)
        out, _ = solve(state)
        walls = []
        for _ in range(3):
            float(jnp.sum(out.p))
            t0 = time.perf_counter()
            out, diag = solve(out)
            float(diag.final_residual)
            walls.append(time.perf_counter() - t0)
        ms = sorted(walls)[1] / 100 * 1e3
        _emit(dict(kind="breakdown", nx=nx, case=name,
                   ms_per_iteration=round(ms, 3)))


def run_layout():
    """Full-SIMPLE-step cost at 2048^2/4096^2 with the fine level
    interleaved vs plane-resident (round-4 verdict #3: un-gate the large
    grids — plane is the fine-level path where the Mosaic window cap
    forces strips off)."""
    for nx, n_iters in ((2048, 12), (4096, 6)):
        for layout in ("interleaved", "plane"):
            pres = MultigridConfig(tolerance=1e-2, max_cycles=8,
                                   cycle_type="v", check_every=2,
                                   coarsest_sweeps=32, coarse_rebuild_every=8,
                                   fine_layout=layout)
            ms = time_step_block(nx, pres, n_iters, re=1000.0)
            _emit(dict(kind="fine-layout", nx=nx, fine_layout=layout,
                       ms_per_iteration=round(ms, 3)))


def run_pair(sizes=((1024, 30), (2048, 12), (4096, 6))):
    """Batched u+v BiCGSTAB (one Krylov loop, solvers/momentum.
    _bicgstab_pair_masked) vs the sequential per-field solves, in the
    full SIMPLE step — the momentum solve is reduction-barrier-bound at
    these sizes (profile_phases 2048^2: 6.8 of 18.1 ms/iter)."""
    for nx, n_iters in sizes:
        for bp in ("off", "auto"):
            mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=25,
                                       batch_pair=bp)
            pres = MultigridConfig(tolerance=1e-2, max_cycles=8,
                                   cycle_type="v", check_every=2,
                                   coarsest_sweeps=32, coarse_rebuild_every=8)
            ms = time_step_block(nx, pres, n_iters, re=1000.0, mom=mom)
            _emit(dict(kind="momentum-pair", nx=nx, batch_pair=bp,
                       ms_per_iteration=round(ms, 3)))


def run_algos(sizes=(63, 127, 255)):
    """Whole-step fused kernels for SIMPLEC/PISO/SIMPLER vs their XLA
    paths (round-4: the fused step is no longer SIMPLE-only) — paired
    auto-vs-XLA ms/iter at the latency-bound sizes."""
    from naviflow_tpu.algorithms import (PISOConfig, SIMPLECConfig,
                                         SIMPLERConfig, piso_solve,
                                         simplec_solve, simpler_solve)

    algos = (("simplec", SIMPLECConfig, simplec_solve),
             ("piso", PISOConfig, piso_solve),
             ("simpler", SIMPLERConfig, simpler_solve))
    mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=25)
    for nx in sizes:
        n_iters = 100 if nx <= 127 else 50
        for name, AlgoCfg, algo_solve in algos:
            for backend in ("xla", "auto"):
                pres = MultigridConfig(tolerance=1e-2, max_cycles=6,
                                       cycle_type="v", check_every=2,
                                       coarsest_sweeps=8,
                                       coarse_rebuild_every=8,
                                       backend=backend)
                mesh = nf.StructuredMesh(nx=nx, ny=nx)
                fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
                bc = nf.lid_driven_cavity(1.0)
                cfg = AlgoCfg(max_iterations=n_iters, tolerance=0.0)
                solve = lambda s: algo_solve(mesh, fluid, bc, s, cfg,
                                             momentum=mom, pressure=pres,
                                             loop="fused")
                seed = struct.unpack("<I", os.urandom(4))[0]
                noise = jax.random.uniform(jax.random.PRNGKey(seed),
                                           mesh.p_shape, jnp.float32,
                                           0.0, 1e-7)
                state = nf.initialize_state(mesh, bc)
                state = state.replace(p=state.p + noise)
                out, _ = solve(state)
                walls = []
                for _ in range(3):
                    float(jnp.sum(out.p))
                    t0 = time.perf_counter()
                    out, diag = solve(out)
                    float(diag.final_residual)
                    walls.append(time.perf_counter() - t0)
                ms = sorted(walls)[1] / n_iters * 1e3
                _emit(dict(kind="algo-step", nx=nx, algo=name,
                           backend=backend, ms_per_iteration=round(ms, 3),
                           final_residual=float(diag.final_residual)))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    which = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    if which == "pallas":
        run_pallas()
    elif which == "bf16":
        run_bf16()
    elif which == "momlite":
        run_momlite()
    elif which == "breakdown":
        run_breakdown()
    elif which == "layout":
        run_layout()
    elif which == "pair":
        run_pair()
    elif which.startswith("pair:"):
        run_pair(tuple((int(s), 30 if int(s) <= 1024 else
                        (12 if int(s) <= 2048 else 6))
                       for s in which.split(":")[1].split(",")))
    elif which == "algos":
        run_algos()
    elif which.startswith("algos:"):
        run_algos(tuple(int(s) for s in which.split(":")[1].split(",")))
    else:
        raise SystemExit(f"unknown mode: {which}")
