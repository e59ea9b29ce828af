"""Benchmark: SIMPLE + Galerkin-multigrid lid-driven cavity on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Three measurements in the one line:

* headline — the reference's only published number (BASELINE.md: GMG
  V-cycle SIMPLE, Re=100 cavity 63^2, 4.98 s wall to residual ~1e-3 on an
  Apple M3 Pro, ``main_scripts/05 geo_multigrid/README.md``): same physics,
  same grid, same tolerance; ``vs_baseline`` = baseline_seconds / ours.
  Note this tolerance regime does NOT pass the reference's own 10% Ghia
  validation gate (``simulation_result.py:262-264``) — neither does the
  reference's run; it is a speed-parity row, hence the companion row below.
* ``validated`` — the same case converged to 1e-5, with the Ghia
  infinity-norm error and the explicit ``ghia_passed`` 10%-gate verdict.
* ``large_grid`` — measured (not inferred) per-iteration throughput of the
  full SIMPLE step at BENCH_BIG_NX^2 (default 1024^2) in MLUPS and GLUPS
  (BASELINE.json metric; north star >= 1 GLUPS per v5e chip).

Env overrides: BENCH_NX (grid, default 63), BENCH_RE (default 100),
BENCH_TOL (headline tolerance, default 1e-3), BENCH_MAXIT, BENCH_BIG_NX
(default 1024; 0 disables the large-grid row), and BENCH_MODE=seq for the
grid-sequenced large-grid convergence benchmark (wall clock to 1e-5 on a
BENCH_NX=1024 cavity — the BASELINE.json headline metric).
"""

import json
import os
import struct
import sys
import time

REFERENCE_WALL_S = 4.98  # reference 05 geo_multigrid/README.md:22-26 (63^2 Re=100)
GHIA_GATE = 0.1  # reference simulation_result.py:262-264


def _fresh_state(mesh, bc, scale=1e-7):
    """Tunneled TPU runtimes memoize identical executions (program + input
    values), so every run — warm-up and timed — gets a unique, physically
    negligible perturbation of the initial pressure field."""
    import jax
    import jax.numpy as jnp
    import naviflow_tpu as nf

    seed = struct.unpack("<I", os.urandom(4))[0]
    noise = jax.random.uniform(jax.random.PRNGKey(seed), mesh.p_shape,
                               jnp.float32, 0.0, scale)
    s = nf.initialize_state(mesh, bc)
    return s.replace(p=s.p + noise)


def _timed_solve(solve_fn, mesh, bc, n_runs=3):
    """Median wall of ``n_runs``; clock closes over a host VALUE fetch of a
    scalar output — unlike block_until_ready, a data fetch cannot complete
    before the computation has run (tunneled runtimes have been observed to
    return early from block_until_ready).  ~25 ms fetch overhead included."""
    import jax.numpy as jnp

    walls, out = [], None
    for _ in range(n_runs):
        state = _fresh_state(mesh, bc)
        float(jnp.sum(state.p))  # materialize inputs before the clock starts
        t0 = time.perf_counter()
        out = solve_fn(state)
        float(out[1].final_residual)
        walls.append(time.perf_counter() - t0)
    return sorted(walls)[len(walls) // 2], out


def main():
    from naviflow_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import naviflow_tpu as nf
    from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
    from naviflow_tpu.solvers import KrylovMomentumConfig
    from naviflow_tpu.solvers.multigrid import MultigridConfig
    from naviflow_tpu.postprocessing.validation import infinity_norm_error

    if os.environ.get("BENCH_MODE") == "seq":
        return _bench_sequenced()

    nx = int(os.environ.get("BENCH_NX", 63))
    re = float(os.environ.get("BENCH_RE", 100))
    tol = float(os.environ.get("BENCH_TOL", 1e-3))
    maxit = int(os.environ.get("BENCH_MAXIT", 4000))
    big_nx = int(os.environ.get("BENCH_BIG_NX", 1024))

    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=re)
    bc = nf.lid_driven_cavity(1.0)

    mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=20)
    pres = MultigridConfig(tolerance=1e-2, max_cycles=6, cycle_type="v",
                           check_every=2, coarsest_sweeps=8,
                           coarse_rebuild_every=8,
                           backend=os.environ.get("BENCH_MG_BACKEND", "auto"),
                           smoother_dtype=os.environ.get(
                               "BENCH_SMOOTHER_DTYPE", "float32"))

    # ---- headline: reference-parity tolerance (1e-3) ----------------------
    cfg = SIMPLEConfig(max_iterations=maxit, tolerance=tol)
    solve = lambda s: simple_solve(mesh, fluid, bc, s, cfg,
                                   momentum=mom, pressure=pres)
    solve(_fresh_state(mesh, bc))  # warm-up / compile
    wall, (final, diag) = _timed_solve(solve, mesh, bc)
    iters = int(diag.iterations)
    err = infinity_norm_error(final.u, final.v, mesh, re)

    row = {
        "metric": f"wall_clock_to_{tol:g}_residual_{nx}x{nx}_Re{int(re)}_GMG_SIMPLE",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(REFERENCE_WALL_S / wall, 2) if nx == 63 else None,
        "outer_iterations": iters,
        "converged": bool(diag.converged),
        "final_residual": float(diag.final_residual),
        "max_divergence": float(diag.max_divergence),
        "ghia_infinity_error": round(err, 5),
        "ghia_passed": bool(err < GHIA_GATE),
        # expected False at this row's 1e-3 parity tolerance (the reference's
        # own 63^2 run does not pass its 10% gate at 1e-3 either); the
        # gate-quality verdict of record is validated.ghia_passed below
        "ghia_note": "speed-parity row at reference tolerance 1e-3; "
                     "see 'validated' for the 1e-5 gate verdict",
        "mlups_outer": round(iters * nx * nx / wall / 1e6, 3),
        "device": str(jax.devices()[0]),
    }

    # ---- validated companion: converge to 1e-5, check the 10% Ghia gate ---
    cfg_v = SIMPLEConfig(max_iterations=maxit, tolerance=1e-5)
    solve_v = lambda s: simple_solve(mesh, fluid, bc, s, cfg_v,
                                     momentum=mom, pressure=pres)
    solve_v(_fresh_state(mesh, bc))
    wall_v, (final_v, diag_v) = _timed_solve(solve_v, mesh, bc, n_runs=1)
    err_v = infinity_norm_error(final_v.u, final_v.v, mesh, re)
    row["validated"] = {
        "tolerance": 1e-5,
        "wall_seconds": round(wall_v, 4),
        "outer_iterations": int(diag_v.iterations),
        "converged": bool(diag_v.converged),
        "ghia_infinity_error": round(err_v, 5),
        "ghia_passed": bool(err_v < GHIA_GATE),
    }

    # ---- large-grid throughput: measured ms/iter at big_nx^2 --------------
    if big_nx:
        row["large_grid"] = _bench_large_grid(big_nx, re)
    # scaling rows one and two sizes up (skippable with BENCH_BIG2_NX=0 /
    # BENCH_BIG3_NX=0); the 4096^2 capability goes in the artifact of
    # record (round-4 verdict #5) — a short two-point slope fits the budget
    big2 = int(os.environ.get("BENCH_BIG2_NX", 2048))
    if big2:
        row["large_grid_2"] = _bench_large_grid(big2, re, n_iters=20)
    big3 = int(os.environ.get("BENCH_BIG3_NX", 4096))
    if big3:
        row["large_grid_3"] = _bench_large_grid(big3, re, n_iters=6)

    # ---- hardware-numerics regression (runs on whatever jax.devices()[0]
    # is — on the real TPU this certifies the fused kernels' MXU numerics,
    # the class of corruption CPU interpret tests structurally cannot catch;
    # see benchmarks/tpu_numerics_check.py for the full harness) ----------
    row["numerics"] = _numerics_check()
    row["numerics_ok"] = bool(row["numerics"].get("ok"))

    # ---- distributed-path certification on the real silicon (round-3
    # verdict #6): the shard_map step (windowed assembly, masked sweeps,
    # psum/ppermute collectives) has CPU-mesh tests but must also LOWER and
    # compute correctly on the actual TPU — run it on a 1x1 mesh of this
    # device and compare a short trajectory against the single-device step.
    row["distributed"] = _distributed_check()
    row["distributed_ok"] = bool(row["distributed"].get("ok"))

    print(json.dumps(row))


def _numerics_check():
    """A <=10 s subset of benchmarks/tpu_numerics_check.py: fused-RAP parity
    against the XLA Galerkin build at 127^2, plus iteration-count parity of
    a 63^2 Re=100 solve to 1e-5 between the default (fused-on-TPU) and
    forced-XLA backends.  Emitted in the bench JSON so every round's BENCH
    artifact certifies the fused kernels on the silicon it ran on (round-2
    verdict weak #5; the commit-7b886eb bf16-MXU episode is the motivating
    failure)."""
    import jax
    import jax.numpy as jnp
    import naviflow_tpu as nf
    from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
    from naviflow_tpu.solvers import KrylovMomentumConfig
    from naviflow_tpu.solvers.momentum import solve_u_momentum, solve_v_momentum
    from naviflow_tpu.solvers.multigrid import MultigridConfig, build_levels

    out = {"ok": False}
    try:
        # 1. fused-RAP parity at 127^2 on realistic d-coefficients
        nx = 127
        mesh = nf.StructuredMesh(nx=nx, ny=nx)
        bc = nf.lid_driven_cavity(1.0)
        dx, dy = mesh.get_cell_sizes()
        mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=25,
                                   backend="xla")
        st = nf.initialize_state(mesh, bc)
        _, d_u, _, _ = solve_u_momentum(st.u, st.v, st.p, dx=dx, dy=dy,
                                        rho=1.0, mu=1e-3, alpha=0.7, bc=bc,
                                        cfg=mom)
        _, d_v, _, _ = solve_v_momentum(st.u, st.v, st.p, dx=dx, dy=dy,
                                        rho=1.0, mu=1e-3, alpha=0.7, bc=bc,
                                        cfg=mom)
        cfg_mg = MultigridConfig(tolerance=1e-2, max_cycles=6, check_every=2,
                                 coarsest_sweeps=8, backend="xla")
        levels = build_levels(d_u, d_v, cfg_mg, dx=dx, dy=dy, rho=1.0,
                              variant="consistent")
        from naviflow_tpu.ops.pallas_mg import (galerkin_levels_pallas,
                                                supports_fused_rap)
        worst = 0.0
        if supports_fused_rap(nx, nx, cfg_mg, jnp.float32):
            sts = jax.jit(lambda fs: galerkin_levels_pallas(
                fs, [lv[1] for lv in levels], True))(levels[0][0])
            for (st_ref, shp, _, _), st_f in zip(levels[1:], sts):
                for name in ("c", "e", "w", "n", "s", "ne", "nw", "se", "sw"):
                    a, bv = getattr(st_ref, name), getattr(st_f, name)
                    d = float(jnp.max(jnp.abs(a - bv)))
                    s = float(jnp.max(jnp.abs(a))) + 1e-30
                    worst = max(worst, d / s)
        out["rap_rel_err_127"] = round(worst, 8)

        # 2. iteration-count parity: 63^2 Re=100 to 1e-5, auto vs xla
        mesh63 = nf.StructuredMesh(nx=63, ny=63)
        fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
        cfg = SIMPLEConfig(max_iterations=4000, tolerance=1e-5)
        mom_d = KrylovMomentumConfig(tolerance=1e-6, max_iterations=20)
        iters = {}
        for backend in ("auto", "xla"):
            pres = MultigridConfig(tolerance=1e-2, max_cycles=6,
                                   cycle_type="v", check_every=2,
                                   coarsest_sweeps=8, coarse_rebuild_every=8,
                                   backend=backend)
            _, diag = simple_solve(mesh63, fluid, bc,
                                   _fresh_state(mesh63, bc), cfg,
                                   momentum=mom_d, pressure=pres)
            assert bool(diag.converged), float(diag.final_residual)
            iters[backend] = int(diag.iterations)
        out["iters_fused"] = iters["auto"]
        out["iters_xla"] = iters["xla"]
        drift = abs(iters["auto"] - iters["xla"]) / max(iters["xla"], 1)

        # 3. strip-assembly parity at 512^2 (the bandwidth-regime kernel,
        # ops/pallas_assembly.py) against the global XLA assembly
        from naviflow_tpu.core.bc import apply_velocity_bcs
        from naviflow_tpu.ops.pallas_assembly import (
            fused_assembly_pair, supports_fused_assembly)
        from naviflow_tpu.ops.powerlaw import (
            relax_coefficients, u_momentum_coefficients)

        asm_err = 0.0
        n5 = 512
        if supports_fused_assembly(n5, n5, "power_law", jnp.float32, "auto"):
            m5 = nf.StructuredMesh(nx=n5, ny=n5)
            s5 = _fresh_state(m5, bc)
            u5, v5 = apply_velocity_bcs(s5.u, s5.v, bc)
            kw5 = dict(dx=1.0 / (n5 - 1), dy=1.0 / (n5 - 1), rho=1.0,
                       mu=1e-3)
            cu_un, cu_rel, _, _ = jax.jit(
                lambda u, v, p: fused_assembly_pair(u, v, p, alpha=0.7,
                                                    **kw5))(u5, v5, s5.p)
            want_un = u_momentum_coefficients(u5, v5, s5.p, **kw5)
            want_rel = relax_coefficients(want_un, u5, 0.7)
            for got, want in ((cu_un, want_un), (cu_rel, want_rel)):
                for name in ("a_e", "a_w", "a_n", "a_s", "a_p", "src"):
                    d = float(jnp.max(jnp.abs(getattr(got, name)
                                              - getattr(want, name))))
                    s = float(jnp.max(jnp.abs(getattr(want, name)))) + 1e-30
                    asm_err = max(asm_err, d / s)
        out["assembly_rel_err_512"] = round(asm_err, 8)

        out["ok"] = bool(worst < 1e-4 and drift <= 0.05 and asm_err < 1e-4)
    except Exception as e:  # pragma: no cover - diagnostic path
        out["error"] = f"{type(e).__name__}: {e}"
    return out


def _distributed_check(nx=64, n_steps=5):
    """Short-trajectory parity between the distributed step (shard_map over
    a 1x1 mesh of the current device: windowed assembly with global-index
    masks, masked Jacobi momentum, Jacobi-PCG pressure with psum dots) and
    the plain single-device step.  On a 1-device mesh the distributed code
    computes the same arithmetic, so after a few outer iterations the fields
    must agree to f32 roundoff; a large divergence means the distributed
    program miscompiled on this backend (cf. the commit-7b886eb bf16-MXU
    episode — exactly the class of failure CPU-mesh tests cannot catch)."""
    import jax.numpy as jnp
    import naviflow_tpu as nf
    from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
    from naviflow_tpu.parallel.dist_simple import (DistributedConfig,
                                                   distributed_simple_solve)
    from naviflow_tpu.parallel.sharding import make_device_mesh
    from naviflow_tpu.solvers import CGPressureConfig, JacobiMomentumConfig

    out = {"ok": False}
    try:
        from naviflow_tpu.algorithms import SIMPLECConfig, simplec_solve

        mesh = nf.StructuredMesh(nx=nx, ny=nx)
        fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
        bc = nf.lid_driven_cavity(1.0)
        dmesh = make_device_mesh(1)
        algos = {}
        for algo, single_solve, single_cfg in (
                ("simple", simple_solve,
                 SIMPLEConfig(max_iterations=n_steps, tolerance=0.0)),
                # alpha_p pinned: SIMPLECConfig defaults 0.2 (the reference
                # SimplecSolver ctor), DistributedConfig 0.3 — the parity
                # comparison needs one value on both sides
                ("simplec", simplec_solve,
                 SIMPLECConfig(max_iterations=n_steps, tolerance=0.0,
                               alpha_p=0.3)),
        ):
            # each solve gets its OWN initial state: both loop harnesses
            # donate their carries, so sharing one state means the second
            # solve reads deleted buffers (measured on hardware)
            fd, dd = distributed_simple_solve(
                mesh, fluid, bc, nf.initialize_state(mesh, bc), dmesh,
                DistributedConfig(max_iterations=n_steps, tolerance=0.0,
                                  momentum_sweeps=2, pressure_solver="cg",
                                  pressure_tol=1e-6, pressure_max_iter=200,
                                  check_every=n_steps, algorithm=algo))
            fs, _ = single_solve(
                mesh, fluid, bc, nf.initialize_state(mesh, bc), single_cfg,
                momentum=JacobiMomentumConfig(n_sweeps=2),
                pressure=CGPressureConfig(tolerance=1e-6,
                                          max_iterations=200),
                loop="fused")
            diff = max(float(jnp.max(jnp.abs(fd.u - fs.u))),
                       float(jnp.max(jnp.abs(fd.v - fs.v))))
            algos[algo] = round(diff, 9)
            if algo == "simple":
                out["max_uv_diff"] = round(diff, 9)
                out["final_residual"] = float(dd["final_residual"])
        out["algos"] = algos
        out["ok"] = bool(all(d < 1e-4 for d in algos.values())
                         and jnp.isfinite(jnp.asarray(list(algos.values())))
                         .all())
    except Exception as e:  # pragma: no cover - diagnostic path
        out["error"] = f"{type(e).__name__}: {e}"
    return out


def _bench_large_grid(nx, re, n_iters=30):
    """Measured full-SIMPLE-step throughput at ``nx^2``: MARGINAL ms/iter
    via a two-point slope, (wall(4n) - wall(n)) / 3n, each a fixed fused
    block (one bounded program — tunneled workers kill executions beyond
    ~60-100 s), timed through a host value fetch.  The slope removes the
    per-call fixed cost (donated-carry/hierarchy setup + tunnel dispatch,
    measured ~232 ms/call at 4096^2 in round 4) that long production runs
    amortize away but that a naive wall/n reading charges per iteration."""
    import jax
    import jax.numpy as jnp
    import naviflow_tpu as nf
    from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
    from naviflow_tpu.solvers import KrylovMomentumConfig
    from naviflow_tpu.solvers.multigrid import MultigridConfig

    from naviflow_tpu.solvers import ChebyshevMomentumConfig

    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=re)
    bc = nf.lid_driven_cavity(1.0)
    # Large-grid momentum default: fixed-degree Chebyshev through the
    # strip-blocked VMEM kernel (ops/pallas_cheby.py) — zero reductions
    # in the iteration, one HBM pass over the coefficients.  Measured at
    # 2048^2 (MOMENTUM_BUDGET.jsonl, round 5): the XLA Chebyshev already
    # beat the round-4 pair-BiCGSTAB(5) 10.94 vs 17.65 ms/iter with the
    # 40-fixed-step residual within 1%; the strip kernel removes the
    # remaining coefficient streaming.  BENCH_MOM=bicgstab restores the
    # round-4 configuration (inner budget 5 — see MOMENTUM_BUDGET.jsonl).
    mom_kind = os.environ.get("BENCH_MOM", "cheby")
    # degree 4: the measured throughput sweet spot (MOMENTUM_BUDGET.jsonl
    # 2026-08-19; degree 6 costs +0.1-0.14 ms/iter for a ~1% tighter
    # 40-step residual — available via ChebyshevMomentumConfig(degree=6))
    mom = (ChebyshevMomentumConfig(degree=4) if mom_kind == "cheby"
           else KrylovMomentumConfig(tolerance=1e-6, max_iterations=5))
    # Cycle budget (benchmarks/cycle_budget_probe.py, CYCLE_TIMING
    # kind=cycle-budget): ONE fixed V-cycle per outer step, no adaptive
    # residual check (tolerance=0 -> the fori fast path).  SIMPLE
    # re-linearizes every outer step, so extra pressure accuracy within a
    # step buys nothing: the 12,000-iteration chunked trajectories of
    # fixed1 / fixed2 / the round-5 adaptive config agree to SIX
    # significant digits at 1024^2 (kind=cycle-budget *-converge rows),
    # and the 40-fixed-step residuals to 4-5 digits at every size.
    # Paired ms/iter: 1024^2 0.684 vs 1.222 adaptive; 2048^2 4.127 vs
    # 6.41.  BENCH_FIXED_CYCLES=0 restores the round-5 adaptive configs.
    if os.environ.get("BENCH_FIXED_CYCLES", "1") == "1":
        # 1/1 smoothing at EVERY size (probed fixed1_pre1post1): beats the
        # 2/2 fixed1 4.127 vs 4.414 ms/iter at 2048^2 (>= 1 GLUPS) and
        # 24.41 vs 25.80 at 4096^2, 40/30-step residuals equal to 4-5
        # digits and the 6000-iteration 2048^2 trajectory equal to 6
        # digits (CYCLE_TIMING kind=cycle-budget, 2026-08-20 rows)
        pres = MultigridConfig(tolerance=0.0, max_cycles=1, cycle_type="v",
                               pre_smoothing=1, post_smoothing=1,
                               coarsest_sweeps=32, coarse_rebuild_every=8)
    elif nx < 2048:
        pres = MultigridConfig(tolerance=1e-2, max_cycles=8, cycle_type="v",
                               check_every=1, pre_smoothing=1,
                               post_smoothing=1, coarsest_sweeps=32,
                               coarse_rebuild_every=8)
    else:
        pres = MultigridConfig(tolerance=1e-2, max_cycles=8, cycle_type="v",
                               check_every=2, coarsest_sweeps=32,
                               coarse_rebuild_every=8)

    def timed_block(n):
        cfg = SIMPLEConfig(max_iterations=n, tolerance=0.0)
        solve = lambda s: simple_solve(mesh, fluid, bc, s, cfg,
                                       momentum=mom, pressure=pres,
                                       loop="fused")
        solve(_fresh_state(mesh, bc))  # compile
        state = _fresh_state(mesh, bc)
        float(jnp.sum(state.p))
        t0 = time.perf_counter()
        _, diag = solve(state)
        float(diag.final_residual)
        return time.perf_counter() - t0

    w1 = timed_block(n_iters)
    w4 = timed_block(4 * n_iters)
    ms = (w4 - w1) / (3 * n_iters) * 1e3
    return {
        "nx": nx,
        "iterations_timed": 4 * n_iters,
        "ms_per_iteration": round(ms, 2),
        "mlups": round(nx * nx / ms / 1e3, 1),
        "glups": round(nx * nx / ms / 1e6, 4),
    }


def _bench_sequenced():
    """Grid-sequenced 1024^2 cavity to 1e-5 (the BASELINE headline metric)."""
    import jax
    import naviflow_tpu as nf
    from naviflow_tpu.algorithms import (SIMPLEConfig, grid_sequence_solve,
                                         simple_solve)
    from naviflow_tpu.solvers import KrylovMomentumConfig
    from naviflow_tpu.solvers.multigrid import MultigridConfig
    from naviflow_tpu.postprocessing.validation import infinity_norm_error

    nx = int(os.environ.get("BENCH_NX", 1024))
    re = float(os.environ.get("BENCH_RE", 1000))
    tol = float(os.environ.get("BENCH_TOL", 1e-5))
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=re)
    bc = nf.lid_driven_cavity(1.0)
    cfg = SIMPLEConfig(max_iterations=int(os.environ.get("BENCH_MAXIT", 20000)),
                       tolerance=tol)
    mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=25)
    pres = MultigridConfig(tolerance=1e-2, max_cycles=8, cycle_type="v",
                           check_every=2, coarsest_sweeps=32,
                           coarse_rebuild_every=8)

    # keep each fused chunk under the tunneled worker's ~60 s watchdog:
    # ~14 ms/iter at 1024^2, ~4x per refinement
    chunk = int(os.environ.get("BENCH_CHUNK", 300 if nx <= 1024 else 100))
    t0 = time.perf_counter()
    final, diag, summ = grid_sequence_solve(
        mesh, fluid, bc, simple_solve, cfg, momentum=mom, pressure=pres,
        loop=f"chunked:{chunk}",
        perturb_seed=struct.unpack("<I", os.urandom(4))[0],
    )
    err = infinity_norm_error(final.u, final.v, mesh, re)
    wall = time.perf_counter() - t0
    total_updates = sum(s["iterations"] * s["nx"] ** 2 for s in summ)
    print(json.dumps({
        "metric": f"wall_clock_to_{tol:g}_residual_{nx}x{nx}_Re{int(re)}_sequenced_GMG_SIMPLE",
        "value": round(wall, 2),
        "unit": "s",
        "vs_baseline": None,  # the reference cannot run this configuration
        "converged": all(s["converged"] for s in summ),
        "fine_level_iterations": summ[-1]["iterations"],
        "levels": summ,
        "ghia_infinity_error": round(err, 5),
        "ghia_passed": bool(err < GHIA_GATE),
        "mlups_outer": round(total_updates / wall / 1e6, 2),
        "device": str(jax.devices()[0]),
    }))


def _run_child():
    """One measurement attempt: bounded backend preflight IN A SUBPROCESS
    (a dead axon tunnel hangs device initialization in uninterruptible C
    code — SIGALRM never fires), then the measurements."""
    import subprocess

    try:
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=150)
            if probe.returncode != 0:
                raise RuntimeError(
                    "TPU backend init failed: "
                    + probe.stderr.decode()[-200:])
        except subprocess.TimeoutExpired:
            raise RuntimeError("TPU backend initialization timed out "
                               "(axon tunnel unavailable)")
        main()
    except Exception as e:  # pragma: no cover
        print(json.dumps({
            "metric": "wall_clock_to_0.001_residual_63x63_Re100_GMG_SIMPLE",
            "value": None, "unit": "s", "vs_baseline": None,
            "error": f"{type(e).__name__}: {str(e)[:300]}",
        }))
        raise SystemExit(1)


def _run_with_retries():
    """Bounded retry/backoff across the capture window (round-3 verdict
    weak #2: one tunnel-outage window must not wipe the round's number of
    record).  Each attempt runs the whole bench in a subprocess with a kill
    timeout; the parent relays the first attempt that produced a real
    value, else emits one machine-readable error row listing every attempt.

    Env knobs: BENCH_RETRIES (3), BENCH_RETRY_WAIT (180 s between
    attempts), BENCH_CHILD_TIMEOUT (900 s per attempt), BENCH_DEADLINE_S
    (2700 s total across the window)."""
    import subprocess

    attempts = int(os.environ.get("BENCH_RETRIES", 3))
    wait_s = float(os.environ.get("BENCH_RETRY_WAIT", 180))
    child_timeout = float(os.environ.get("BENCH_CHILD_TIMEOUT", 900))
    deadline = time.time() + float(os.environ.get("BENCH_DEADLINE_S", 2700))
    errors = []
    for i in range(attempts):
        budget = min(child_timeout, max(60.0, deadline - time.time()))
        lines, r = [], None
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                capture_output=True, timeout=budget, text=True)
            lines = [ln for ln in r.stdout.strip().splitlines()
                     if ln.startswith("{")]
        except subprocess.TimeoutExpired:
            errors.append(f"attempt {i + 1}: killed after {budget:.0f}s")
        row = None
        if lines:
            try:
                row = json.loads(lines[-1])
            except ValueError:
                pass
        if row is not None and row.get("value") is not None:
            print(lines[-1])
            return 0
        if row is not None:
            errors.append(f"attempt {i + 1}: {row.get('error', 'no value')}")
        elif r is not None:
            errors.append(f"attempt {i + 1}: rc={r.returncode}, no JSON "
                          f"({(r.stderr or '')[-120:]})")
        if i < attempts - 1:
            if time.time() + wait_s >= deadline:
                errors.append("capture-window deadline reached; "
                              "no further retries")
                break
            time.sleep(wait_s)
    print(json.dumps({
        "metric": "wall_clock_to_0.001_residual_63x63_Re100_GMG_SIMPLE",
        "value": None, "unit": "s", "vs_baseline": None,
        "error": "; ".join(errors)[:600],
    }))
    return 1


if __name__ == "__main__":
    # keep stdout clean for the one JSON line
    import warnings

    warnings.filterwarnings("ignore")
    os.environ.setdefault("JAX_LOG_COMPILES", "0")
    if "--child" in sys.argv:
        _run_child()
    else:
        raise SystemExit(_run_with_retries())
