"""Roofline accountability: XLA-counted bytes/iteration vs measured time.

Round-4 verdict #8: the GLUPS chase needs an explicit stop test.  For each
grid size this compiles the production fused SIMPLE-step block and asks
the compiler itself for the executable's HBM traffic
(``compiled.cost_analysis()['bytes accessed']`` — counted from the final
optimized HLO, so fusion/rematerialization are already reflected), then
measures the same program's wall clock and reports the achieved fraction
of the chip's HBM roofline:

    roofline_ms = bytes_per_iter / HBM_BW
    fraction    = roofline_ms / measured_ms

A fraction near 1 means the step IS the memory traffic — further kernel
work can only help by removing traffic, not by scheduling.  Appends rows
to ROOFLINE.jsonl and prints a markdown table for BENCHMARKS.md.

Usage:  python benchmarks/roofline.py [nx ...]      (default 1024 2048 4096)
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

HBM_GBPS = 819.0  # TPU v5e: 16 GB HBM2 @ 819 GB/s (public spec)

_B = 4  # f32


def _lane(n):
    return -(-n // 128) * 128


def _strip_launch_bytes(n, five, direction):
    """Analytic HBM traffic of one strip_down/strip_up launch at an n^2
    level (window geometry is static — ops/pallas_strip.py): each of the
    nx/T grid steps DMAs (2+ns) arrays of (T+2H, ny) rows into VMEM and
    writes back the T owned rows.  Returns (dma_bytes, operand_once_bytes)
    where the second is what a counter that bills each operand/result
    array exactly once would see (the halo excess is the difference)."""
    from naviflow_tpu.ops.pallas_strip import H, _strip_rows

    ns = 5 if five else 9
    T = _strip_rows(n, n, five)
    if not T:
        return None
    W, G = T + 2 * H, n // T
    if direction == "down":
        read = (2 + ns) * G * W * n * _B
        write = (n * n + (n // 2) * n) * _B
        once = (2 + ns) * n * n * _B + write
    else:
        read = ((2 + ns) * G * W + G * (W // 2)) * n * _B
        write = n * n * _B
        once = ((2 + ns) * n * n + (n // 2) * n) * _B + write
    return read + write, once


def _assembly_launch_bytes(nx, ny):
    """One fused_assembly_pair launch (ops/pallas_assembly.py): 3 halo-
    extended field windows + 2 relaxation windows in, 16 coefficient
    arrays out."""
    from naviflow_tpu.ops.pallas_assembly import PAD, _strip_rows_assembly

    # folded=True: the production step folds bounds + the poisson
    # operator into this kernel, which selects the folded strip height
    T = _strip_rows_assembly(nx, ny, folded=True)
    if not T:
        return None
    W, G = T + 2 * PAD, nx // T
    # 16 coefficient arrays + d_u/d_v + the 5 poisson-operator arrays
    read = G * (3 * W * _lane(ny + 2) + T * _lane(ny)
                + T * _lane(ny + 1)) * _B
    write = (8 * nx * ny + 8 * nx * (ny + 1)) * _B \
        + (6 * nx * ny + nx * (ny + 1)) * _B
    once = (3 * nx * _lane(ny + 2) + nx * ny + nx * (ny + 1)) * _B + write
    return read + write, once


def _cheby_launch_bytes(NI, NJ, degree=4):
    """One chebyshev_momentum_strips launch (ops/pallas_cheby.py): 9
    coefficient/field windows in, x* and the masked residual out.  The
    degree does not change the traffic — that is the point of the
    kernel."""
    from naviflow_tpu.ops.pallas_cheby import H, _lane, _strip_rows

    lane_nj = _lane(NJ)
    R_proc = NI - 1
    T = _strip_rows(R_proc, lane_nj)
    if not T:
        return None
    W = T + 2 * H
    R_grid = -(-R_proc // T) * T
    G = R_grid // T
    read = 9 * G * W * lane_nj * _B
    write = 2 * R_grid * lane_nj * _B
    once = 9 * NI * NJ * _B + write
    return read + write, once


def pallas_step_traffic(nx, pres_cfg, mom_cfg=None):
    """Analytic per-unit HBM traffic of every Pallas custom call in the
    production SIMPLE step (XLA's ``cost_analysis`` is blind to custom-
    call internals — round-4 reading-rule (a), now replaced by this
    count).  Returns ``(per_cycle, per_step)`` byte dicts, each with
    ``dma`` (true DMA traffic incl. halo redundancy) and ``once``
    (operands+results billed once — the part XLA's counter may already
    include for the custom call's interface arrays)."""
    import jax.numpy as jnp

    from naviflow_tpu.ops.pallas_mg import supports_fused
    from naviflow_tpu.ops.pallas_strip import supports_strip
    from naviflow_tpu.solvers.multigrid import build_levels

    d_u = jnp.ones((nx + 1, nx), jnp.float32)
    d_v = jnp.ones((nx, nx + 1), jnp.float32)
    levels = build_levels(d_u, d_v, pres_cfg, dx=1.0 / nx, dy=1.0 / nx,
                          rho=1.0, variant="consistent")
    cyc_dma = cyc_once = 0
    if not supports_fused(levels, pres_cfg):  # peel+tail path (_cycle0)
        k = next((k for k in range(1, len(levels))
                  if supports_fused(levels[k:], pres_cfg)), None)
        if k is not None:
            for lvl in range(k):
                _, (n, n2), five, _ = levels[lvl]
                if supports_strip(n, n2, five, pres_cfg, jnp.float32):
                    for direction in ("down", "up"):
                        db, ob = _strip_launch_bytes(n, five, direction)
                        cyc_dma += db
                        cyc_once += ob
            # fused tail V-cycle: whole arrays DMA'd once (no halo excess)
            tail = 2 * levels[k][1][0] ** 2 + levels[k][1][0] ** 2  # p,b + out
            for st_, (n, _), five, _ in levels[k:]:
                tail += (5 if five else 9) * n * n
            for (_, (nf, _), _, _), (_, (nc, _), _, _) in zip(
                    levels[k:], levels[k + 1:]):
                tail += 2 * nf * nc
            cyc_dma += tail * _B
            cyc_once += tail * _B
    else:
        # whole-hierarchy fused kernel: everything once per solve call,
        # amortized over its in-kernel cycles — report per-cycle as the
        # full operand set (upper bound)
        tot = 3 * nx * nx
        for st_, (n, _), five, _ in levels:
            tot += (5 if five else 9) * n * n
        cyc_dma = cyc_once = tot * _B
    from naviflow_tpu.solvers.momentum import asmcheby_enabled

    if (getattr(mom_cfg, "kind", None) == "chebyshev"
            and asmcheby_enabled(nx, nx, mom_cfg)):
        # merged assemble+solve kernel (ops/pallas_asmcheby.py): 5 input
        # windows per strip, 13 result arrays; NO coefficient round-trip
        from naviflow_tpu.ops.pallas_asmcheby import (PAD,
                                                      _strip_rows_merged)

        T = _strip_rows_merged(nx, nx)
        G = nx // T
        read = G * (3 * (T + 2 * PAD + 8) * _lane(nx + 3)
                    + 2 * (T + 2 * PAD) * _lane(nx + 1)) * _B
        write = (9 * nx * nx + 3 * nx * (nx + 1) + G * 8 * 128) * _B
        step_dma = read + write
        step_once = (5 * nx * (nx + 2) + 9 * nx * nx
                     + 3 * nx * (nx + 1)) * _B
        return (dict(dma=cyc_dma, once=cyc_once),
                dict(dma=step_dma, once=step_once))
    step = _assembly_launch_bytes(nx, nx)
    step_dma, step_once = step if step else (0, 0)
    if getattr(mom_cfg, "kind", None) == "chebyshev":
        from naviflow_tpu.ops.pallas_cheby import supports_cheby_strips

        for NI, NJ in ((nx + 1, nx), (nx, nx + 1)):  # u then v field
            if supports_cheby_strips((NI, NJ), jnp.float32):
                db, ob = _cheby_launch_bytes(NI, NJ)
                step_dma += db
                step_once += ob
    return (dict(dma=cyc_dma, once=cyc_once),
            dict(dma=step_dma, once=step_once))


def measure_avg_cycles(nx, mom, pres, n_steps=12):
    """Average V-cycles per outer iteration of the REAL production step
    (the pressure tolerance early-exits, so the trip count is dynamic):
    run an instrumented chain summing ``info.inner_iterations``."""
    import jax
    import jax.numpy as jnp

    from naviflow_tpu.algorithms.lagged import make_lagged_mg
    from naviflow_tpu.algorithms.simple import SIMPLEConfig, make_simple_step

    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    bc = nf.lid_driven_cavity(1.0)
    dx, dy = mesh.get_cell_sizes()
    step = make_simple_step(dx=dx, dy=dy, rho=1.0, mu=1e-3, bc=bc,
                            cfg=SIMPLEConfig(), mom_cfg=mom, pres_cfg=pres)
    _, _, extra0 = make_lagged_mg(pres, dx=dx, dy=dy, rho=1.0,
                                  variant="consistent")
    ex = (jnp.asarray(0.0, jnp.float32), extra0(jnp.float32, nx, nx))
    s = nf.initialize_state(mesh, bc)

    @jax.jit
    def chain(u, v, p, ex):
        def it(i, carry):
            u, v, p, ex, tot = carry
            u, v, p, ex, info = step(u, v, p, ex)
            return (u, v, p, ex, tot + info.inner_iterations)
        return jax.lax.fori_loop(
            0, n_steps, it, (u, v, p, ex, jnp.asarray(0, jnp.int32)))[4]

    return float(chain(s.u, s.v, s.p, ex)) / n_steps


def measure(nx, n_iters):
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=1000.0)
    bc = nf.lid_driven_cavity(1.0)
    cfg = SIMPLEConfig(max_iterations=n_iters, tolerance=0.0)
    # match bench.py's large-grid production config (BENCH_MOM knob):
    # strip-Chebyshev momentum by default, round-4 BiCGSTAB on request
    from naviflow_tpu.solvers import ChebyshevMomentumConfig

    mom = (ChebyshevMomentumConfig(degree=4)
           if os.environ.get("BENCH_MOM", "cheby") == "cheby"
           else KrylovMomentumConfig(tolerance=1e-6, max_iterations=5))
    # bench.py's round-5 production config: ONE fixed V-cycle per outer
    # step (tolerance<=0 fori fast path; trajectory-certified — see
    # CYCLE_TIMING kind=cycle-budget *-converge rows)
    pres = MultigridConfig(tolerance=0.0, max_cycles=1, cycle_type="v",
                           pre_smoothing=1 if nx < 2048 else 2,
                           post_smoothing=1 if nx < 2048 else 2,
                           coarsest_sweeps=32, coarse_rebuild_every=8)

    def solve(s):
        return simple_solve(mesh, fluid, bc, s, cfg, momentum=mom,
                            pressure=pres, loop="fused")

    def fresh():
        seed = struct.unpack("<I", os.urandom(4))[0]
        noise = jax.random.uniform(jax.random.PRNGKey(seed), mesh.p_shape,
                                   jnp.float32, 0.0, 1e-7)
        s = nf.initialize_state(mesh, bc)
        return s.replace(p=s.p + noise)

    # compile via the public AOT path so cost_analysis sees the OPTIMIZED
    # executable (the same program the timed call runs)
    jitted = jax.jit(solve)
    lowered = jitted.lower(fresh())
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    bytes_total = float(ca.get("bytes accessed", float("nan")))
    flops_total = float(ca.get("flops", float("nan")))

    out = compiled(fresh())  # warm the executable itself
    jax.block_until_ready(out)

    def timed(exe):
        walls = []
        for _ in range(2):
            s = fresh()
            float(jnp.sum(s.p))
            t0 = time.perf_counter()
            _, diag = exe(s)
            float(diag.final_residual)
            walls.append(time.perf_counter() - t0)
        return min(walls)

    # marginal ms/iter via a two-point slope (same method as bench.py):
    # a second executable at 4x the iterations; the difference removes the
    # per-call fixed cost (dispatch + host fetch ~25 ms) that a naive
    # wall/n reading charges per iteration
    cfg4 = SIMPLEConfig(max_iterations=4 * n_iters, tolerance=0.0)

    def solve4(s):
        return simple_solve(mesh, fluid, bc, s, cfg4, momentum=mom,
                            pressure=pres, loop="fused")

    compiled4 = jax.jit(solve4).lower(fresh()).compile()
    jax.block_until_ready(compiled4(fresh()))
    w1 = timed(compiled)
    w4 = timed(compiled4)
    ms_per_iter = (w4 - w1) / (3 * n_iters) * 1e3
    bytes_per_iter = bytes_total / n_iters
    roofline_ms = bytes_per_iter / (HBM_GBPS * 1e9) * 1e3

    # ---- Pallas custom-call traffic (round-4 verdict next #4): the XLA
    # counter is blind to custom-call internals, so count them analytically
    # from the static window geometry, scaled by the MEASURED average
    # V-cycles/iteration of the real step (dynamic early-exit trip count).
    cyc, per_step = pallas_step_traffic(nx, pres, mom)
    avg_cycles = measure_avg_cycles(nx, mom, pres)
    # calibration (measured once, `calibrate_cc_counting()`): XLA's
    # 'bytes accessed' bills custom-call operands/results ~once each, so
    # the UNCOUNTED traffic is the halo-redundancy excess (dma - once)
    extra = ((cyc["dma"] - cyc["once"]) * avg_cycles
             + (per_step["dma"] - per_step["once"]))
    bytes_corrected = bytes_per_iter + extra
    roofline_corr_ms = bytes_corrected / (HBM_GBPS * 1e9) * 1e3
    row = dict(
        nx=nx, iterations_timed=n_iters,
        ms_per_iteration=round(ms_per_iter, 3),
        gb_accessed_per_iteration=round(bytes_per_iter / 1e9, 4),
        flops_per_iteration=round(flops_total / n_iters / 1e9, 3),
        hbm_roofline_ms=round(roofline_ms, 3),
        roofline_fraction=round(roofline_ms / ms_per_iter, 3),
        avg_cycles_per_iteration=round(avg_cycles, 2),
        bytes_pallas_dma_per_iteration=int(cyc["dma"] * avg_cycles
                                           + per_step["dma"]),
        bytes_pallas_halo_excess_per_iteration=int(extra),
        gb_corrected_per_iteration=round(bytes_corrected / 1e9, 4),
        hbm_roofline_corrected_ms=round(roofline_corr_ms, 3),
        roofline_fraction_corrected=round(roofline_corr_ms / ms_per_iter, 3),
        glups=round(nx * nx / (ms_per_iter * 1e-3) / 1e9, 4),
    )
    return row


def calibrate_cc_counting(nx=1024):
    """Does ``cost_analysis()['bytes accessed']`` bill a Pallas custom
    call's operand/result arrays?  Compile a program that is ONE
    strip_down launch and compare the counted bytes against the operand-
    once and full-DMA analytic counts.  Emitted once per roofline run so
    the correction above stays calibrated against the toolchain."""
    import jax
    import jax.numpy as jnp

    from naviflow_tpu.ops.pallas_strip import strip_down
    from naviflow_tpu.ops.stencil9 import Stencil9
    from naviflow_tpu.solvers.multigrid import MultigridConfig

    cfg = MultigridConfig()
    z = jnp.ones((nx, nx), jnp.float32)
    st = Stencil9(c=4 * z, e=-z, w=-z, n=-z, s=-z, ne=0 * z, nw=0 * z,
                  se=0 * z, sw=0 * z)
    f = jax.jit(lambda p, b: strip_down(p, b, st, cfg, True))
    compiled = f.lower(z, z).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    counted = float(ca.get("bytes accessed", float("nan")))
    dma, once = _strip_launch_bytes(nx, True, "down")
    return dict(nx=nx, counted_bytes=int(counted), analytic_once=int(once),
                analytic_dma=int(dma),
                counted_vs_once=round(counted / once, 3),
                counted_vs_dma=round(counted / dma, 3))


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    here = os.path.dirname(os.path.abspath(__file__))
    rows = []
    cal = calibrate_cc_counting()
    print(json.dumps(dict(kind="cc-calibration", **cal)), flush=True)
    with open(os.path.join(here, "ROOFLINE.jsonl"), "a") as f:
        f.write(json.dumps(dict(kind="cc-calibration", **cal)) + "\n")
    for nx in sizes:
        n_iters = max(4, min(30, int(2 ** 22 / nx)))
        row = measure(nx, n_iters)
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(os.path.join(here, "ROOFLINE.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")
    print("\n| grid | ms/iter | GB/iter XLA | GB/iter corrected "
          "| roofline % (corrected) | GLUPS |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['nx']}^2 | {r['ms_per_iteration']} "
              f"| {r['gb_accessed_per_iteration']} "
              f"| {r['gb_corrected_per_iteration']} "
              f"| {100 * r['roofline_fraction_corrected']:.0f}% | {r['glups']} |")


if __name__ == "__main__":
    main()
