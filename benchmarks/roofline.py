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


def measure(nx, n_iters):
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=1000.0)
    bc = nf.lid_driven_cavity(1.0)
    cfg = SIMPLEConfig(max_iterations=n_iters, tolerance=0.0)
    mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=25)
    pres = MultigridConfig(tolerance=1e-2, max_cycles=8, cycle_type="v",
                           check_every=2, coarsest_sweeps=32,
                           coarse_rebuild_every=8)

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
    row = dict(
        nx=nx, iterations_timed=n_iters,
        ms_per_iteration=round(ms_per_iter, 3),
        gb_accessed_per_iteration=round(bytes_per_iter / 1e9, 4),
        flops_per_iteration=round(flops_total / n_iters / 1e9, 3),
        hbm_roofline_ms=round(roofline_ms, 3),
        roofline_fraction=round(roofline_ms / ms_per_iter, 3),
        glups=round(nx * nx / (ms_per_iter * 1e-3) / 1e9, 4),
    )
    return row


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    here = os.path.dirname(os.path.abspath(__file__))
    rows = []
    for nx in sizes:
        n_iters = max(4, min(30, int(2 ** 22 / nx)))
        row = measure(nx, n_iters)
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(os.path.join(here, "ROOFLINE.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")
    print("\n| grid | ms/iter | GB/iter (XLA-counted) | HBM roofline ms "
          "| roofline % | GLUPS |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['nx']}^2 | {r['ms_per_iteration']} "
              f"| {r['gb_accessed_per_iteration']} | {r['hbm_roofline_ms']} "
              f"| {100 * r['roofline_fraction']:.0f}% | {r['glups']} |")


if __name__ == "__main__":
    main()
