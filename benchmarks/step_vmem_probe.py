"""Re-probe the variant whole-step kernels' VMEM budgets (round-4 verdict
weak #2 / next #3).

``ops/pallas_step._ALGO_VMEM_BUDGETS`` still encodes the pre-raise 16 MiB
Mosaic OOMs ("SIMPLEC 16.42M vs limit 16.00M"); the per-kernel scoped-VMEM
limit has since been raised to 64 MiB (``pallas_mg.kernel_params``), which
the 255^2 variant estimates (~11-12.7 MiB naive) fit ~5x over.  This probe
raises the gate in-process, compiles + runs each variant's whole-step
kernel at 255^2 ON HARDWARE, and emits paired fused-vs-XLA ms/iter plus a
residual-parity check after the same fixed iteration count.

Usage: python benchmarks/step_vmem_probe.py [nx ...]
Rows appended to benchmarks/CYCLE_TIMING.jsonl with kind=vmem-probe.
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
from naviflow_tpu.algorithms import (PISOConfig, SIMPLECConfig, SIMPLERConfig,
                                     piso_solve, simplec_solve, simpler_solve)
from naviflow_tpu.solvers import KrylovMomentumConfig
from naviflow_tpu.solvers.multigrid import MultigridConfig

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "CYCLE_TIMING.jsonl")


def _emit(row):
    row = dict(row, kind="vmem-probe", date="2026-08-19",
               hw=str(jax.devices()[0]))
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main(sizes):
    import naviflow_tpu.ops.pallas_step as ps

    algos = (("simplec", SIMPLECConfig, simplec_solve),
             ("piso", PISOConfig, piso_solve),
             ("simpler", SIMPLERConfig, simpler_solve))
    mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=25)
    for nx in sizes:
        n_iters = 50
        mesh = nf.StructuredMesh(nx=nx, ny=nx)
        fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
        bc = nf.lid_driven_cavity(1.0)
        for name, AlgoCfg, algo_solve in algos:
            est = (ps._ALGO_FINE_TEMPS[name] * ps._padded_bytes(nx, nx))
            for shp in ps.step_shapes(nx, nx, MultigridConfig()):
                est += 12 * ps._padded_bytes(*shp)
            res = {}
            for mode, budget in (("fused", 64 * 2**20),
                                 ("xla", None)):
                old = dict(ps._ALGO_VMEM_BUDGETS)
                if budget is not None:
                    ps._ALGO_VMEM_BUDGETS[name] = budget
                try:
                    pres = MultigridConfig(
                        tolerance=1e-2, max_cycles=6, cycle_type="v",
                        check_every=2, coarsest_sweeps=8,
                        coarse_rebuild_every=8,
                        backend="auto" if mode == "fused" else "xla")
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
                    out, _ = solve(state)  # compile + warm
                    walls = []
                    for _ in range(3):
                        float(jnp.sum(out.p))
                        t0 = time.perf_counter()
                        out, diag = solve(out)
                        float(diag.final_residual)
                        walls.append(time.perf_counter() - t0)
                    res[mode] = dict(
                        ms=round(sorted(walls)[1] / n_iters * 1e3, 3),
                        residual=float(diag.final_residual))
                except Exception as e:  # Mosaic OOM -> recorded exclusion
                    res[mode] = dict(error=f"{type(e).__name__}: "
                                           f"{str(e)[:200]}")
                finally:
                    ps._ALGO_VMEM_BUDGETS.clear()
                    ps._ALGO_VMEM_BUDGETS.update(old)
            row = dict(nx=nx, algo=name, est_mib=round(est / 2**20, 2))
            for mode in ("fused", "xla"):
                for k, vv in res[mode].items():
                    row[f"{mode}_{k}"] = vv
            if "residual" in res.get("fused", {}) and \
               "residual" in res.get("xla", {}):
                a, b = res["fused"]["residual"], res["xla"]["residual"]
                row["residual_rel_diff"] = round(
                    abs(a - b) / max(abs(b), 1e-30), 6)
            _emit(row)


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main([int(s) for s in sys.argv[1:]] or [255])
