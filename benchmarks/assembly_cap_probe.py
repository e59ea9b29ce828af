"""Re-probe the assembly strip window cap under the raised 64 MiB
scoped-VMEM limit (round 5; the same class of stale-budget fix as the
whole-step kernels' `step_vmem_probe.py`).

`ops/pallas_assembly._CAP_CELLS = 96k` was measured against Mosaic's
DEFAULT 16 MiB scoped-VMEM stack; `kernel_params()` has since raised the
per-kernel limit to 64 MiB.  The 96k cap forces T=16 at 2048^2 (W=48
rows DMA'd per 16 owned -> 3x halo redundancy) and excludes the kernel
entirely at 4096^2 (XLA assembly fallback, ~4x the streaming roofline).

For each (nx, cap): compile + run the fused assembly, check numerics
against the global XLA assembly (max relative coefficient error), and
time the marginal cost over a chained block.  Mosaic OOMs are recorded
as exclusions.  Rows appended to CYCLE_TIMING.jsonl, kind=assembly-cap.

Usage: python benchmarks/assembly_cap_probe.py [nx ...]   (default 2048 4096)
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
import naviflow_tpu.ops.pallas_assembly as pa
from naviflow_tpu.core.bc import apply_velocity_bcs
from naviflow_tpu.ops.powerlaw import (relax_coefficients,
                                       u_momentum_coefficients,
                                       v_momentum_coefficients)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "CYCLE_TIMING.jsonl")


def _emit(row):
    row = dict(row, kind="assembly-cap", date="2026-08-19",
               hw=str(jax.devices()[0]))
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def probe(nx, caps):
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    bc = nf.lid_driven_cavity(1.0)
    dx, dy = mesh.get_cell_sizes()
    kw = dict(dx=dx, dy=dy, rho=1.0, mu=1e-3)
    s = nf.initialize_state(mesh, bc)
    seed = struct.unpack("<I", os.urandom(4))[0]
    u0 = s.u + jax.random.uniform(jax.random.PRNGKey(seed), s.u.shape,
                                  jnp.float32, 0.0, 1e-3)
    u0, v0 = apply_velocity_bcs(u0, s.v, bc)
    p0 = s.p

    # XLA reference coefficients (compare at f32)
    want_u = u_momentum_coefficients(u0, v0, p0, **kw)
    want_ur = relax_coefficients(want_u, u0, 0.7)
    want_v = v_momentum_coefficients(u0, v0, p0, **kw)

    reps = 30

    def chain(fn):
        @jax.jit
        def run(u, v, p):
            def it(i, acc):
                outs = fn(u + 1e-12 * i, v, p)
                return acc + outs[1].a_p[5, 5]
            return jax.lax.fori_loop(0, reps, it, jnp.asarray(0.0, u.dtype))
        return run

    for cap in caps:
        old = pa._CAP_CELLS
        pa._CAP_CELLS = cap
        try:
            T = pa._strip_rows_assembly(nx, nx)
            row = dict(nx=nx, cap_cells=cap, T=T)
            if T == 0:
                row["excluded"] = "no T fits"
                _emit(row)
                continue
            fn = lambda u, v, p: pa.fused_assembly_pair(u, v, p, alpha=0.7,
                                                        **kw)
            cu_un, cu_rel, cv_un, _ = jax.jit(fn)(u0, v0, p0)
            err = 0.0
            for got, want in ((cu_un, want_u), (cu_rel, want_ur),
                              (cv_un, want_v)):
                for name in ("a_e", "a_w", "a_n", "a_s", "a_p", "src"):
                    d = float(jnp.max(jnp.abs(getattr(got, name)
                                              - getattr(want, name))))
                    sc = float(jnp.max(jnp.abs(getattr(want, name)))) + 1e-30
                    err = max(err, d / sc)
            row["max_rel_err"] = round(err, 9)
            run = chain(fn)
            out = run(u0, v0, p0)
            float(out)  # warm
            walls = []
            for _ in range(3):
                sd = struct.unpack("<I", os.urandom(4))[0]
                up = u0 + jax.random.uniform(jax.random.PRNGKey(sd),
                                             u0.shape, jnp.float32, 0, 1e-9)
                float(jnp.sum(up))
                t0 = time.perf_counter()
                float(run(up, v0, p0))
                walls.append(time.perf_counter() - t0)
            row["ms_per_assembly"] = round(
                (sorted(walls)[1] - 0.025) / reps * 1e3, 3)
            _emit(row)
        except Exception as e:
            _emit(dict(nx=nx, cap_cells=cap,
                       error=f"{type(e).__name__}: {str(e)[:200]}"))
        finally:
            pa._CAP_CELLS = old


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    sizes = [int(a) for a in sys.argv[1:]] or [2048, 4096]
    for nx in sizes:
        probe(nx, [96 * 1024, 192 * 1024, 384 * 1024, 656 * 1024])
