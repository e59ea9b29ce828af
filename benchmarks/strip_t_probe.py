"""Strip-window (T) sweep under the raised per-kernel VMEM limit.

The interleaved strip kernels' window cap was an empirical proxy for
Mosaic's default 16 MiB scoped-VMEM stack; with the per-kernel limit
raised (ops/pallas_mg.kernel_params) much larger windows compile.  This
probes which T actually WINS per grid size — the plane probe taught that
bigger-if-it-fits is the wrong rule (T=128 lost to T=64 at nc=1024:
fewer grid steps = less DMA/compute overlap).

Times a down+up pair chain (reps in one program, two-point input
perturbation against the tunnel's memoization) per (nx, T), plus the XLA
pair as the floor.  Stencil arrays are jit ARGUMENTS (closed-over
constants at 4096^2 exceed the tunnel's remote_compile size cap).

Usage: python benchmarks/strip_t_probe.py [nx ...]   (default 1024 2048 4096)
       STRIP_T_REPS=200 ... to raise the in-program rep count (small grids
       need >=200 so the chain dwarfs the ~25 ms host-fetch jitter).
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
import numpy as np

from naviflow_tpu.ops.poisson import poisson_coefficients
from naviflow_tpu.ops.stencil9 import apply5, from_poisson
from naviflow_tpu.ops.transfer_cc import prolong_cc, restrict_cc
from naviflow_tpu.ops import pallas_strip as pstrip
from naviflow_tpu.ops.pallas_strip import H, strip_down, strip_up
from naviflow_tpu.solvers.multigrid import MultigridConfig, _smooth


def bench(nx, reps=int(os.environ.get("STRIP_T_REPS", "10"))):
    rng = np.random.default_rng(0)
    d_u = jnp.asarray(rng.uniform(0.5, 1.5, (nx + 1, nx)), jnp.float32)
    d_v = jnp.asarray(rng.uniform(0.5, 1.5, (nx, nx + 1)), jnp.float32)
    pc = poisson_coefficients(d_u, d_v, dx=1.0 / nx, dy=1.0 / nx, rho=1.0,
                              variant="consistent")
    st = from_poisson(pc)
    p = jnp.asarray(rng.normal(size=(nx, nx)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(nx, nx)), jnp.float32)
    cfg = MultigridConfig(pre_smoothing=2, post_smoothing=2, smoother="gs")

    @jax.jit
    def xla_chain(p, b, st):
        def body(i, q):
            x = _smooth(q, b, st, cfg, 2, True, None)
            rc = restrict_cc(b - apply5(x, st))
            x = x + prolong_cc(rc)
            return _smooth(x, b, st, cfg, 2, True, None)
        return jax.lax.fori_loop(0, reps, body, p)

    def timed(f, *args):
        out = f(*args)
        jax.block_until_ready(out)
        walls = []
        for _ in range(2):
            seed = struct.unpack("<I", os.urandom(4))[0]
            p2 = p + jax.random.uniform(jax.random.PRNGKey(seed), (),
                                        jnp.float32, 0, 1e-9)
            float(jnp.sum(p2))
            t0 = time.perf_counter()
            out = f(p2, *args[1:])
            float(jnp.sum(out))
            walls.append(time.perf_counter() - t0)
        return (min(walls) - 0.025) / reps * 1e3

    try:
        ms = timed(xla_chain, p, b, st)
        print(json.dumps({"nx": nx, "kind": "xla", "ms_per_pair": round(ms, 4)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"nx": nx, "kind": "xla", "ok": False,
                          "err": type(e).__name__}), flush=True)

    for T in (32, 64, 128, 256):
        if T + 2 * H > nx // 2 or nx % T:
            continue
        pstrip._CAP_FIVE = (T + 2 * H) * nx  # force this T
        assert pstrip._strip_rows(nx, nx) == T

        @jax.jit
        def strip_chain(p, b, st):
            def body(i, q):
                x, rc = strip_down(q, b, st, cfg)
                return strip_up(x, b, st, rc, cfg)
            return jax.lax.fori_loop(0, reps, body, p)

        try:
            ms = timed(strip_chain, p, b, st)
            print(json.dumps({"nx": nx, "kind": "strip", "T": T,
                              "ms_per_pair": round(ms, 4)}), flush=True)
        except Exception as e:
            print(json.dumps({"nx": nx, "kind": "strip", "T": T, "ok": False,
                              "err": type(e).__name__,
                              "msg": str(e).split("\n")[0][:160]}), flush=True)


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    for nx in sizes:
        bench(nx)
