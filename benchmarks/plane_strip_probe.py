"""Mosaic VMEM probe for the plane-resident strip kernels.

Sweeps the strip height T at 4096^2 (planes 4096 x 2048) by overriding
the module cap, reporting compile success and ms per down+up pass —
the empirical basis for ``pallas_plane._CAP_CELLS``.

Usage: python benchmarks/plane_strip_probe.py [nx]
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

import naviflow_tpu.ops.pallas_plane as pp
from naviflow_tpu.ops.plane import PlaneStencil5, split_planes
from naviflow_tpu.ops.poisson import poisson_coefficients
from naviflow_tpu.ops.stencil9 import from_poisson
from naviflow_tpu.solvers.multigrid import MultigridConfig


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    nc = nx // 2
    rng = np.random.default_rng(3)
    d_u = jnp.asarray(rng.uniform(0.5, 1.5, (nx + 1, nx)), jnp.float32)
    d_v = jnp.asarray(rng.uniform(0.5, 1.5, (nx, nx + 1)), jnp.float32)
    pc = poisson_coefficients(d_u, d_v, dx=1.0 / nx, dy=1.0 / nx, rho=1.0,
                              variant="consistent")
    st = from_poisson(pc)
    b = jnp.asarray(rng.normal(size=(nx, nx)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(nx, nx)), jnp.float32)
    cfg = MultigridConfig(pre_smoothing=2, post_smoothing=2, smoother="gs")
    R0, B0 = split_planes(p)
    ec = jnp.zeros((nx // 2, nx // 2), jnp.float32)

    for T in (16, 32, 48, 64, 96, 128):
        if nx % T:
            continue
        pp._CAP_CELLS = (T + 2 * pp.H) * nc  # force this T
        assert pp._plane_rows(nx, nc) == T

        # st/b/ec must be jit ARGUMENTS: closed-over arrays embed as HLO
        # constants, and at 4096^2 the ~300 MB constant blob exceeds the
        # axon tunnel's remote_compile request limit (HTTP 413).
        @jax.jit
        def fn(R, B, st, b, ec):
            ps = PlaneStencil5(st, b)

            def pass_(R, B):
                R, B, rc = pp.plane_strip_down(R, B, ps, cfg)
                return pp.plane_strip_up(R, B, ps, ec, cfg)

            return jax.lax.fori_loop(
                0, 10, lambda _, q: pass_(*q), (R, B))

        try:
            out = fn(R0, B0, st, b, ec)
            jax.block_until_ready(out)
        except Exception as e:
            print(json.dumps({"nx": nx, "T": T, "ok": False,
                              "error": f"{type(e).__name__}: {str(e)[:160]}"}),
                  flush=True)
            continue
        walls = []
        for _ in range(2):
            seed = struct.unpack("<I", os.urandom(4))[0]
            Rp = R0 + jax.random.uniform(jax.random.PRNGKey(seed), (),
                                         jnp.float32, 0, 1e-9)
            float(jnp.sum(Rp))
            t0 = time.perf_counter()
            out = fn(Rp, B0, st, b, ec)
            float(jnp.sum(out[0]))
            walls.append(time.perf_counter() - t0)
        ms = (min(walls) - 0.025) / 10 * 1e3
        print(json.dumps({"nx": nx, "T": T, "ok": True,
                          "ms_per_downup": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
