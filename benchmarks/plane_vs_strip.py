"""Fine-level layout shootout at large grids (run ON TPU):

  a) interleaved + XLA          (backend='xla')
  b) interleaved + strip kernels (backend='auto', default)
  c) plane-resident fine level  (fine_layout='plane', backend='xla' coarse)
  d) plane + strips on coarse    (fine_layout='plane', backend='auto')

Times a fixed block of V-cycles of the standalone multigrid solve on a
smooth-coefficient compatible problem.  Decides ROADMAP #1's default.

Usage: python benchmarks/plane_vs_strip.py [nx]
"""
import dataclasses
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
from naviflow_tpu.solvers.multigrid import MultigridConfig, multigrid_solve


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iu = jnp.arange(nx + 1)[:, None] / nx
    ju = jnp.arange(nx)[None, :] / nx
    d_u = (1.0 + 0.4 * jnp.sin(2 * jnp.pi * iu)
           * jnp.cos(2 * jnp.pi * ju)).astype(jnp.float32)
    iv = jnp.arange(nx)[:, None] / nx
    jv = jnp.arange(nx + 1)[None, :] / nx
    d_v = (1.0 + 0.4 * jnp.cos(2 * jnp.pi * iv)
           * jnp.sin(2 * jnp.pi * jv)).astype(jnp.float32)
    kw = dict(dx=1.0 / nx, dy=1.0 / nx, rho=1.0)
    st = from_poisson(poisson_coefficients(d_u, d_v, variant="consistent",
                                           **kw))
    rng = np.random.default_rng(5)
    x_true = jnp.asarray(rng.normal(size=(nx, nx)), jnp.float32)
    b = apply5(x_true, st)

    n_cycles = 20
    base = MultigridConfig(tolerance=0.0, max_cycles=n_cycles,
                           check_every=n_cycles, pre_smoothing=2,
                           post_smoothing=2, smoother="gs")
    variants = {
        "xla": dataclasses.replace(base, backend="xla"),
        "strip": dataclasses.replace(base, backend="auto"),
        "plane_xla": dataclasses.replace(base, backend="xla",
                                         fine_layout="plane"),
        "plane_auto": dataclasses.replace(base, backend="auto",
                                          fine_layout="plane"),
    }
    for name, cfg in variants.items():
        fn = jax.jit(lambda bb, c=cfg: multigrid_solve(
            bb, d_u, d_v, jnp.zeros_like(bb), c, **kw)[0])
        out = fn(b)
        jax.block_until_ready(out)
        walls = []
        for _ in range(2):
            seed = struct.unpack("<I", os.urandom(4))[0]
            bb = b + jax.random.uniform(jax.random.PRNGKey(seed), (),
                                        jnp.float32, 0, 1e-9)
            float(jnp.sum(bb))
            t0 = time.perf_counter()
            out = fn(bb)
            float(jnp.sum(out))
            walls.append(time.perf_counter() - t0)
        ms = (min(walls) - 0.025) / n_cycles * 1e3
        print(json.dumps({"nx": nx, "variant": name,
                          "ms_per_cycle": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
