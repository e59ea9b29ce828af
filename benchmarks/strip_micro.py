"""Standalone strip-kernel vs XLA fine-level microbench (down+up pair)."""
import json, os, struct, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from naviflow_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp, numpy as np
import naviflow_tpu as nf
from naviflow_tpu.ops.poisson import poisson_coefficients
from naviflow_tpu.ops.stencil9 import apply5, from_poisson
from naviflow_tpu.ops.transfer_cc import prolong_cc, restrict_cc
from naviflow_tpu.ops.pallas_strip import strip_down, strip_up, _strip_rows
from naviflow_tpu.solvers.multigrid import MultigridConfig, _smooth

def bench(nx, reps=50):
    rng = np.random.default_rng(0)
    d_u = jnp.asarray(rng.uniform(0.5,1.5,(nx+1,nx)), jnp.float32)
    d_v = jnp.asarray(rng.uniform(0.5,1.5,(nx,nx+1)), jnp.float32)
    pc = poisson_coefficients(d_u, d_v, dx=1.0/nx, dy=1.0/nx, rho=1.0, variant="consistent")
    st = from_poisson(pc)
    p = jnp.asarray(rng.normal(size=(nx,nx)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(nx,nx)), jnp.float32)
    cfg = MultigridConfig(pre_smoothing=2, post_smoothing=2, smoother="gs")

    def chain(fn):
        def run(p, b):
            def body(i, q):
                return fn(q, b)
            return jax.lax.fori_loop(0, reps, body, p)
        return jax.jit(run)

    def strip_pair(q, b):
        x, rc = strip_down(q, b, st, cfg)
        return strip_up(x, b, st, rc, cfg)

    def xla_pair(q, b):
        x = _smooth(q, b, st, cfg, 2, True, None)
        rc = restrict_cc(b - apply5(x, st))
        x = x + prolong_cc(rc)
        return _smooth(x, b, st, cfg, 2, True, None)

    for name, fn in (("strip", strip_pair), ("xla", xla_pair)):
        f = chain(fn)
        out = f(p, b); jax.block_until_ready(out)
        walls = []
        for _ in range(2):
            seed = struct.unpack("<I", os.urandom(4))[0]
            p2 = p + jax.random.uniform(jax.random.PRNGKey(seed), (), jnp.float32, 0, 1e-9)
            float(jnp.sum(p2))
            t0 = time.perf_counter()
            out = f(p2, b)
            float(jnp.sum(out))
            walls.append(time.perf_counter() - t0)
        ms = (min(walls) - 0.025) / reps * 1e3
        print(json.dumps({"nx": nx, "kind": name, "T": _strip_rows(nx, nx),
                          "ms_per_pair": round(ms, 4)}), flush=True)

if __name__ == "__main__":
    import warnings; warnings.filterwarnings("ignore")
    for nx in (int(sys.argv[1]),) if len(sys.argv) > 1 else (512, 1024):
        bench(nx)
