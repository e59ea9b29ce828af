"""Head-to-head timing of transfer-operator formulations on the TPU.

Round-2 profiling (benchmarks/profile_1024.py) measured the cell-centered
restrict+prolong pair at 0.82 ms at 1024^2 — 18 GB/s effective, ~40x off
roofline, dominating the V-cycle.  Reshape/interleave patterns force lane
(minor-dim) shuffles that Mosaic/XLA lower terribly.  Candidates:

* slice  — strided-slice sums / stack-reshape interleaves (current code)
* matmul — tensor-product R @ x @ R^T on the MXU (precision HIGHEST);
           O(n^3)-ish but the MXU is nearly free at moderate n
* tsand  — transpose sandwich: axis-0 (sublane) strided ops only, with two
           XLA transposes to cover axis 1

Usage: python benchmarks/transfer_variants.py [nx ...]
"""

import json
import os
import struct
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from naviflow_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

HI = jax.lax.Precision.HIGHEST


def chain(f, reps):
    return jax.jit(lambda x: jax.lax.fori_loop(0, reps, lambda i, y: f(y), x))


def timed(name, fn, x, reps):
    out = fn(x)
    out.block_until_ready()
    walls = []
    for _ in range(3):
        seed = struct.unpack("<I", os.urandom(4))[0]
        xx = x + jax.random.uniform(jax.random.PRNGKey(seed), (), x.dtype,
                                    0.0, 1e-12)
        float(jnp.sum(xx))
        t0 = time.perf_counter()
        out = fn(xx)
        float(jnp.sum(out))
        walls.append(time.perf_counter() - t0)
    ms = (min(walls) - 0.025) / reps * 1e3
    print(json.dumps({"variant": name, "nx": x.shape[0],
                      "ms_per_op": round(ms, 4)}))
    return ms


# ---- cell-centered restriction variants ---------------------------------

def r_reshape(x):
    m, n = x.shape[0] // 2, x.shape[1] // 2
    return x.reshape(m, 2, n, 2).mean(axis=(1, 3))


def r_slice(x):
    return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2]
                   + x[1::2, 1::2])


def _r1d(m, dtype):
    R = np.zeros((m, 2 * m), np.float64)
    R[np.arange(m), 2 * np.arange(m)] = 0.5
    R[np.arange(m), 2 * np.arange(m) + 1] = 0.5
    return jnp.asarray(R, dtype)


def r_matmul(x):
    m = x.shape[0] // 2
    R = _r1d(m, x.dtype)
    return jnp.dot(jnp.dot(R, x, precision=HI), R.T, precision=HI)


def r_tsand(x):
    def ax0(y):  # (2m, n) -> (m, n), sublane-strided only
        return 0.5 * (y[0::2] + y[1::2])
    return ax0(ax0(x).T).T


# ---- cell-centered prolongation variants --------------------------------

def _p_ax0_stack(c):
    up = jnp.concatenate([c[:1], c[:-1]], 0)
    dn = jnp.concatenate([c[1:], c[-1:]], 0)
    even = 0.75 * c + 0.25 * up
    odd = 0.75 * c + 0.25 * dn
    return jnp.stack([even, odd], axis=1).reshape(2 * c.shape[0], c.shape[1])


def p_stack(c):
    t = _p_ax0_stack(c)
    u = jnp.concatenate([t[:, :1], t[:, :-1]], 1)
    d = jnp.concatenate([t[:, 1:], t[:, -1:]], 1)
    even = 0.75 * t + 0.25 * u
    odd = 0.75 * t + 0.25 * d
    return jnp.stack([even, odd], axis=2).reshape(t.shape[0], 2 * t.shape[1])


def _p1d(m, dtype):
    P = np.zeros((2 * m, m), np.float64)
    I = np.arange(m)
    P[2 * I, I] += 0.75
    P[2 * I, np.maximum(I - 1, 0)] += 0.25
    P[2 * I + 1, I] += 0.75
    P[2 * I + 1, np.minimum(I + 1, m - 1)] += 0.25
    return jnp.asarray(P, dtype)


def p_matmul(c):
    P = _p1d(c.shape[0], c.dtype)
    return jnp.dot(jnp.dot(P, c, precision=HI), P.T, precision=HI)


def p_tsand(c):
    def ax0(y):
        return _p_ax0_stack(y)
    return ax0(ax0(c).T).T


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    for nx in sizes:
        seed = struct.unpack("<I", os.urandom(4))[0]
        x = jax.random.uniform(jax.random.PRNGKey(seed), (nx, nx),
                               jnp.float32)
        c = x[: nx // 2, : nx // 2]
        reps = 30
        # correctness cross-check once per size
        ref_r, ref_p = r_reshape(x), p_stack(c)
        for nm, f in [("r_slice", r_slice), ("r_matmul", r_matmul),
                      ("r_tsand", r_tsand)]:
            err = float(jnp.max(jnp.abs(f(x) - ref_r)))
            if err > 1e-5:
                print(json.dumps({"variant": nm, "nx": nx, "ERR": err}))
        for nm, f in [("p_matmul", p_matmul), ("p_tsand", p_tsand)]:
            err = float(jnp.max(jnp.abs(f(c) - ref_p)))
            if err > 1e-5:
                print(json.dumps({"variant": nm, "nx": nx, "ERR": err}))

        # restriction: chain keeps shape via prolong back (times the PAIR)
        for nm, rf, pf in [("pair_slice", r_slice, p_stack),
                           ("pair_reshape", r_reshape, p_stack),
                           ("pair_matmul", r_matmul, p_matmul),
                           ("pair_tsand", r_tsand, p_tsand)]:
            timed(nm, chain(lambda y, rf=rf, pf=pf: 0.5 * y + 0.5 * pf(rf(y)),
                            reps), x, reps)
        # isolate restriction alone: accumulate into a coarse carry
        for nm, rf in [("r_slice", r_slice), ("r_reshape", r_reshape),
                       ("r_matmul", r_matmul), ("r_tsand", r_tsand)]:
            f = jax.jit(lambda y, rf=rf: jax.lax.fori_loop(
                0, reps, lambda i, cacc: 0.5 * cacc + rf(y + cacc[0, 0]),
                jnp.zeros((y.shape[0] // 2, y.shape[1] // 2), y.dtype)))
            out = f(x)
            out.block_until_ready()
            walls = []
            for _ in range(3):
                s2 = struct.unpack("<I", os.urandom(4))[0]
                xx = x + jax.random.uniform(jax.random.PRNGKey(s2), (),
                                            x.dtype, 0.0, 1e-12)
                float(jnp.sum(xx))
                t0 = time.perf_counter()
                float(jnp.sum(f(xx)))
                walls.append(time.perf_counter() - t0)
            print(json.dumps({"variant": nm, "nx": nx, "ms_per_op": round(
                (min(walls) - 0.025) / reps * 1e3, 4)}))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
