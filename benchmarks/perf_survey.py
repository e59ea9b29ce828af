"""Comprehensive chained-timing survey on the real TPU.

Runs once in the background (first run pays the compile tax; all programs
land in the persistent cache).  Chained calls (output feeds input) force
serial device execution, so per-call numbers are honest.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from naviflow_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import naviflow_tpu as nf
from naviflow_tpu.algorithms.simple import SIMPLEConfig, make_simple_step
from naviflow_tpu.solvers import KrylovMomentumConfig, JacobiMomentumConfig
from naviflow_tpu.solvers.multigrid import MultigridConfig


def chain(name, f, x0, n=60):
    x = f(x0)
    jax.block_until_ready(jax.tree_util.tree_leaves(x)[0])
    t0 = time.time()
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(jax.tree_util.tree_leaves(x)[0])
    t1 = time.time()
    print(f"{name}: {1000 * (t1 - t0) / n:.2f} ms/call", flush=True)
    return x


def step_carry_fn(nx, mom_cfg, pres_cfg, cfg=SIMPLEConfig()):
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
    bc = nf.lid_driven_cavity(1.0)
    st = nf.initialize_state(mesh, bc)
    dx, dy = mesh.get_cell_sizes()
    step = make_simple_step(dx=dx, dy=dy, rho=1.0, mu=fluid.viscosity, bc=bc,
                            cfg=cfg, mom_cfg=mom_cfg, pres_cfg=pres_cfg)

    @jax.jit
    def one(carry):
        u, v, p, pm = carry
        u, v, p, pm, info = step(u, v, p, pm)
        return (u, v, p, pm)

    return one, (st.u, st.v, st.p, jnp.asarray(0.0, jnp.float32))


MG = MultigridConfig(tolerance=1e-3, max_cycles=20, cycle_type="v")
MG_CHEAP = MultigridConfig(tolerance=1e-2, max_cycles=8, cycle_type="v",
                           check_every=2, coarsest_sweeps=32)
BI = KrylovMomentumConfig(tolerance=1e-6, max_iterations=40)
BI_SHORT = KrylovMomentumConfig(tolerance=1e-4, max_iterations=12)
JA = JacobiMomentumConfig(n_sweeps=2)

for nx in (63, 127, 255):
    f, c0 = step_carry_fn(nx, BI, MG)
    chain(f"step nx={nx} bicgstab40+MG(20c)", f, c0)

f, c0 = step_carry_fn(63, JA, MG_CHEAP)
chain("step nx=63 jacobi2+MGcheap", f, c0)
f, c0 = step_carry_fn(63, BI_SHORT, MG_CHEAP)
chain("step nx=63 bicgstab12+MGcheap", f, c0)

# fori-chunk of 4 steps in one program (compile-cost probe)
f, c0 = step_carry_fn(63, BI_SHORT, MG_CHEAP)


def make_chunk(nx, k):
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
    bc = nf.lid_driven_cavity(1.0)
    st = nf.initialize_state(mesh, bc)
    dx, dy = mesh.get_cell_sizes()
    step = make_simple_step(dx=dx, dy=dy, rho=1.0, mu=fluid.viscosity, bc=bc,
                            cfg=SIMPLEConfig(), mom_cfg=BI_SHORT, pres_cfg=MG_CHEAP)

    @jax.jit
    def chunk(carry):
        def body(_, carry):
            u, v, p, pm = carry
            u, v, p, pm, info = step(u, v, p, pm)
            return (u, v, p, pm)
        return jax.lax.fori_loop(0, k, body, carry)

    return chunk, (st.u, st.v, st.p, jnp.asarray(0.0, jnp.float32))


print("compiling fori-chunk(4)...", flush=True)
t0 = time.time()
chunkf, cc0 = make_chunk(63, 4)
out = chunkf(cc0)
jax.block_until_ready(out[0])
print(f"fori-chunk(4) compile+first: {time.time() - t0:.0f}s", flush=True)
chain("chunk(4) nx=63 (per chunk)", chunkf, cc0, n=30)
print("survey done", flush=True)
