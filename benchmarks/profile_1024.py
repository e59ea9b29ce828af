"""Component-level cost profile of the SIMPLE step at large grids (default
1024^2) on the real TPU.

Motivated by the round-2 verdict: measured 14.89 ms/iter at 1024^2 vs a
~1.5 ms HBM roofline — this script attributes the gap per component so the
bandwidth-regime optimization (round 3 item #1) attacks the right op.

Timing discipline per CLAUDE.md: chained fori_loop reps inside one jitted
program (the tunnel memoizes identical executions; chaining creates data
dependence), wall clocked through a host value fetch, fresh-perturbed
inputs per call.  Every op row reports ms/op and the implied HBM GB/s from
a byte-count model (reads+writes of touched arrays).

Usage: python benchmarks/profile_1024.py [nx]
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
from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
from naviflow_tpu.ops.poisson import poisson_coefficients, pressure_rhs
from naviflow_tpu.ops.stencil9 import apply9, gs4_sweep
from naviflow_tpu.ops.transfer_cc import prolong_cc, restrict_cc
from naviflow_tpu.solvers import KrylovMomentumConfig
from naviflow_tpu.solvers.momentum import (
    _bicgstab_masked,
    _relax,
    _u_interior_mask,
    solve_u_momentum,
)
from naviflow_tpu.ops.powerlaw import u_momentum_coefficients
from naviflow_tpu.solvers.multigrid import (
    MultigridConfig,
    _cycle,
    _rb2_sweep,
    build_levels,
    multigrid_solve,
)

MB = lambda a: a.size * a.dtype.itemsize / 1e6


def timed(name, fn, *args, reps=1, bytes_per_op=None):
    """fn is already jitted and internally chains `reps` applications."""
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    walls = []
    for _ in range(2):
        seed = struct.unpack("<I", os.urandom(4))[0]
        eps = jax.random.uniform(jax.random.PRNGKey(seed), (), jnp.float32,
                                 0.0, 1e-12)
        t0 = time.perf_counter()
        out = fn(*[a + eps if hasattr(a, "dtype") and a.dtype == jnp.float32
                   and a.ndim == 2 else a for a in args])
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf) if hasattr(leaf, "shape") and leaf.ndim else leaf)
        walls.append(time.perf_counter() - t0)
    wall = min(walls) - 0.025  # ~25 ms host-fetch overhead (CLAUDE.md)
    ms = max(wall, 1e-9) / reps * 1e3
    row = {"component": name, "ms_per_op": round(ms, 4), "reps": reps}
    if bytes_per_op:
        row["model_MB"] = round(bytes_per_op / 1e6, 1)
        row["implied_GBps"] = round(bytes_per_op / (ms * 1e-3) / 1e9, 1)
    print(json.dumps(row))
    return ms


def chain(f, reps):
    return jax.jit(lambda x, *a: jax.lax.fori_loop(
        0, reps, lambda i, y: f(y, *a), x))


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    re_ = 1000.0
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=re_)
    bc = nf.lid_driven_cavity(1.0)
    dx, dy = mesh.get_cell_sizes()
    rho, mu = fluid.get_density(), fluid.get_viscosity()
    fsz = nx * nx * 4  # f32 field bytes

    mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=25)
    pres = MultigridConfig(tolerance=1e-2, max_cycles=8, cycle_type="v",
                           check_every=2, coarsest_sweeps=32,
                           coarse_rebuild_every=8)

    # ---- realistic state: 30 SIMPLE iterations from rest -----------------
    state0 = nf.initialize_state(mesh, bc)
    seed = struct.unpack("<I", os.urandom(4))[0]
    state0 = state0.replace(p=state0.p + jax.random.uniform(
        jax.random.PRNGKey(seed), mesh.p_shape, jnp.float32, 0.0, 1e-7))
    warm_cfg = SIMPLEConfig(max_iterations=30, tolerance=0.0)
    state, diag = simple_solve(mesh, fluid, bc, state0, warm_cfg,
                               momentum=mom, pressure=pres, loop="fused")
    u, v, p = state.u, state.v, state.p
    print(json.dumps({"component": "state_prep", "outer_iters": 30,
                      "residual": float(diag.final_residual)}))

    # assembled operators at this state
    u_bc, v_bc = nf.core.bc.apply_velocity_bcs(u, v, bc)
    c_un = u_momentum_coefficients(u_bc, v_bc, p, dx=dx, dy=dy, rho=rho, mu=mu)
    c_rel = _relax(c_un, u_bc, 0.7)
    d_u = nf.ops.powerlaw.d_coefficient(c_rel.a_p, dy, is_u=True)
    # v-side quickly via full momentum solve (also gives d_v)
    _, d_v, _, _ = nf.solvers.momentum.solve_v_momentum(
        u, v, p, dx=dx, dy=dy, rho=rho, mu=mu, alpha=0.7, bc=bc, cfg=mom)
    b = pressure_rhs(u, v, dx=dx, dy=dy, rho=rho, pin=False)
    levels = build_levels(d_u, d_v, pres, dx=dx, dy=dy, rho=rho,
                          variant="consistent")
    st = levels[0][0]
    print(json.dumps({"component": "hierarchy",
                      "levels": [list(map(int, L[1])) for L in levels]}))

    # ---- real solve cycle counts ----------------------------------------
    pp, pinfo = jax.jit(lambda b, p: multigrid_solve(
        b, d_u, d_v, jnp.zeros_like(p), pres, dx=dx, dy=dy, rho=rho,
        levels=levels))(b, p)
    print(json.dumps({"component": "mg_solve_real",
                      "cycles": int(pinfo.iterations),
                      "rel_residual": float(pinfo.rel_residual)}))

    # BiCGSTAB iteration count at this state (counting clone)
    mask = _u_interior_mask(u.shape)

    def count_bicg(x0):
        mask_f = mask.astype(x0.dtype)
        A = lambda x: nf.solvers.momentum._apply(x, c_rel) * mask_f
        bb = c_rel.src * mask_f
        r0 = bb - A(x0 * mask_f)
        tol2 = (1e-6 * jnp.maximum(jnp.sqrt(jnp.sum(bb * bb)), 1e-30)) ** 2
        def cond(c):
            x, r, rh, rho_, al, om, vv, pp_, k = c
            return (k < 25) & (jnp.sum(r * r) > tol2)
        def body(c):
            x, r, rh, rho_, al, om, vv, pp_, k = c
            rho_n = jnp.sum(rh * r)
            beta = (rho_n / rho_) * (al / om)
            pp_ = r + beta * (pp_ - om * vv)
            vv = A(pp_)
            al = rho_n / jnp.sum(rh * vv)
            s = r - al * vv
            t = A(s)
            om = jnp.sum(t * s) / jnp.maximum(jnp.sum(t * t), 1e-30)
            return (x + al * pp_ + om * s, s - om * t, rh, rho_n, al, om, vv,
                    pp_, k + 1)
        one = jnp.asarray(1.0, x0.dtype)
        c = (x0 * mask_f, r0, r0, one, one, one, jnp.zeros_like(x0),
             jnp.zeros_like(x0), jnp.asarray(0, jnp.int32))
        return jax.lax.while_loop(cond, body, c)[-1]

    k = int(jax.jit(count_bicg)(u_bc))
    print(json.dumps({"component": "momentum_bicgstab_iters", "iters": k}))

    # ---- op-level timings ------------------------------------------------
    # apply9 with the embedded 5-point stencil (4 zero corner arrays still
    # read): model = 9 coeffs + x read + write
    timed("apply9_fine", chain(lambda x: apply9(x, st) * 1e-2, 50), p,
          reps=50, bytes_per_op=11 * fsz)
    timed("rb2_sweep_fine(apply9 x2)",
          chain(lambda x: _rb2_sweep(x, b, st, 1.0), 50), p,
          reps=50, bytes_per_op=2 * 12 * fsz)

    # specialized 5-point half-sweep candidate: reads c,e,w,n,s,b,p writes p
    from naviflow_tpu.ops.stencil import shift_e, shift_n, shift_s, shift_w

    def rb5_sweep(pp_):
        ii = jax.lax.broadcasted_iota(jnp.int32, pp_.shape, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, pp_.shape, 1)
        red = (ii + jj) % 2 == 0
        inv_c = 1.0 / st.c
        def half(q, color):
            off = (st.e * shift_e(q) + st.w * shift_w(q)
                   + st.n * shift_n(q) + st.s * shift_s(q))
            return jnp.where(color, (b - off) * inv_c, q)
        return half(half(pp_, red), jnp.logical_not(red))

    timed("rb5_sweep_fine(specialized)", chain(rb5_sweep, 50), p,
          reps=50, bytes_per_op=2 * 8 * fsz)

    timed("residual_fine(b-apply9)",
          chain(lambda x: (b - apply9(x, st)) * 1e-2, 50), p,
          reps=50, bytes_per_op=12 * fsz)
    timed("restrict+prolong_cc",
          chain(lambda x: x + 1e-30 * prolong_cc(restrict_cc(x)), 50), p,
          reps=50, bytes_per_op=int(3.5 * fsz))
    timed("vcycle_full", chain(lambda x: _cycle(x, b, levels, 0, pres), 10),
          p, reps=10,
          bytes_per_op=int((2 * 2 * 12 + 12 + 3.5) * fsz * 1.36))
    timed("assembly_u_powerlaw",
          chain(lambda x: u_momentum_coefficients(
              x, v_bc, p, dx=dx, dy=dy, rho=rho, mu=mu).a_e, 20), u_bc,
          reps=20, bytes_per_op=9 * fsz)
    timed("bicgstab_momentum_full(tol1e-6)",
          chain(lambda x: _bicgstab_masked(x, c_rel, mask, 1e-6, 25), 10),
          u_bc, reps=10, bytes_per_op=k * 2 * 8 * fsz)

    # full fused SIMPLE steps (the bench number)
    cfg30 = SIMPLEConfig(max_iterations=30, tolerance=0.0)
    fullstep = lambda s: simple_solve(mesh, fluid, bc, s, cfg30,
                                      momentum=mom, pressure=pres,
                                      loop="fused")
    fullstep(state)  # compile
    seed = struct.unpack("<I", os.urandom(4))[0]
    s2 = state.replace(p=state.p + jax.random.uniform(
        jax.random.PRNGKey(seed), mesh.p_shape, jnp.float32, 0.0, 1e-9))
    float(jnp.sum(s2.p))
    t0 = time.perf_counter()
    _, dg = fullstep(s2)
    float(dg.final_residual)
    wall = time.perf_counter() - t0
    print(json.dumps({"component": "full_simple_step",
                      "ms_per_op": round(wall / 30 * 1e3, 3), "reps": 30}))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
