"""Progressive-subtraction timing of the SIMPLE step phases at large grids.

Builds jitted programs that run chained reps of successive prefixes of the
step (assembly -> +momentum solve -> +residuals -> +pressure setup ->
full step minus cycles); differences attribute the per-iteration cost.

Usage: python benchmarks/profile_phases.py [nx]
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
from naviflow_tpu.core.bc import apply_velocity_bcs
from naviflow_tpu.ops.poisson import poisson_coefficients, pressure_rhs
from naviflow_tpu.ops.powerlaw import (
    d_coefficient,
    relax_coefficients,
    u_momentum_coefficients,
    v_momentum_coefficients,
)
from naviflow_tpu.ops.stencil9 import from_poisson
from naviflow_tpu.solvers.momentum import (
    _bicgstab_masked,
    _u_interior_mask,
    _v_interior_mask,
    _unrelaxed_residual,
)
from naviflow_tpu.solvers.velocity import update_velocity


def timeit(name, fn, args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    walls = []
    for _ in range(2):
        seed = struct.unpack("<I", os.urandom(4))[0]
        eps = jax.random.uniform(jax.random.PRNGKey(seed), (), jnp.float32,
                                 0.0, 1e-12)
        a2 = [a + eps if hasattr(a, "dtype") and a.dtype == jnp.float32
              else a for a in args]
        float(jnp.sum(a2[0]))
        t0 = time.perf_counter()
        out = fn(*a2)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        walls.append(time.perf_counter() - t0)
    ms = (min(walls) - 0.025) / reps * 1e3
    print(json.dumps({"phase": name, "ms": round(ms, 3)}))
    return ms


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=1000)
    bc = nf.lid_driven_cavity(1.0)
    dx, dy = mesh.get_cell_sizes()
    rho, mu = fluid.get_density(), fluid.get_viscosity()
    alpha = 0.7
    state = nf.initialize_state(mesh, bc)
    u, v, p = state.u, state.v, state.p
    reps = 20

    def chain(body):
        def outer(u, v, p):
            def it(i, carry):
                u, v, p = carry
                return body(u, v, p, 1e-12 * i)
            return jax.lax.fori_loop(0, reps, it, (u, v, p))
        return jax.jit(outer)

    # ---- phase 1: assembly only ------------------------------------------
    def p1(u, v, p, eps):
        ub, vb = apply_velocity_bcs(u, v, bc)
        cu = u_momentum_coefficients(ub, vb, p + eps, dx=dx, dy=dy, rho=rho, mu=mu)
        cv = v_momentum_coefficients(ub, vb, p + eps, dx=dx, dy=dy, rho=rho, mu=mu)
        cur = relax_coefficients(cu, ub, alpha)
        cvr = relax_coefficients(cv, vb, alpha)
        return cur.src * 1e-9 + u, cvr.src * 1e-9 + v, p

    t1 = timeit("assembly(u+v)+relax", chain(p1), (u, v, p), reps)

    # ---- phase 2: + momentum solves --------------------------------------
    def p2(u, v, p, eps):
        ub, vb = apply_velocity_bcs(u, v, bc)
        cu = u_momentum_coefficients(ub, vb, p + eps, dx=dx, dy=dy, rho=rho, mu=mu)
        cv = v_momentum_coefficients(ub, vb, p + eps, dx=dx, dy=dy, rho=rho, mu=mu)
        cur = relax_coefficients(cu, ub, alpha)
        cvr = relax_coefficients(cv, vb, alpha)
        us = _bicgstab_masked(ub, cur, _u_interior_mask(u.shape), 1e-6, 25)
        vs = _bicgstab_masked(vb, cvr, _v_interior_mask(v.shape), 1e-6, 25)
        return us, vs, p

    t2 = timeit("+bicgstab(u+v)", chain(p2), (u, v, p), reps)

    # ---- phase 3: + unrelaxed residuals ----------------------------------
    def p3(u, v, p, eps):
        us, vs, p = p2(u, v, p, eps)
        ub, vb = apply_velocity_bcs(u, v, bc)
        cu = u_momentum_coefficients(ub, vb, p, dx=dx, dy=dy, rho=rho, mu=mu)
        cv = v_momentum_coefficients(ub, vb, p, dx=dx, dy=dy, rho=rho, mu=mu)
        ru, un = _unrelaxed_residual(us, cu, is_u=True)
        rv, vn = _unrelaxed_residual(vs, cv, is_u=False)
        return us + un * 1e-20, vs + vn * 1e-20, p

    t3 = timeit("+unrelaxed_residuals(re-assembled)", chain(p3), (u, v, p), reps)

    # ---- phase 4: + pressure setup (rhs + poisson coeffs + fine stencil) --
    def p4(u, v, p, eps):
        ub, vb = apply_velocity_bcs(u, v, bc)
        cu = u_momentum_coefficients(ub, vb, p + eps, dx=dx, dy=dy, rho=rho, mu=mu)
        cv = v_momentum_coefficients(ub, vb, p + eps, dx=dx, dy=dy, rho=rho, mu=mu)
        cur = relax_coefficients(cu, ub, alpha)
        cvr = relax_coefficients(cv, vb, alpha)
        us = _bicgstab_masked(ub, cur, _u_interior_mask(u.shape), 1e-6, 25)
        vs = _bicgstab_masked(vb, cvr, _v_interior_mask(v.shape), 1e-6, 25)
        d_u = d_coefficient(cur.a_p, dy, is_u=True)
        d_v = d_coefficient(cvr.a_p, dx, is_u=False)
        b = pressure_rhs(us, vs, dx=dx, dy=dy, rho=rho, pin=False)
        pc = poisson_coefficients(d_u, d_v, dx=dx, dy=dy, rho=rho,
                                  variant="consistent")
        st = from_poisson(pc)
        pp = jnp.zeros_like(p)
        un, vn = update_velocity(us, vs, pp, d_u, d_v, bc)
        scal = (jnp.sum(st.c) + jnp.sum(b)) * 1e-30
        return un + scal, vn, p

    t4 = timeit("+pressure_setup+velocity_update", chain(p4), (u, v, p), reps)

    # ---- phase 5: the REAL step body chained (max_cycles=0), no harness --
    from naviflow_tpu.algorithms.simple import SIMPLEConfig, make_simple_step
    from naviflow_tpu.algorithms.lagged import make_lagged_mg
    from naviflow_tpu.solvers import KrylovMomentumConfig
    from naviflow_tpu.solvers.multigrid import MultigridConfig

    mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=25)
    pres0 = MultigridConfig(tolerance=1e30, max_cycles=0, check_every=1,
                            coarsest_sweeps=1, coarse_rebuild_every=8)
    step0 = make_simple_step(dx=dx, dy=dy, rho=rho, mu=mu, bc=bc,
                             cfg=SIMPLEConfig(), mom_cfg=mom, pres_cfg=pres0)
    _, _, extra0 = make_lagged_mg(pres0, dx=dx, dy=dy, rho=rho,
                                  variant="consistent")
    ex0 = (jnp.asarray(0.0, jnp.float32), extra0(jnp.float32, nx, nx))

    def real_chain(u, v, p, ex):
        def it(i, carry):
            u, v, p, ex = carry
            u, v, p, ex, info = step0(u, v, p, ex)
            return (u, v, p, ex)
        return jax.lax.fori_loop(0, reps, it, (u, v, p, ex))

    t5 = timeit("real_step_body_nocycles", jax.jit(real_chain),
                (u, v, p, ex0), reps)

    # ---- phase 6: same but with full 8-cycle pressure --------------------
    pres8 = MultigridConfig(tolerance=1e-2, max_cycles=8, check_every=2,
                            coarsest_sweeps=32, coarse_rebuild_every=8)
    step8 = make_simple_step(dx=dx, dy=dy, rho=rho, mu=mu, bc=bc,
                             cfg=SIMPLEConfig(), mom_cfg=mom, pres_cfg=pres8)
    _, _, extra8 = make_lagged_mg(pres8, dx=dx, dy=dy, rho=rho,
                                  variant="consistent")
    ex8 = (jnp.asarray(0.0, jnp.float32), extra8(jnp.float32, nx, nx))

    def real_chain8(u, v, p, ex):
        def it(i, carry):
            u, v, p, ex = carry
            u, v, p, ex, info = step8(u, v, p, ex)
            return (u, v, p, ex)
        return jax.lax.fori_loop(0, reps, it, (u, v, p, ex))

    t6 = timeit("real_step_body_8cycles", jax.jit(real_chain8),
                (u, v, p, ex8), reps)

    print(json.dumps({"phase": "deltas", "assembly": round(t1, 3),
                      "bicgstab": round(t2 - t1, 3),
                      "residuals": round(t3 - t2, 3),
                      "psetup": round(t4 - t2, 3),
                      "step_body_extra": round(t5 - t4 - (t3 - t2), 3),
                      "cycles": round(t6 - t5, 3)}))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
