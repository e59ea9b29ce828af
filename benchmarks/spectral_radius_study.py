"""Offline smoother-damping study: spectral radius vs omega, with artifacts.

Parity with the reference's offline tuning study
(``/root/reference/naviflow_oo/solver/pressure_solver/helpers/
spectral_radius_damping.py`` + its SR_*.pdf outputs): power-iteration
estimates of the smoother iteration-matrix spectral radius over an omega
grid, for damped Jacobi and red-black SOR, on *realistic* pressure-system
coefficients (d-fields taken from a short SIMPLE warm-up, not model
constants).  Writes one JSONL row per (smoother, omega) to
``SR_STUDY.jsonl`` and the omega-sweep plot to ``SR_damping_study.pdf``.

Usage:  python benchmarks/spectral_radius_study.py [nx]   (default 63)

The production counterpart is ``solvers/chebyshev.optimal_jacobi_omega``
(closed-form from the power-iterated lambda_max) — this script is the
measured justification artifact, the thing the reference kept as PDFs.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import naviflow_tpu as nf
from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
from naviflow_tpu.core.bc import apply_velocity_bcs
from naviflow_tpu.ops.powerlaw import (d_coefficient, relax_coefficients,
                                       u_momentum_coefficients,
                                       v_momentum_coefficients)
from naviflow_tpu.solvers.chebyshev import (estimate_lambda_max,
                                            optimal_jacobi_omega)
from naviflow_tpu.solvers.multigrid import MultigridConfig, _rb2_sweep, build_levels


def _realistic_stencil(nx):
    """Fine-level pressure stencil from a 60-iteration SIMPLE warm-up."""
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=100.0)
    bc = nf.lid_driven_cavity(1.0)
    st = nf.initialize_state(mesh, bc)
    st, _ = simple_solve(mesh, fluid, bc, st,
                         SIMPLEConfig(max_iterations=60, tolerance=0.0))
    dx, dy = mesh.get_cell_sizes()
    u, v = apply_velocity_bcs(st.u, st.v, bc)
    cu = relax_coefficients(
        u_momentum_coefficients(u, v, st.p, dx=dx, dy=dy, rho=1.0, mu=1e-2),
        u, 0.7)
    cv = relax_coefficients(
        v_momentum_coefficients(u, v, st.p, dx=dx, dy=dy, rho=1.0, mu=1e-2),
        v, 0.7)
    d_u = d_coefficient(cu.a_p, dy, is_u=True)
    d_v = d_coefficient(cv.a_p, dx, is_u=False)
    levels = build_levels(d_u, d_v, MultigridConfig(), dx=dx, dy=dy, rho=1.0,
                          variant="consistent")
    return levels[0][0], (nx, nx)


def _deflated_radius(step, shape, dtype, iterations=60, seed=3):
    """Power iteration on an error propagator with the constant mode
    projected out each application.  The consistent pressure operator is
    singular (A 1 = 0 in the interior), so every smoother's iteration
    matrix has eigenvalue exactly 1 on the constant — but the MG solves
    live in the zero-mean complement, and the radius ON THAT COMPLEMENT is
    the quantity the reference's omega study actually tunes."""
    x = jax.random.normal(jax.random.PRNGKey(seed), shape, dtype)
    x = x - jnp.mean(x)
    x = x / jnp.linalg.norm(x)

    def body(_, carry):
        x, rho = carry
        y = step(x)
        y = y - jnp.mean(y)
        rho = jnp.linalg.norm(y)
        return (y / jnp.maximum(rho, 1e-30), rho)

    _, rho = jax.lax.fori_loop(0, iterations, body,
                               (x, jnp.asarray(1.0, dtype)))
    return float(rho)


def jacobi_spectral_radius(st, shape, omega, **kw):
    from naviflow_tpu.ops.stencil9 import apply9, stencil9_diagonal

    inv_d = 1.0 / stencil9_diagonal(st)
    return _deflated_radius(lambda x: x - omega * inv_d * apply9(x, st),
                            shape, st.c.dtype, **kw)


def rbgs_spectral_radius(st, shape, omega, **kw):
    """Red-black SOR error propagator (b = 0), constant mode deflated."""
    zero = jnp.zeros(shape, st.c.dtype)
    return _deflated_radius(lambda x: _rb2_sweep(x, zero, st, omega),
                            shape, st.c.dtype, **kw)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 63
    st, shape = _realistic_stencil(nx)
    here = os.path.dirname(os.path.abspath(__file__))

    lam_max = float(estimate_lambda_max(st, shape))
    omega_star = float(optimal_jacobi_omega(lam_max))
    omegas = [round(0.4 + 0.1 * i, 2) for i in range(16)]  # 0.4 .. 1.9 (SOR optimum ~ 2/(1+sin pi h))
    rows = []
    for om in omegas:
        rows.append({
            "nx": nx, "omega": om,
            "jacobi_rho": jacobi_spectral_radius(st, shape, om),
            "rbgs_rho": rbgs_spectral_radius(st, shape, om),
        })
    with open(os.path.join(here, "SR_STUDY.jsonl"), "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    best_j = min(rows, key=lambda r: r["jacobi_rho"])
    best_g = min(rows, key=lambda r: r["rbgs_rho"])
    summary = {
        "nx": nx, "lambda_max": round(lam_max, 5),
        "jacobi_omega_closed_form": round(omega_star, 4),
        "jacobi_omega_measured": best_j["omega"],
        "jacobi_rho_at_best": round(best_j["jacobi_rho"], 5),
        "rbgs_omega_measured": best_g["omega"],
        "rbgs_rho_at_best": round(best_g["rbgs_rho"], 5),
    }
    print(json.dumps(summary))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4.2))
    ax.plot([r["omega"] for r in rows], [r["jacobi_rho"] for r in rows],
            "o-", label="damped Jacobi")
    ax.plot([r["omega"] for r in rows], [r["rbgs_rho"] for r in rows],
            "s-", label="red-black SOR")
    ax.axvline(omega_star, ls="--", c="gray",
               label=f"closed-form Jacobi ω*={omega_star:.3f}")
    ax.set_xlabel("omega"), ax.set_ylabel("spectral radius (power iter.)")
    ax.set_title(f"Smoother damping study, {nx}x{nx} realistic coefficients")
    ax.legend(fontsize=8), ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(here, f"SR_damping_study_{nx}.pdf"))
    print(f"wrote SR_damping_study_{nx}.pdf")


if __name__ == "__main__":
    main()
