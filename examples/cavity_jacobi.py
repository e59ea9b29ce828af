"""Jacobi-pressure SIMPLE cavity (reference study 03 jacobi).

Mirrors ``main_scripts/03 jacobi/jacobi_cavity_steady_oo.py``: weighted
Jacobi (omega=0.8) pressure solve + Krylov momentum, 63^2, Re=100,
alpha_p=0.1, alpha_u=0.8, outer tolerance 1e-3.
"""

import time

from _common import parse, report, save_plots

import naviflow_tpu as nf
from naviflow_tpu.api import (
    AMGMomentumSolver,
    JacobiSolver,
    SimpleSolver,
    StandardVelocityUpdater,
)


def main():
    args = parse(default_nx=63, default_re=100, default_tol=1e-3)
    mesh = nf.StructuredMesh(nx=args.nx, ny=args.nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=args.re,
                               characteristic_velocity=1.0)
    print(f"Created mesh with {args.nx}x{args.nx} cells; "
          f"dx={mesh.dx:.6f}, viscosity={fluid.get_viscosity():.6f}")

    pressure = JacobiSolver(tolerance=1e-5, max_iterations=10000, omega=0.8)
    momentum = AMGMomentumSolver(tolerance=1e-5, max_iterations=100)
    algo = SimpleSolver(mesh, fluid, pressure, momentum, StandardVelocityUpdater(),
                        alpha_p=0.1, alpha_u=0.8)
    algo.set_boundary_condition("top", "velocity", {"u": 1.0})

    t0 = time.time()
    result = algo.solve(max_iterations=args.max_iterations,
                        tolerance=args.tolerance, track_infinity_norm=True,
                        save_profile=True, profile_dir=args.outdir)
    report("jacobi", algo, result, t0)
    save_plots(f"jacobi_{args.nx}_Re{int(args.re)}", result, args.outdir)


if __name__ == "__main__":
    main()
