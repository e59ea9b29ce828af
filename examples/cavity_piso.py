"""PISO with two pressure corrections (reference 01 basic_cavity/pisoBasic.py)."""

import time

from _common import parse, report, save_plots

import naviflow_tpu as nf
from naviflow_tpu.api import (
    AMGMomentumSolver,
    GaussSeidelSolver,
    PisoSolver,
    StandardVelocityUpdater,
)


def main():
    args = parse(default_nx=63, default_re=100)
    mesh = nf.StructuredMesh(nx=args.nx, ny=args.nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=args.re)
    algo = PisoSolver(mesh, fluid, GaussSeidelSolver(tolerance=1e-6),
                      AMGMomentumSolver(), StandardVelocityUpdater(),
                      alpha_p=args.alpha_p, alpha_u=args.alpha_u,
                      n_corrections=2)
    algo.set_boundary_condition("top", "velocity", {"u": 1.0})
    t0 = time.time()
    result = algo.solve(max_iterations=args.max_iterations, tolerance=args.tolerance)
    report("piso", algo, result, t0)
    save_plots(f"piso_{args.nx}_Re{int(args.re)}", result, args.outdir)


if __name__ == "__main__":
    main()
