"""Red-black Gauss-Seidel pressure solve (reference study 04 gauss_seidel)."""

import time

from _common import parse, report, save_plots

import naviflow_tpu as nf
from naviflow_tpu.api import (
    AMGMomentumSolver,
    GaussSeidelSolver,
    SimpleSolver,
    StandardVelocityUpdater,
)


def main():
    args = parse(default_nx=63, default_re=400)
    mesh = nf.StructuredMesh(nx=args.nx, ny=args.nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=args.re)
    algo = SimpleSolver(mesh, fluid,
                        GaussSeidelSolver(tolerance=1e-6, omega=1.5),
                        AMGMomentumSolver(), StandardVelocityUpdater(),
                        alpha_p=args.alpha_p, alpha_u=args.alpha_u)
    algo.set_boundary_condition("top", "velocity", {"u": 1.0})
    t0 = time.time()
    result = algo.solve(max_iterations=args.max_iterations, tolerance=args.tolerance)
    report("gauss_seidel", algo, result, t0)
    save_plots(f"gs_{args.nx}_Re{int(args.re)}", result, args.outdir)


if __name__ == "__main__":
    main()
