"""Multigrid-preconditioned CG pressure solve (reference studies 06 AMG and
07 AMG_CG — algebraic multigrid replaced by the geometric hierarchy)."""

import time

from _common import parse, report, save_plots

import naviflow_tpu as nf
from naviflow_tpu.api import (
    GeoMultigridPrecondCGSolver,
    MatrixFreeMomentumSolver,
    SimpleSolver,
    StandardVelocityUpdater,
)


def main():
    args = parse(default_nx=127, default_re=1000)
    mesh = nf.StructuredMesh(nx=args.nx, ny=args.nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=args.re)
    algo = SimpleSolver(mesh, fluid,
                        GeoMultigridPrecondCGSolver(tolerance=1e-7, mg_cycles=1),
                        MatrixFreeMomentumSolver(tolerance=1e-6, max_iterations=40),
                        StandardVelocityUpdater(),
                        alpha_p=args.alpha_p, alpha_u=args.alpha_u)
    algo.set_boundary_condition("top", "velocity", {"u": 1.0})
    t0 = time.time()
    result = algo.solve(max_iterations=args.max_iterations, tolerance=args.tolerance)
    report("mgcg", algo, result, t0)
    save_plots(f"mgcg_{args.nx}_Re{int(args.re)}", result, args.outdir)


if __name__ == "__main__":
    main()
