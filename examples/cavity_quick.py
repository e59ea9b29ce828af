"""QUICK vs power-law accuracy study on a coarse grid."""

import time

from _common import parse, report

import naviflow_tpu as nf
from naviflow_tpu.api import (
    GaussSeidelSolver,
    MatrixFreeMomentumSolver,
    SimpleSolver,
    StandardVelocityUpdater,
)


def main():
    args = parse(default_nx=31, default_re=400)
    mesh = nf.StructuredMesh(nx=args.nx, ny=args.nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=args.re)
    for scheme in ("power_law", "quick"):
        algo = SimpleSolver(
            mesh, fluid, GaussSeidelSolver(tolerance=1e-7),
            MatrixFreeMomentumSolver(tolerance=1e-8, max_iterations=120,
                                     discretization_scheme=scheme),
            StandardVelocityUpdater(),
            alpha_p=args.alpha_p, alpha_u=args.alpha_u,
        )
        algo.set_boundary_condition("top", "velocity", {"u": 1.0})
        t0 = time.time()
        result = algo.solve(max_iterations=args.max_iterations,
                            tolerance=args.tolerance)
        report(scheme, algo, result, t0)


if __name__ == "__main__":
    main()
