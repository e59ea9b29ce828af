"""Geometric-multigrid SIMPLE cavity (reference study 05 geo_multigrid).

Mirrors ``main_scripts/05 geo_multigrid/GS_vcycle.py``: red-black smoothing,
full-weighting restriction, V (or FMG) cycles, outer tolerance 1e-5.
"""

import time

from _common import parse, report, save_plots

import naviflow_tpu as nf
from naviflow_tpu.api import (
    MatrixFreeMomentumSolver,
    MultiGridSolver,
    SimpleSolver,
    StandardVelocityUpdater,
)


def main():
    args = parse(default_nx=63, default_re=100, cycle="v")
    mesh = nf.StructuredMesh(nx=args.nx, ny=args.nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=args.re)

    pressure = MultiGridSolver(tolerance=1e-2, max_iterations=8,
                               pre_smoothing=2, post_smoothing=2,
                               cycle_type=args.cycle, coarsest_grid_size=7)
    momentum = MatrixFreeMomentumSolver(tolerance=1e-6, max_iterations=25)
    algo = SimpleSolver(mesh, fluid, pressure, momentum, StandardVelocityUpdater(),
                        alpha_p=args.alpha_p, alpha_u=args.alpha_u)
    algo.set_boundary_condition("top", "velocity", {"u": 1.0})

    t0 = time.time()
    result = algo.solve(max_iterations=args.max_iterations,
                        tolerance=args.tolerance, save_profile=True,
                        profile_dir=args.outdir)
    report("multigrid", algo, result, t0)
    save_plots(f"multigrid_{args.nx}_Re{int(args.re)}", result, args.outdir)


if __name__ == "__main__":
    main()
