"""Spatially decomposed cavity over a device mesh (new capability — the
reference is single-process only, SURVEY §2.3).

On a machine without multiple accelerators, run with:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/distributed_cavity.py
"""

import time

import jax

from _common import parse

import naviflow_tpu as nf
from naviflow_tpu.parallel.dist_simple import (
    DistributedConfig,
    distributed_simple_solve,
)
from naviflow_tpu.parallel.sharding import make_device_mesh
from naviflow_tpu.postprocessing.validation import validate_against_benchmark


def main():
    args = parse(default_nx=64, default_re=100, default_tol=1e-4)
    n_dev = len(jax.devices())
    dmesh = make_device_mesh(n_dev)
    print(f"devices: {n_dev}, mesh {dict(dmesh.shape)}")

    mesh = nf.StructuredMesh(nx=args.nx, ny=args.nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=args.re)
    bc = nf.lid_driven_cavity(1.0)
    state = nf.initialize_state(mesh, bc)

    t0 = time.time()
    final, diag = distributed_simple_solve(
        mesh, fluid, bc, state, dmesh,
        DistributedConfig(max_iterations=args.max_iterations,
                          tolerance=args.tolerance,
                          alpha_p=args.alpha_p, alpha_u=args.alpha_u),
    )
    print(f"iters={diag['iterations']} converged={diag['converged']} "
          f"residual={diag['final_residual']:.2e} wall={time.time() - t0:.1f}s")
    print(validate_against_benchmark(final.u, final.v, mesh, args.re))


if __name__ == "__main__":
    main()
