"""On-hardware parity check for the temporal-blocking strip kernels
(``ops/pallas_strip.py``): converge a 512^2 cavity — a grid where the
peeled V-cycle uses strip kernels on the fine level — with
``backend='auto'`` (strips) and ``backend='xla'``, and compare outer
iteration counts.  The strip path is ULP-equivalent, so the counts must
agree (same gate as bench.py's 63^2 fused-step numerics row, which cannot
exercise strips).

Usage: python benchmarks/strip_parity_check.py [nx]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from naviflow_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import naviflow_tpu as nf
from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
from naviflow_tpu.solvers import KrylovMomentumConfig
from naviflow_tpu.solvers.multigrid import MultigridConfig


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=100)
    bc = nf.lid_driven_cavity(1.0)
    cfg = SIMPLEConfig(max_iterations=6000, tolerance=1e-5)
    mom = KrylovMomentumConfig(tolerance=1e-6, max_iterations=25)
    out = {}
    for backend in ("auto", "xla"):
        pres = MultigridConfig(tolerance=1e-2, max_cycles=8, check_every=2,
                               coarsest_sweeps=32, coarse_rebuild_every=8,
                               backend=backend)
        st = nf.initialize_state(mesh, bc)
        t0 = time.time()
        _, diag = simple_solve(mesh, fluid, bc, st, cfg, momentum=mom,
                               pressure=pres, loop="chunked:400")
        out[backend] = dict(converged=bool(diag.converged),
                            iters=int(diag.iterations),
                            residual=float(diag.final_residual),
                            wall_s=round(time.time() - t0, 1))
        print(json.dumps({"backend": backend, **out[backend]}), flush=True)
    # parity = identical iteration trajectories: same iteration count AND
    # matching final residuals (a direct 512^2 solve from rest may not
    # converge inside the budget — that is fine; agreement is the check.
    # Measured 2026-08: residuals 7.343981e-5 vs 7.343882e-5 after 6000
    # iterations, rel diff 1.3e-5 — strip path is ULP-equivalent.)
    drift = abs(out["auto"]["iters"] - out["xla"]["iters"])
    rres = abs(out["auto"]["residual"] - out["xla"]["residual"]) / max(
        out["xla"]["residual"], 1e-30)
    ok = drift <= max(2, out["xla"]["iters"] // 20) and rres < 1e-3
    print(json.dumps({"strip_parity_ok": ok, "iter_drift": drift,
                      "residual_rel_diff": rres}))

    # Phase 2: the PLANE-resident fine level (ops/pallas_plane.py) —
    # force fine_layout='plane' (auto resolves to interleaved at every
    # size since the round-4 in-step shootout, solvers/multigrid.py, so
    # plane must always be forced explicitly) and compare the plane
    # strip kernels against the value-level XLA plane path.  Same
    # re-association contract as phase 1.
    pout = {}
    for backend in ("auto", "xla"):
        pres = MultigridConfig(tolerance=1e-2, max_cycles=8, check_every=2,
                               coarsest_sweeps=32, coarse_rebuild_every=8,
                               backend=backend, fine_layout="plane")
        st = nf.initialize_state(mesh, bc)
        t0 = time.time()
        _, diag = simple_solve(mesh, fluid, bc, st, cfg, momentum=mom,
                               pressure=pres, loop="chunked:400")
        pout[backend] = dict(converged=bool(diag.converged),
                             iters=int(diag.iterations),
                             residual=float(diag.final_residual),
                             wall_s=round(time.time() - t0, 1))
        print(json.dumps({"fine_layout": "plane", "backend": backend,
                          **pout[backend]}), flush=True)
    pdrift = abs(pout["auto"]["iters"] - pout["xla"]["iters"])
    prres = abs(pout["auto"]["residual"] - pout["xla"]["residual"]) / max(
        pout["xla"]["residual"], 1e-30)
    pok = (pdrift <= max(2, pout["xla"]["iters"] // 20) and prres < 1e-3)
    print(json.dumps({"plane_parity_ok": pok, "iter_drift": pdrift,
                      "residual_rel_diff": prres}))

    # Phase 3: the strip-blocked Chebyshev momentum solve+residual kernel
    # (ops/pallas_cheby.py) vs the whole-array XLA Chebyshev — the same
    # iterate function traced per-window vs globally, so the trajectories
    # must agree like phase 1's.  Run at 2048^2 (the kernel is gated to
    # >= 2048 grids — at 512^2 'auto' already resolves to XLA and the
    # comparison would be trivial) with a fixed-step budget.
    from naviflow_tpu.solvers import ChebyshevMomentumConfig

    cnx = int(os.environ.get("CHEBY_PARITY_NX", 2048))
    cit = int(os.environ.get("CHEBY_PARITY_ITERS", 1500))
    cmesh = nf.StructuredMesh(nx=cnx, ny=cnx)
    ccfg = SIMPLEConfig(max_iterations=cit, tolerance=0.0)
    cout = {}
    for backend in ("auto", "xla"):
        mom_c = ChebyshevMomentumConfig(degree=4, backend=backend)
        pres = MultigridConfig(tolerance=1e-2, max_cycles=8, check_every=2,
                               coarsest_sweeps=32, coarse_rebuild_every=8)
        st = nf.initialize_state(cmesh, bc)
        t0 = time.time()
        _, diag = simple_solve(cmesh, fluid, bc, st, ccfg, momentum=mom_c,
                               pressure=pres, loop="chunked:250")
        cout[backend] = dict(nx=cnx, iters=int(diag.iterations),
                             residual=float(diag.final_residual),
                             wall_s=round(time.time() - t0, 1))
        print(json.dumps({"momentum": f"cheby4_{backend}", **cout[backend]}),
              flush=True)
    crres = abs(cout["auto"]["residual"] - cout["xla"]["residual"]) / max(
        cout["xla"]["residual"], 1e-30)
    cok = crres < 1e-3
    print(json.dumps({"cheby_strip_parity_ok": cok,
                      "fixed_steps": cit, "residual_rel_diff": crres}))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
