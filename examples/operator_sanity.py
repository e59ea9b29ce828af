"""Operator-equivalence sanity checks (reference main_scripts/matrix_free_sanity.py).

Verifies that the matrix-free pressure operator equals the explicitly
assembled dense matrix, and reports the symmetry defect of each variant
(the reference operator is asymmetric at boundaries; the symmetric and
consistent variants are exactly symmetric).
"""

import _common  # noqa: F401  (sys.path bootstrap)
import jax.numpy as jnp
import numpy as np

from naviflow_tpu.ops.poisson import apply_poisson, poisson_coefficients
from naviflow_tpu.solvers.pressure import dense_poisson_matrix


def main():
    nx = ny = 10
    n = nx * ny
    rng = np.random.default_rng(0)
    d_u = jnp.asarray(rng.random((nx + 1, ny)) + 0.1)
    d_v = jnp.asarray(rng.random((nx, ny + 1)) + 0.1)
    p = jnp.asarray(rng.random((nx, ny)))
    p_flat = np.asarray(p).T.reshape(-1)  # Fortran flatten (i fastest)

    for variant in ("reference", "symmetric", "consistent"):
        c = poisson_coefficients(d_u, d_v, dx=1.0, dy=1.0, rho=1.0, variant=variant)
        pin = variant == "reference"
        mf = np.asarray(apply_poisson(p, c, pinned=pin)).T.reshape(-1)
        A = np.asarray(dense_poisson_matrix(c, pin=pin))
        dense = A @ p_flat
        if not pin:
            # the unpinned dense matrix carries a ones/n gauge shift and an
            # identity floor on empty (corner) rows — undo both for comparison
            dense = dense - p_flat.mean()
            floored = np.abs(np.asarray(c.diag).T.reshape(-1)) < 1e-15
            dense[floored] -= p_flat[floored]
        diff = float(np.abs(mf - dense).max())
        ok = diff < (1e-10 if mf.dtype == np.float64 else 3e-5)
        x = rng.random(n)
        y = rng.random(n)
        B = A - (0 if pin else np.ones_like(A) / n)
        sym = abs(x @ (B @ y) - y @ (B @ x))
        print(f"{variant:10s}: matvec==dense {ok} (max diff {diff:.1e})   "
              f"|x'Ay - y'Ax| = {sym:.3e}")


if __name__ == "__main__":
    main()
