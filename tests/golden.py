"""Independent NumPy golden oracles for operator-equivalence tests.

These are *loop-based scalar* implementations written directly from the
finite-volume specification (Patankar power-law scheme on a staggered MAC
grid, Practice-B boundary folding, variable-coefficient pressure-correction
operator with the reference's boundary fold and gauge pin).  They are
deliberately structured differently from both the production JAX kernels and
the reference's vectorized NumPy (per-cell loops, explicit dense matrices) so
that agreement is meaningful — the same testing pattern as the reference's
``main_scripts/matrix_free_sanity.py``.

Spec sources (reference file:line):
  power-law faces/coefficients .. discretization/power_law.py:46-209, 211-365
  pressure operator + fold ...... pressure_solver/helpers/matrix_free.py:6-135
  explicit matrix + pin ......... pressure_solver/helpers/coeff_matrix.py:6-121
  RHS + pin ..................... pressure_solver/helpers/rhs_construction.py:3-21
"""

import numpy as np


def A_power(F, D):
    if abs(D) <= 1e-10:
        return 0.0
    return max(0.0, 1.0 - 0.1 * abs(F / D)) ** 5


def golden_u_coefficients(u, v, p, dx, dy, rho, mu, fold_all_sides=True):
    """Per-cell u-momentum coefficients on (nx+1, ny); rows 0 and nx zero."""
    nx = u.shape[0] - 1
    ny = u.shape[1]
    De = mu * dy / dx
    Dn = mu * dx / dy
    out = {k: np.zeros((nx + 1, ny)) for k in ("a_e", "a_w", "a_n", "a_s", "a_p", "src")}
    for i in range(1, nx):
        for j in range(ny):
            Fe = 0.5 * rho * dy * (u[i + 1, j] + u[i, j])
            Fw = 0.5 * rho * dy * (u[i - 1, j] + u[i, j])
            Fn = 0.0 if j == ny - 1 else 0.5 * rho * dx * (v[i, j + 1] + v[i - 1, j + 1])
            Fs = 0.0 if j == 0 else 0.5 * rho * dx * (v[i, j] + v[i - 1, j])
            ae = De * A_power(Fe, De) + max(-Fe, 0.0)
            aw = De * A_power(Fw, De) + max(Fw, 0.0)
            an = 0.0 if j == ny - 1 else Dn * A_power(Fn, Dn) + max(-Fn, 0.0)
            a_s = 0.0 if j == 0 else Dn * A_power(Fs, Dn) + max(Fs, 0.0)
            ap = ae + aw + an + a_s + (Fe - Fw) + (Fn - Fs)
            out["a_e"][i, j] = ae
            out["a_w"][i, j] = aw
            out["a_n"][i, j] = an
            out["a_s"][i, j] = a_s
            out["a_p"][i, j] = ap
            out["src"][i, j] = (p[i - 1, j] - p[i, j]) * dy
    if fold_all_sides:
        for j in range(ny):  # left/right walls
            out["src"][1, j] += out["a_w"][1, j] * u[0, j]
            out["a_w"][1, j] = 0.0
            out["src"][nx - 1, j] += out["a_e"][nx - 1, j] * u[nx, j]
            out["a_e"][nx - 1, j] = 0.0
        for i in range(1, nx):  # bottom/top walls
            out["src"][i, 1] += out["a_s"][i, 1] * u[i, 0]
            out["a_s"][i, 1] = 0.0
            out["src"][i, ny - 2] += out["a_n"][i, ny - 2] * u[i, ny - 1]
            out["a_n"][i, ny - 2] = 0.0
    return out


def golden_v_coefficients(u, v, p, dx, dy, rho, mu, fold_all_sides=True):
    """Per-cell v-momentum coefficients on (nx, ny+1); columns 0 and ny zero."""
    nx = v.shape[0]
    ny = v.shape[1] - 1
    De = mu * dy / dx
    Dn = mu * dx / dy
    out = {k: np.zeros((nx, ny + 1)) for k in ("a_e", "a_w", "a_n", "a_s", "a_p", "src")}
    for i in range(nx):
        for j in range(1, ny):
            Fe = 0.0 if i == nx - 1 else 0.5 * rho * dy * (u[i + 1, j] + u[i + 1, j - 1])
            Fw = 0.0 if i == 0 else 0.5 * rho * dy * (u[i, j] + u[i, j - 1])
            Fn = 0.5 * rho * dx * (v[i, j] + v[i, j + 1])
            Fs = 0.5 * rho * dx * (v[i, j - 1] + v[i, j])
            ae = 0.0 if i == nx - 1 else De * A_power(Fe, De) + max(-Fe, 0.0)
            aw = 0.0 if i == 0 else De * A_power(Fw, De) + max(Fw, 0.0)
            an = Dn * A_power(Fn, Dn) + max(-Fn, 0.0)
            a_s = Dn * A_power(Fs, Dn) + max(Fs, 0.0)
            ap = ae + aw + an + a_s + (Fe - Fw) + (Fn - Fs)
            out["a_e"][i, j] = ae
            out["a_w"][i, j] = aw
            out["a_n"][i, j] = an
            out["a_s"][i, j] = a_s
            out["a_p"][i, j] = ap
            out["src"][i, j] = (p[i, j - 1] - p[i, j]) * dx
    if fold_all_sides:
        for i in range(nx):  # bottom/top walls
            out["src"][i, 1] += out["a_s"][i, 1] * v[i, 0]
            out["a_s"][i, 1] = 0.0
            out["src"][i, ny - 1] += out["a_n"][i, ny - 1] * v[i, ny]
            out["a_n"][i, ny - 1] = 0.0
        for j in range(1, ny):  # left/right walls
            out["src"][1, j] += out["a_w"][1, j] * v[0, j]
            out["a_w"][1, j] = 0.0
            out["src"][nx - 2, j] += out["a_e"][nx - 2, j] * v[nx - 1, j]
            out["a_e"][nx - 2, j] = 0.0
    return out


def golden_pressure_matrix(d_u, d_v, dx, dy, rho, pin=True, variant="reference"):
    """Dense pressure-correction matrix with Fortran cell numbering
    k = i + j*nx, reference boundary fold, and optional gauge pin."""
    nx = d_u.shape[0] - 1
    ny = d_v.shape[1] - 1
    n = nx * ny
    A = np.zeros((n, n))

    def k(i, j):
        return i + j * nx

    for i in range(nx):
        for j in range(ny):
            aE = rho * d_u[i + 1, j] * dy if i < nx - 1 else 0.0
            aW = rho * d_u[i, j] * dy if i > 0 else 0.0
            aN = rho * d_v[i, j + 1] * dx if j < ny - 1 else 0.0
            aS = rho * d_v[i, j] * dx if j > 0 else 0.0
            diag = 0.0
            if variant == "reference":
                # fold interior-facing coefficient into the diagonal, cut link
                if i == 0:
                    diag += aE
                    aE = 0.0
                if i == nx - 1:
                    diag += aW
                    aW = 0.0
                if j == 0:
                    diag += aN
                    aN = 0.0
                if j == ny - 1:
                    diag += aS
                    aS = 0.0
            diag += aE + aW + aN + aS
            A[k(i, j), k(i, j)] = diag
            if aE:
                A[k(i, j), k(i + 1, j)] = -aE
            if aW:
                A[k(i, j), k(i - 1, j)] = -aW
            if aN:
                A[k(i, j), k(i, j + 1)] = -aN
            if aS:
                A[k(i, j), k(i, j - 1)] = -aS
    if pin:
        A[0, :] = 0.0
        A[0, 0] = 1.0
    return A


def golden_rhs(u_star, v_star, dx, dy, rho, pin=True):
    nx = u_star.shape[0] - 1
    ny = v_star.shape[1] - 1
    b = np.zeros((nx, ny))
    for i in range(nx):
        for j in range(ny):
            b[i, j] = rho * (
                (u_star[i, j] - u_star[i + 1, j]) * dy
                + (v_star[i, j] - v_star[i, j + 1]) * dx
            )
    if pin:
        b[0, 0] = 0.0
    return b


def fortran_flatten(x2d):
    """(nx, ny) -> flat with i fastest (matches k = i + j*nx)."""
    return np.asarray(x2d).flatten(order="F")


def golden_stencil_matvec(x, c):
    """Dense-free check: apply a 5-pt StencilCoeffs dict with zero-flux
    boundaries to a full-grid array, per cell."""
    ni, nj = x.shape
    out = np.zeros_like(x)
    for i in range(ni):
        for j in range(nj):
            acc = c["a_p"][i, j] * x[i, j]
            if i + 1 < ni:
                acc -= c["a_e"][i, j] * x[i + 1, j]
            if i - 1 >= 0:
                acc -= c["a_w"][i, j] * x[i - 1, j]
            if j + 1 < nj:
                acc -= c["a_n"][i, j] * x[i, j + 1]
            if j - 1 >= 0:
                acc -= c["a_s"][i, j] * x[i, j - 1]
            out[i, j] = acc
    return out
