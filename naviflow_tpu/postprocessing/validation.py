"""Lid-driven-cavity validation against Ghia, Ghia & Shin (1982).

Benchmark tables are the published centerline data from Ghia, U., Ghia, K.N.,
Shin, C.T., "High-Re solutions for incompressible flow using the
Navier-Stokes equations and a multigrid method", J. Comput. Phys. 48 (1982)
387-411 (Tables I & II) — the same golden data used by the reference
(``naviflow_oo/postprocessing/validation/cavity_flow.py:25-124``).

Error metrics preserved: cubic interpolation of the computed centerlines onto
the benchmark coordinates, then infinity-norm (:178-238) or RMS L2 (:241-301)
of the difference; the validation pass threshold is a 10% max centerline
error (``simulation_result.py:262-264``).
"""

from __future__ import annotations

import numpy as np
from scipy.interpolate import interp1d

# y-coordinates of the u-velocity benchmark points (same for all Re).
GHIA_Y = np.array(
    [0.0000, 0.0547, 0.0625, 0.0703, 0.1016, 0.1719, 0.2813, 0.4531,
     0.5000, 0.6172, 0.7344, 0.8516, 0.9531, 0.9609, 0.9688, 1.0000]
)
# x-coordinates of the v-velocity benchmark points (same for all Re).
GHIA_X = np.array(
    [1.0000, 0.9688, 0.9609, 0.9531, 0.9453, 0.9063, 0.8594, 0.8047,
     0.5000, 0.2344, 0.2266, 0.1563, 0.0938, 0.0781, 0.0703, 0.0625, 0.0000]
)

# u along the vertical centerline x=0.5, at GHIA_Y, per Reynolds number.
GHIA_U = {
    100: [0.00000, -0.03717, -0.04192, -0.04775, -0.06434, -0.10150, -0.15662,
          -0.21090, -0.20581, -0.13641, 0.00332, 0.23151, 0.68717, 0.73722,
          0.78871, 1.00000],
    400: [0.00000, -0.08186, -0.09266, -0.10338, -0.14612, -0.24299, -0.32726,
          -0.17119, -0.11477, 0.02135, 0.16256, 0.29093, 0.55892, 0.61756,
          0.68439, 1.00000],
    1000: [0.00000, -0.18109, -0.20196, -0.22220, -0.29730, -0.38289, -0.27805,
           -0.10648, -0.06080, 0.05702, 0.18719, 0.33304, 0.46604, 0.51117,
           0.57492, 1.00000],
    # note: the reference's copy (cavity_flow.py:79-80) carries a transcription
    # typo at y=0.4531: -0.86636 (a dropped E-01 from the paper's -0.86636E-01);
    # we use the physical value -0.086636 — converged 511^2 solutions land on
    # it, and |u| < 0.5 everywhere in the cavity interior.
    3200: [0.00000, -0.32407, -0.35344, -0.37827, -0.41933, -0.34323, -0.24427,
           -0.086636, -0.04272, 0.07156, 0.19791, 0.34682, 0.46101, 0.46547,
           0.48296, 1.00000],
    5000: [0.00000, -0.41165, -0.42901, -0.43643, -0.40435, -0.33050, -0.22855,
           -0.07404, -0.03039, 0.08183, 0.20087, 0.33556, 0.46036, 0.45992,
           0.46120, 1.00000],
    7500: [0.00000, -0.43154, -0.43590, -0.43025, -0.38324, -0.32393, -0.23176,
           -0.07503, -0.03800, 0.08342, 0.20591, 0.34228, 0.47167, 0.47323,
           0.47048, 1.00000],
    10000: [0.00000, -0.42735, -0.42537, -0.41657, -0.38000, -0.32709, -0.23186,
            -0.07540, -0.03111, 0.08344, 0.20673, 0.34635, 0.47804, 0.48070,
            0.47783, 1.00000],
}

# v along the horizontal centerline y=0.5, at GHIA_X, per Reynolds number.
GHIA_V = {
    100: [0.00000, -0.05906, -0.07391, -0.08864, -0.10313, -0.16914, -0.22445,
          -0.24533, 0.05454, 0.17527, 0.17507, 0.16077, 0.12317, 0.10890,
          0.10091, 0.09233, 0.00000],
    400: [0.00000, -0.12146, -0.15663, -0.19254, -0.22847, -0.23827, -0.44993,
          -0.38598, 0.05186, 0.30174, 0.30203, 0.28124, 0.22965, 0.20920,
          0.19713, 0.18360, 0.00000],
    1000: [0.00000, -0.21388, -0.27669, -0.33714, -0.39188, -0.51550, -0.42665,
           -0.31966, 0.02526, 0.32235, 0.33075, 0.37095, 0.32627, 0.30353,
           0.29012, 0.27485, 0.00000],
    3200: [0.00000, -0.39017, -0.47425, -0.52357, -0.54053, -0.44307, -0.37401,
           -0.31184, 0.00999, 0.28188, 0.29030, 0.37119, 0.42768, 0.41906,
           0.40917, 0.39560, 0.00000],
    # The reference's v-rows for Re >= 5000 (cavity_flow.py:100-118) are
    # corrupted transcriptions, proven by internal evidence: each row's
    # first interior entry EQUALS the same-Re u-table entry to all five
    # digits (v[5000][1] = u[5000][1] = -0.41165, v[7500][1] = u[7500][1]
    # = -0.43154, v[10000][1] = u[10000][1] = -0.42735 — a copy slip; the
    # clean Re <= 3200 rows share no digits with their u-rows), the
    # Re=5000 entries 2-4 are the published values in REVERSED order, its
    # tail carries u-values from OTHER Re rows (0.43154 = u7500[1],
    # 0.42735 = u10000[1]), and Re=10000's -0.65928/-0.68439 exceed every
    # published v-extremum in the table family.  The rows below are the
    # published Ghia, Ghia & Shin (1982) Table II columns; empirical
    # cross-check (benchmarks/states/, round 5): independently converged
    # Newton solutions at 511^2 AND 1023^2 land on these values (1023^2
    # Re=10000 near-wall peak -0.54678 vs the published -0.54302, and
    # both centerlines then agree with the table uniformly to ~4% — vs
    # 23-26% "error" against the corrupted rows, concentrated entirely
    # in v).  Same class of fix as the Re=3200 u-typo above.
    5000: [0.00000, -0.49774, -0.55069, -0.55408, -0.52876, -0.41442, -0.36214,
           -0.30018, 0.00945, 0.27280, 0.28066, 0.35368, 0.42951, 0.43648,
           0.43329, 0.42447, 0.00000],
    7500: [0.00000, -0.53858, -0.55216, -0.52347, -0.48590, -0.41050, -0.36213,
           -0.30448, 0.00824, 0.27348, 0.28117, 0.35060, 0.41824, 0.43564,
           0.44030, 0.43979, 0.00000],
    10000: [0.00000, -0.54302, -0.52987, -0.49099, -0.45863, -0.41496, -0.36737,
            -0.30719, 0.00831, 0.27224, 0.28003, 0.35070, 0.41487, 0.43124,
            0.43733, 0.43983, 0.00000],
}

AVAILABLE_REYNOLDS = sorted(GHIA_U)


def get_ghia_data(reynolds: float):
    """Benchmark dict for Re (closest-available fallback, reference
    ``validation/__init__.py:8-29``)."""
    re = int(reynolds)
    if re not in GHIA_U:
        re = min(AVAILABLE_REYNOLDS, key=lambda r: abs(r - reynolds))
    return {
        "x": GHIA_X,
        "v": np.asarray(GHIA_V[re]),
        "y": GHIA_Y,
        "u": np.asarray(GHIA_U[re]),
        "reynolds": re,
    }


def centerline_profiles(u, v, mesh):
    """Computed centerline profiles (reference conventions: u[nx//2, :]
    along x=0.5, v[:, ny//2] along y=0.5, at cell-center coordinates)."""
    u = np.asarray(u)
    v = np.asarray(v)
    nx, ny = mesh.get_dimensions()
    return mesh.y, u[nx // 2, :], mesh.x, v[:, ny // 2]


def _interp_to_benchmark(u, v, mesh, reynolds):
    data = get_ghia_data(reynolds)
    y, u_c, x, v_c = centerline_profiles(u, v, mesh)
    u_i = interp1d(y, u_c, kind="cubic", bounds_error=False, fill_value="extrapolate")
    v_i = interp1d(x, v_c, kind="cubic", bounds_error=False, fill_value="extrapolate")
    return u_i(data["y"]) - data["u"], v_i(data["x"]) - data["v"], data


def infinity_norm_error(u, v, mesh, reynolds) -> float:
    """Max centerline error vs Ghia (reference ``cavity_flow.py:178-238``)."""
    du, dv, _ = _interp_to_benchmark(u, v, mesh, reynolds)
    return float(max(np.max(np.abs(du)), np.max(np.abs(dv))))


def l2_norm_error(u, v, mesh, reynolds) -> float:
    """RMS centerline error vs Ghia (reference ``cavity_flow.py:241-301``)."""
    du, dv, _ = _interp_to_benchmark(u, v, mesh, reynolds)
    return float(np.sqrt((np.sum(du**2) + np.sum(dv**2)) / (du.size + dv.size)))


def validate_against_benchmark(u, v, mesh, reynolds, threshold=0.10):
    """Pass/fail dict with the reference's 10% threshold
    (``simulation_result.py:186-264``)."""
    err = infinity_norm_error(u, v, mesh, reynolds)
    return {
        "infinity_norm_error": err,
        "l2_norm_error": l2_norm_error(u, v, mesh, reynolds),
        "threshold": threshold,
        "passed": err < threshold,
    }
