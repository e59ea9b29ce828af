"""Strip-blocked Chebyshev momentum solve + unrelaxed residual.

The round-4/5 phase attribution (``benchmarks/profile_phases.py``,
``probe_step_parts.py``, MOMENTUM_BUDGET.jsonl) pinned the large-grid
SIMPLE step on the momentum inner solve: at 2048^2 the Krylov path costs
11.2 ms of a 15.4 ms step body (reduction barriers), and even the
reduction-light XLA Chebyshev (``solvers/momentum._chebyshev_masked``,
measured 10.94 ms/iter whole-step vs 17.65 for the pair BiCGSTAB) streams
the six relaxed-coefficient arrays from HBM once per stencil apply plus
once more for the unrelaxed residual — ``(degree+1) x ~6`` array reads
that a VMEM-resident formulation makes ~1.

This kernel processes one momentum field in T-row strips with an H-row
halo (the temporal-blocking pattern of ``ops/pallas_strip.py``): each
strip DMAs its window of the field and BOTH coefficient sets (relaxed for
the solve, unrelaxed for the residual) into VMEM once, runs the ENTIRE
fixed-degree Chebyshev iteration (``degree`` stencil applies — zero
global reductions; the Gershgorin interval scalars arrive precomputed)
plus the unrelaxed residual ``r = src_un - A_un x*`` on the resident
tile, and writes back only the T owned rows of ``x*`` and of the
interior-masked residual field.  Each stencil apply invalidates one
window-edge row per side (window-local shifts read zero padding instead
of the true neighbor), so correctness needs ``degree + 1 <= H = 16`` —
far above the production degree 4-6.

The per-window math is ``solvers/momentum._chebyshev_iterate`` — the
SAME traced function as the XLA path, on global-index masks — so the two
backends agree to FMA-contraction level (pinned by
``tests/test_pallas_cheby.py``; hardware iteration-count parity by
``benchmarks/strip_parity_check.py``).

Role match: the reference's momentum inner loop
(``matrix_free_momentum.py:49-63`` 5-pt matvec; ``jacobi_solver.py:68-77``
fixed sweeps) — here as one launch per field per outer iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .stencil import StencilCoeffs, apply_stencil

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

from .pallas_mg import kernel_params

H = 16  # halo rows per side: degree+1 consumed rows, 16 for alignment

# Window cap in cells (W x lane-padded NJ).  The kernel holds 9 window
# arrays (x + 6 relaxed + 2 unrelaxed-pair) plus the iteration's live
# temporaries; 384k cells keeps the same ~2.5x-liveness safety ratio
# against the raised 64 MiB scoped-VMEM limit as the nine-point strip
# cap (ops/pallas_strip._CAP_NINE, 11 arrays).  96*4096 = 384k admits
# T=64 at 4096^2.
_CAP_CELLS = 384 * 1024


def _lane(n: int) -> int:
    return -(-n // 128) * 128


def _strip_rows(n_rows: int, lane_nj: int) -> int:
    """Largest strip height T whose (T + 2H, lane_nj) window fits the
    VMEM budget and tiles the processed row count with low waste; 0 if
    none.  ``n_rows`` is the PROCESSED extent NI - 1 (the last row of
    either staggered field is never solved — u: i = nx face, v: the
    right-wall row — so the grid covers only the solvable extent; at
    1024^2 this is the difference between 4 clean 256-row strips and 5
    strips processing 25% padding, measured 1.91 vs expected ~1.5
    ms/iter)."""
    for T in (256, 128, 64, 32):
        # n_rows > T makes the grid extent >= 2T >= T + 2H, so every
        # clipped window fits inside the padded array
        if (T + 2 * H) * lane_nj <= _CAP_CELLS and n_rows > T:
            return T
    return 0


def supports_cheby_strips(shape, dtype) -> bool:
    """Gate: TPU, f32, five-point systems, grids big enough that the
    whole-field fused kernels no longer apply (the bandwidth regime)."""
    if not HAVE_PALLAS or dtype != jnp.float32:
        return False
    if jax.default_backend() != "tpu":
        return False
    ni, nj = shape
    # Measured crossover (MOMENTUM_BUDGET.jsonl 2026-08-19): at 1024^2
    # the whole-array XLA composition wins (1.67 vs 1.78 ms/iter — the
    # kernel's launch + DMA-issue overhead exceeds its traffic saving),
    # at 2048^2 the strips win 8.15 vs 10.41.  Gate to the >= 2048 regime.
    if ni < 1536 or nj < 1536:
        return False
    return _strip_rows(ni - 1, _lane(nj)) > 0


def _mk_kernel(NI, NJ, R_arr, T, lane_nj, degree):
    from ..solvers.momentum import _chebyshev_iterate

    W = T + 2 * H

    def kernel(*refs):
        hbm = refs[:9]  # x0, a_e, a_w, a_n, a_s, ap_rel, src_rel, ap_un, src_un
        th_ref, de_ref, si_ref = refs[9:12]
        x_out, r_out = refs[12:14]
        scratch = refs[14:23]
        sems = refs[23]
        g = pl.program_id(0)
        off = jnp.clip(g * T - H, 0, R_arr - W)
        off = pl.multiple_of(off, 16)
        s0 = pl.multiple_of(g * T - off, 8)
        dmas = []
        for i, (src, dst) in enumerate(zip(hbm, scratch)):
            dma = pltpu.make_async_copy(src.at[pl.ds(off, W)], dst,
                                        sems.at[i])
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()
        (xw, aew, aww, anw, asw, aprw, srw, apuw, suw) = scratch
        c_rel = StencilCoeffs(a_e=aew[:], a_w=aww[:], a_n=anw[:],
                              a_s=asw[:], a_p=aprw[:], src=srw[:])
        ii = off + jax.lax.broadcasted_iota(jnp.int32, (W, lane_nj), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (W, lane_nj), 1)
        # solve mask == residual-norm region for both staggered fields
        # (u: i in [1, nx-1], j in [1, ny-2]; v: i in [1, nx-2],
        # j in [1, ny-1] — both are interior_mask(1,1,1,1) on their grid)
        mask = (ii >= 1) & (ii <= NI - 2) & (jj >= 1) & (jj <= NJ - 2)
        x = _chebyshev_iterate(xw[:], c_rel, mask,
                               th_ref[0, 0], de_ref[0, 0], si_ref[0, 0],
                               degree)
        c_un = StencilCoeffs(a_e=aew[:], a_w=aww[:], a_n=anw[:],
                             a_s=asw[:], a_p=apuw[:], src=suw[:])
        r = jnp.where(mask, c_un.src - apply_stencil(x, c_un), 0.0)
        # Mosaic has no value-level dynamic_slice: round-trip through the
        # consumed input scratch refs and store a pl.ds window
        xw[:] = x
        x_out[:] = xw[pl.ds(s0, T), :]
        srw[:] = r
        r_out[:] = srw[pl.ds(s0, T), :]

    return kernel


def chebyshev_momentum_strips(x0, c_rel, c_un, *, theta, delta, sigma1,
                              degree: int, interpret: bool = False):
    """Fixed-degree Chebyshev solve of one momentum field plus its
    unrelaxed residual, strip-blocked.

    ``x0``: the BC-applied field; ``c_rel``/``c_un``: relaxed and
    unrelaxed :class:`StencilCoeffs`; the interval scalars come from
    ``solvers.momentum._chebyshev_bounds``.  Returns ``(x_star, r_m)``
    where ``r_m`` is the unrelaxed residual zeroed outside the interior
    norm region — ``||r_m||`` IS the reference residual norm, and the
    diagnostics field is a further mask of it (see
    ``solvers.momentum._unrelaxed_residual``).
    """
    NI, NJ = x0.shape
    lane_nj = _lane(NJ)
    # the grid covers only the SOLVABLE extent NI - 1 (mask hi_i = 1: the
    # last row of either staggered field is boundary-held), killing the
    # row-padding waste at odd extents (u is (nx+1, ny)); the untouched
    # last row is re-appended from x0 below
    R_proc = NI - 1
    T = _strip_rows(R_proc, lane_nj)
    W = T + 2 * H
    R_grid = -(-R_proc // T) * T  # >= 2T >= W by the _strip_rows gate
    # input arrays must still carry ALL NI real rows (row NI-1 is a live
    # neighbor of row NI-2), 16-row aligned for the clipped window DMAs
    R_arr = max(R_grid, -(-NI // 16) * 16)
    dt = x0.dtype

    def prep(a):
        return jnp.pad(a, ((0, R_arr - NI), (0, lane_nj - NJ)))

    inputs = [prep(x0),
              prep(c_rel.a_e), prep(c_rel.a_w), prep(c_rel.a_n),
              prep(c_rel.a_s), prep(c_rel.a_p), prep(c_rel.src),
              prep(c_un.a_p), prep(c_un.src)]
    f32 = jnp.float32
    inputs += [jnp.reshape(jnp.asarray(s, f32), (1, 1))
               for s in (theta, delta, sigma1)]

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    x_p, r_p = pl.pallas_call(
        _mk_kernel(NI, NJ, R_arr, T, lane_nj, degree),
        grid=(R_grid // T,),
        out_shape=[jax.ShapeDtypeStruct((R_grid, lane_nj), dt)] * 2,
        in_specs=[any_spec] * 9 + [vmem] * 3,
        out_specs=[pl.BlockSpec((T, lane_nj), lambda g: (g, 0))] * 2,
        scratch_shapes=[pltpu.VMEM((W, lane_nj), dt) for _ in range(9)]
        + [pltpu.SemaphoreType.DMA((9,))],
        compiler_params=kernel_params(),
        interpret=interpret,
    )(*inputs)
    # boundary-held tail rows (>= R_proc): never solved, residual-masked
    x_star = jnp.concatenate([x_p[:R_proc, :NJ], x0[R_proc:]], axis=0)
    r_m = jnp.concatenate(
        [r_p[:R_proc, :NJ], jnp.zeros((NI - R_proc, NJ), dt)], axis=0)
    return x_star, r_m
