"""In-kernel-assembling Chebyshev momentum solve (the round-5 ROADMAP #6
"drop the 16-array coefficient round-trip" item).

On the large-grid Chebyshev path the step launches three strip kernels
per outer iteration — ``fused_assembly_pair`` (writes 16 coefficient
arrays + the d/pc fold) and one ``chebyshev_momentum_strips`` per field
(reads 8 coefficient arrays each) — so the coefficient sets cross HBM
once as writes and once more as reads with no consumer beyond the solve.
This kernel merges all three: each strip DMAs its u/v/p windows into
VMEM once, assembles each field's relaxed+unrelaxed coefficients on the
x-window extent, runs the ENTIRE fixed-degree Chebyshev iteration and
the unrelaxed residual on the resident tile (u fully sequenced before v
to bound the liveness peak), and writes only the step-consumed arrays:
``u*, v*, r_u, r_v, d_u, d_v``, the 5-array pressure-correction
operator, and fresh Gershgorin ratio tiles.  The 16 momentum coefficient
arrays never touch HBM.

**Lagged spectral bounds.** The Chebyshev interval needs the global
masked Gershgorin ratio maximum of the relaxed systems — a cross-strip
reduction that cannot precede the solve inside one sequential-grid
launch.  The solve therefore uses the PREVIOUS outer iteration's maxima
(carried by the SIMPLE loop; ``algorithms/simple.py``), while the kernel
emits fresh per-strip tiles for the next iteration.  The coefficients
drift O(1-alpha_u) per outer step and the ratio enters
``_bounds_from_rho`` with a 1.05 margin and a 0.999 clamp, so a
one-iteration lag keeps the interval valid; the first iteration uses the
conservative ``rho = 0.999`` (interval ``[0.001, 1.999]`` — one weak
solve from the initial fields, after which the carried maxima take
over).  The residual norms are exact either way — only the inner-solve
contraction rate sees the lag.  Certified by fixed-step residual parity
against the unlagged composition (``benchmarks/asmcheby_probe.py``) and
an interpret-mode equality test given the same bounds
(``tests/test_pallas_asmcheby.py``).

Window geometry: the raw-field x windows carry ``PAD = 16`` halo rows
per side; the coefficient blocks are assembled on the SAME extent (from
input windows one ring wider), so coefficients and iterates share one
window coordinate system with no staging.  Each stencil apply consumes
one window-edge row per side, so owned-row validity needs
``degree + 1 <= PAD`` — with the margin of the assembled halo rows being
true values (not zeros) on interior strips.  The per-tile math is the
verified window-form assembly of ``ops/windowed.py`` and the SAME traced
``_chebyshev_iterate`` as the XLA and per-field-kernel paths.

Role match: the reference's per-outer-iteration momentum stage —
coefficient assembly (``discretization/power_law.py:46-209``) plus the
inner solve and unrelaxed residual (``matrix_free_momentum.py:49-63,
380-400``) — as ONE kernel launch per outer iteration.
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

PAD = 16  # x-window halo rows per side; >= degree + 1 apply-chain rows


# Window cap in cells (x-window rows X = T + 2*PAD times lane-padded ny).
# The merged kernel's liveness peak is one field's assembly temporaries
# plus its 8 live coefficient arrays plus the iteration state (~40
# f32/cell, sequenced u-then-v) against the 64 MiB scoped-VMEM limit.
# Hardware-probed (benchmarks/asmcheby_probe.py, CYCLE_TIMING
# kind=asmcheby, TPU v5e 2026-08-19).
_CAP_CELLS = 224 * 1024


def _lane(n: int) -> int:
    return -(-n // 128) * 128


def _strip_rows_merged(nx: int, ny: int) -> int:
    for T in (128, 64, 32, 16):
        if nx % T == 0 and (T + 2 * PAD) * ny <= _CAP_CELLS:
            return T
    return 0


def supports_asmcheby(nx, ny, scheme, dtype, backend, degree) -> bool:
    """Gate: TPU auto/pallas backend, power-law f32 five-point systems,
    grids in the bandwidth regime, apply chain within the window halo."""
    if not HAVE_PALLAS or backend not in ("auto", "pallas"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if scheme != "power_law" or dtype != jnp.float32:
        return False
    if degree + 1 > PAD:
        return False
    # measured crossover (benchmarks/asmcheby_probe.py): the merged
    # kernel wins from 1024^2 up; below, the whole-step/255^2 kernels
    # and the XLA composition are faster
    if nx < 1024 or ny < 1024:
        return False
    return _strip_rows_merged(nx, ny) > 0


def _mk_kernel(nx, ny, T, dx, dy, rho, mu, alpha, degree, poisson_variant):
    from ..solvers.momentum import _chebyshev_iterate
    from .powerlaw import relax_coefficients
    from .windowed import u_coefficients_window, v_coefficients_window

    X = T + 2 * PAD  # x-window / coefficient-block rows
    We = X + 8  # halo-extended input window rows (block + one ring, 8-up)
    NIu, NJu = nx + 1, ny
    NIv, NJv = nx, ny + 1

    def kernel(*refs):
        ue_h, ve_h, pe_h, ur_h, vr_h = refs[:5]
        scal = refs[5:11]  # th_u, de_u, si_u, th_v, de_v, si_v
        outs = refs[11:24]
        uew, vew, pew, urw, vrw = refs[24:29]
        sems = refs[29]
        g = pl.program_id(0)
        off = pl.multiple_of(g * T, 16)
        dmas = []
        for i, (src, dst) in enumerate(((ue_h, uew), (ve_h, vew),
                                        (pe_h, pew), (ur_h, urw),
                                        (vr_h, vrw))):
            dma = pltpu.make_async_copy(src.at[pl.ds(off, dst.shape[0])],
                                        dst, sems.at[i])
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()

        # halo-extended window row w holds global row gT + w - PAD - 1
        # (the wrapper pads PAD+1 rows on top); raw window row w holds
        # global row gT + w - PAD.  Coefficient blocks are assembled on
        # the full X-row x-window extent (faces/cells gT-PAD ..
        # gT+T+PAD-1), so iterates and coefficients share coordinates.
        gi0 = off - PAD

        def _ratio_max(c_links, ap_rel, lo_i, hi_i, lo_j, hi_j, ncol):
            # masked Gershgorin ratio over the OWNED rows (window rows
            # PAD .. PAD+T) — pallas_assembly._ratio_max semantics
            ii = jax.lax.broadcasted_iota(jnp.int32, (T, ncol), 0) + off
            jj = jax.lax.broadcasted_iota(jnp.int32, (T, ncol), 1)
            m = ((ii >= lo_i) & (ii <= hi_i) & (jj >= lo_j) & (jj <= hi_j))
            safe = jnp.where(ap_rel == 0, jnp.ones_like(ap_rel), ap_rel)
            nb = (jnp.abs(c_links.a_e) + jnp.abs(c_links.a_w)
                  + jnp.abs(c_links.a_n) + jnp.abs(c_links.a_s))
            return jnp.max(jnp.where(m, nb / safe, 0.0))

        # ---- u field: assemble -> solve -> residual (fully sequenced
        # before v so only one field's coefficients are live at once)
        cu = u_coefficients_window(
            uew[: X + 2, : ny + 2], vew[: X + 1, : ny + 3],
            pew[: X + 1, : ny + 2], gi0=gi0, gj0=0, nx=nx, ny=ny,
            dx=dx, dy=dy, rho=rho, mu=mu)  # (X, ny)
        cur = relax_coefficients(cu, urw[:, :ny], alpha)
        gmax_u = _ratio_max(
            jax.tree_util.tree_map(lambda a: a[PAD: PAD + T], cu),
            cur.a_p[PAD: PAD + T], 1, nx - 1, 1, ny - 2, ny)

        # iterate at the field's natural width (value slices of the
        # lane-padded windows — the pattern pallas_assembly already
        # relies on; in-kernel lane-dim concatenate does NOT lower)
        iiu = gi0 + jax.lax.broadcasted_iota(jnp.int32, (X, NJu), 0)
        jju = jax.lax.broadcasted_iota(jnp.int32, (X, NJu), 1)
        mask_u = ((iiu >= 1) & (iiu <= NIu - 2)
                  & (jju >= 1) & (jju <= NJu - 2))
        x_u = _chebyshev_iterate(urw[:, :NJu], cur, mask_u,
                                 scal[0][0, 0], scal[1][0, 0],
                                 scal[2][0, 0], degree)
        r_u = jnp.where(mask_u, cu.src - apply_stencil(x_u, cu), 0.0)

        # d_u needs faces gT .. gT+T inclusive (a_e reads d_u[i+1]);
        # keep only the two folded rows sets before v's assembly
        ap_u = cur.a_p[PAD: PAD + T + 1]  # relaxed diagonal, T+1 rows
        ii_u = jax.lax.broadcasted_iota(jnp.int32, (T + 1, ny), 0) + off
        d_u = jnp.where((ii_u >= 1) & (ii_u <= nx - 1), dy / ap_u, 0.0)

        # ---- v field ---------------------------------------------------
        cv = v_coefficients_window(
            uew[: X + 3, : ny + 2], vew[: X + 2, : ny + 3],
            pew[: X + 2, : ny + 2], gi0=gi0, gj0=0, nx=nx, ny=ny,
            dx=dx, dy=dy, rho=rho, mu=mu)  # (X, ny+1)
        cv_r = relax_coefficients(cv, vrw[:, : ny + 1], alpha)
        gmax_v = _ratio_max(
            jax.tree_util.tree_map(lambda a: a[PAD: PAD + T], cv),
            cv_r.a_p[PAD: PAD + T], 1, nx - 2, 1, ny - 1, ny + 1)

        iiv = gi0 + jax.lax.broadcasted_iota(jnp.int32, (X, NJv), 0)
        jjv = jax.lax.broadcasted_iota(jnp.int32, (X, NJv), 1)
        mask_v = ((iiv >= 1) & (iiv <= NIv - 2)
                  & (jjv >= 1) & (jjv <= NJv - 2))
        x_v = _chebyshev_iterate(vrw[:, :NJv], cv_r, mask_v,
                                 scal[3][0, 0], scal[4][0, 0],
                                 scal[5][0, 0], degree)
        r_v = jnp.where(mask_v, cv.src - apply_stencil(x_v, cv), 0.0)

        # ---- d_v + pressure-correction operator on the owned rows
        # (ops/pallas_assembly.py fold semantics, verbatim) --------------
        ap_v_rel = cv_r.a_p[PAD: PAD + T]
        jj_v = jax.lax.broadcasted_iota(jnp.int32, (T, ny + 1), 1)
        d_v = jnp.where((jj_v >= 1) & (jj_v <= ny - 1), dx / ap_v_rel, 0.0)
        d_u_m, d_v_m = d_u, d_v
        if poisson_variant == "consistent":
            jj_u = jax.lax.broadcasted_iota(jnp.int32, (T + 1, ny), 1)
            d_u_m = jnp.where((jj_u >= 1) & (jj_u <= ny - 2), d_u, 0.0)
            ii_v = jax.lax.broadcasted_iota(jnp.int32, (T, ny + 1), 0) + off
            d_v_m = jnp.where((ii_v >= 1) & (ii_v <= nx - 2), d_v, 0.0)
        a_e = rho * dy * d_u_m[1: T + 1, :]
        a_w = rho * dy * d_u_m[:T, :]
        a_n = rho * dx * d_v_m[:, 1: ny + 1]
        a_s = rho * dx * d_v_m[:, :ny]
        diag = jnp.zeros((T, ny), a_e.dtype)
        if poisson_variant == "reference":
            ii_p = jax.lax.broadcasted_iota(jnp.int32, (T, ny), 0) + off
            jj_p = jax.lax.broadcasted_iota(jnp.int32, (T, ny), 1)
            diag = (jnp.where(ii_p == 0, a_e, diag)
                    + jnp.where(ii_p == nx - 1, a_w, 0.0)
                    + jnp.where(jj_p == 0, a_n, 0.0)
                    + jnp.where(jj_p == ny - 1, a_s, 0.0))
            a_e = jnp.where(ii_p == 0, 0.0, a_e)
            a_w = jnp.where(ii_p == nx - 1, 0.0, a_w)
            a_n = jnp.where(jj_p == 0, 0.0, a_n)
            a_s = jnp.where(jj_p == ny - 1, 0.0, a_s)
        diag = diag + a_e + a_w + a_n + a_s

        # ---- write the owned T rows (window rows PAD .. PAD+T) ---------
        vals = (x_u[PAD: PAD + T, :NJu], r_u[PAD: PAD + T, :NJu],
                x_v[PAD: PAD + T, :NJv], r_v[PAD: PAD + T, :NJv],
                d_u[:T], d_v, a_e, a_w, a_n, a_s, diag,
                jnp.full((8, 128), gmax_u, x_u.dtype),
                jnp.full((8, 128), gmax_v, x_u.dtype))
        for o, val in zip(outs, vals):
            o[:] = val

    return kernel


def fused_asmcheby_pair(u, v, p, *, dx, dy, rho, mu, alpha, degree,
                        bounds_u, bounds_v, poisson_variant="consistent",
                        interpret: bool = False):
    """Assemble + Chebyshev-solve BOTH momentum fields in one strip-fused
    pass over (u, v, p) — the coefficient arrays never leave VMEM.

    ``u, v``: BC-applied staggered fields; ``bounds_u``/``bounds_v``:
    ``(theta, delta, sigma1)`` interval scalars (lagged — see module
    docstring).  Returns ``(u_star, r_u, v_star, r_v, d_u, d_v, pc,
    rho_u, rho_v)`` where the ``r`` fields are the unrelaxed residuals
    zeroed outside each field's interior norm region, ``pc`` is the
    5-point pressure-correction operator (:class:`~.poisson.PoissonCoeffs`),
    and ``rho_u/rho_v`` are the FRESH masked Gershgorin ratio maxima of
    this iteration's relaxed systems (the next iteration's bounds input).
    """
    from .poisson import PoissonCoeffs

    nxp1, ny = u.shape
    nx = nxp1 - 1
    T = _strip_rows_merged(nx, ny)
    X = T + 2 * PAD
    We = X + 8
    dt = u.dtype
    lane = _lane

    # halo-extended inputs (fused_assembly_pair layout: PAD+1 rows on
    # top so padded row r holds global row r-(PAD+1), one-ring column
    # extension, 128-aligned lane extents); the We-row windows need rows
    # to global gT+T+PAD+2 <= nx+PAD+2, i.e. a PAD+8 bottom pad
    u_e = jnp.pad(u, ((PAD + 1, PAD + 7), (1, lane(ny + 2) - ny - 1)))
    v_e = jnp.pad(v, ((PAD + 1, PAD + 8), (1, lane(ny + 3) - ny - 2)))
    p_e = jnp.pad(p, ((PAD + 1, PAD + 8), (1, lane(ny + 2) - ny - 1)))
    # raw-field windows (x0 + relaxation): padded row r holds global row
    # r - PAD; the X-row window at offset g*T covers [gT-PAD, gT+T+PAD)
    u_r = jnp.pad(u, ((PAD, PAD - 1), (0, lane(ny) - ny)))
    v_r = jnp.pad(v, ((PAD, PAD), (0, lane(ny + 1) - ny - 1)))

    f32 = jnp.float32
    scal = [jnp.reshape(jnp.asarray(sc, f32), (1, 1))
            for sc in (*bounds_u, *bounds_v)]

    n_strips = nx // T
    out_shapes = [
        jax.ShapeDtypeStruct((nx, ny), dt),       # u* (face row nx appended)
        jax.ShapeDtypeStruct((nx, ny), dt),       # r_u
        jax.ShapeDtypeStruct((nx, ny + 1), dt),   # v*
        jax.ShapeDtypeStruct((nx, ny + 1), dt),   # r_v
        jax.ShapeDtypeStruct((nx, ny), dt),       # d_u
        jax.ShapeDtypeStruct((nx, ny + 1), dt),   # d_v
    ] + [jax.ShapeDtypeStruct((nx, ny), dt)] * 5 \
      + [jax.ShapeDtypeStruct((8 * n_strips, 128), dt)] * 2
    spec_c = pl.BlockSpec((T, ny), lambda g: (g, 0))
    spec_f = pl.BlockSpec((T, ny + 1), lambda g: (g, 0))
    out_specs = [spec_c, spec_c, spec_f, spec_f, spec_c, spec_f] \
        + [spec_c] * 5 + [pl.BlockSpec((8, 128), lambda g: (g, 0))] * 2
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _mk_kernel(nx, ny, T, dx, dy, rho, mu, alpha, degree,
                   poisson_variant),
        grid=(n_strips,),
        out_shape=out_shapes,
        in_specs=[any_spec] * 5 + [vmem] * 6,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((We, lane(ny + 2)), dt),
                        pltpu.VMEM((We, lane(ny + 3)), dt),
                        pltpu.VMEM((We, lane(ny + 2)), dt),
                        pltpu.VMEM((X, lane(ny)), dt),
                        pltpu.VMEM((X, lane(ny + 1)), dt),
                        pltpu.SemaphoreType.DMA((5,))],
        compiler_params=kernel_params(),
        interpret=interpret,
    )(u_e, v_e, p_e, u_r, v_r, *scal)

    (us, ru, vs, rv, du_s, d_v, pe, pw, pn, ps, pdiag, gu, gv) = outs
    # the never-solved last u face row (I = nx): boundary-held, residual-
    # masked, d zeroed (ops/powerlaw.d_coefficient semantics)
    zrow = jnp.zeros((1, ny), dt)
    u_star = jnp.concatenate([us, u[nx: nx + 1]], 0)
    r_u = jnp.concatenate([ru, zrow], 0)
    d_u = jnp.concatenate([du_s, zrow], 0)
    pc = PoissonCoeffs(a_e=pe, a_w=pw, a_n=pn, a_s=ps, diag=pdiag)
    return (u_star, r_u, vs, rv, d_u, d_v, pc,
            jnp.max(gu), jnp.max(gv))
