"""Strip-fused momentum coefficient assembly for large grids.

``profile_phases.py`` at 1024^2 measured the power-law assembly+relaxation
of both momentum fields at 0.64 ms/iteration against a ~0.1 ms streaming
roofline (read u, v, p once; write the coefficient sets once): XLA
materializes the flux/diffusion intermediates in HBM.  This kernel
processes the grid in T-row strips; each strip DMAs its u/v/p window into
VMEM once and evaluates the ENTIRE assembly — fluxes, power-law A, the
Practice-B boundary folds, and the Patankar relaxation for BOTH fields —
on the resident tile, writing only the 16 coefficient arrays.

The per-tile math is the *verified window-form assembly* of
``ops/windowed.py`` (global-index masks; bit-compatible with the global
``ops/powerlaw.py`` assembly, pinned by ``tests/test_windowed.py``) —
the same functions the distributed step runs under shard_map, here traced
inside a Pallas kernel over DMA'd windows.

Mosaic-dictated layout choices:

* The one-ring column extension (zero columns at the physical y-walls)
  is applied in XLA BEFORE the call — in-kernel lane-dimension
  ``concatenate`` of a width-1 zero block fails to lower ("result/input
  offset mismatch on non-concat dimension"); in-kernel lane *slices*
  (which the window-form assembly uses internally) lower fine, as the
  whole-step kernel (``pallas_step``) already relies on.
* Rows are zero-padded by PAD+1 = 17 on top so the in-window row slices
  the halo-extended forms need start at sublane-aligned offsets, and
  every strip's DMA window starts at the aligned row ``g*T``.
* The relaxation fields (the raw u/v strip blocks) are DMA'd separately
  from the unpadded arrays at the same aligned offsets.

Outputs per field: shared neighbor links (a_e, a_w, a_n, a_s), the
unrelaxed (a_p, src) pair (consumed by the outer residual), and the
relaxed (a_p, src) pair (consumed by the inner solve) — relaxation only
modifies a_p/src, so the links are emitted once.  The u-grid's last face
row (I = nx, never solved, all links zero) is appended in XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .stencil import StencilCoeffs

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

from .pallas_mg import kernel_params

PAD = 16  # >= the 1-ring halo; keeps DMA offsets and row slices aligned


# Window cap in cells ((T + 2*PAD) * lane-padded ny).  The assembly traces
# ~20 live (T+2, ny) temporaries through Mosaic's liveness stack, so its
# budget is tighter than the smoothing strips'.  96k cells was the
# empirical bound against the DEFAULT 16 MiB scoped-VMEM stack; the
# hardware re-probe under the raised 64 MiB per-kernel limit
# (benchmarks/assembly_cap_probe.py, CYCLE_TIMING kind=assembly-cap,
# TPU v5e 2026-08-19) measured, bit-exact vs the XLA assembly at every
# admitted T: 2048^2 T=16 1.098 -> T=128 0.666 ms/assembly; 4096^2
# excluded -> T=64 3.596 ms.  656k (T=128 at 4096^2) fails to compile
# (tpu_compile_helper OOM), so the cap stays at the largest size that
# compiled everywhere: 384k = exactly the 4096^2 T=64 window.
_CAP_CELLS = 384 * 1024

# The FOLDED kernel (poisson_variant set: 25 outputs — the production
# configuration at every large grid) carries more live state:
# at 2048^2 T=128 (348k window cells) the compiler measured a 66.12 MiB
# scoped allocation against the 64 MiB limit (~190 B/window-cell), so the
# folded variant gets its own cap: 280k cells ~ 53 MiB estimated, which
# admits T=64 at 2048^2 (209k) and T=32 at 4096^2 (270k) — both verified
# compiling + winning on hardware (CYCLE_TIMING kind=gersh-fold /
# assembly-cap rows, 2026-08-19).
_CAP_CELLS_FOLDED = 280 * 1024


def _strip_rows_assembly(nx: int, ny: int, folded: bool = False) -> int:
    """Largest strip height whose window fits the assembly VMEM budget."""
    cap = _CAP_CELLS_FOLDED if folded else _CAP_CELLS
    for T in (128, 64, 32, 16):
        if nx % T == 0 and (T + 2 * PAD) * ny <= cap:
            return T
    return 0


def supports_fused_assembly(nx, ny, scheme, dtype, backend) -> bool:
    """Gate: TPU auto/pallas backend, power-law scheme, f32, big grids
    (the latency-bound <=255^2 regime is served by the whole-step kernel;
    odd vertex grids are fine — only row counts matter)."""
    if not HAVE_PALLAS or backend not in ("auto", "pallas"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if scheme != "power_law" or dtype != jnp.float32:
        return False
    if nx < 384 or ny < 256:
        return False
    # gate on the folded budget: the production callers fold bounds +
    # the poisson operator, and a True here must hold for them too
    return _strip_rows_assembly(nx, ny, folded=True) > 0


def _mk_kernel(nx, ny, T, dx, dy, rho, mu, alpha, poisson_variant=None):
    from ..ops.powerlaw import relax_coefficients
    from ..ops.windowed import u_coefficients_window, v_coefficients_window

    W = T + 2 * PAD
    n_out = 18 if poisson_variant is None else 25

    def kernel(ue_h, ve_h, pe_h, u_h, v_h, *refs):
        outs = refs[:n_out]
        uew, vew, pew, ufw, vfw, sems = refs[n_out:]
        g = pl.program_id(0)
        off = pl.multiple_of(g * T, 16)
        dmas = []
        for i, (src, dst) in enumerate((
                (ue_h, uew), (ve_h, vew), (pe_h, pew),
                (u_h, ufw), (v_h, vfw))):
            dma = pltpu.make_async_copy(src.at[pl.ds(off, dst.shape[0])],
                                        dst, sems.at[i])
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()
        # padded row r holds global row r - (PAD+1); strip g owns global
        # rows [gT, gT+T).  Halo-extended forms (ops/windowed.py layout;
        # columns pre-extended in XLA):
        #   u_ext (T+3, ny+2): faces gT-1 .. gT+T+1 -> rows [16, T+19)
        #   v_ext (T+2, ny+3): cells gT-1 .. gT+T   -> rows [16, T+18)
        #   p_ext (T+2, ny+2)
        # lane dims are 128-padded for the DMA (Mosaic requires sliced
        # copies to have 128-aligned lane extents); crop after load
        u_ext = uew[PAD: PAD + T + 3, : ny + 2]
        v_ext = vew[PAD: PAD + T + 2, : ny + 3]
        p_ext = pew[PAD: PAD + T + 2, : ny + 2]
        cu_w = u_coefficients_window(
            u_ext, v_ext, p_ext, gi0=off, gj0=0, nx=nx, ny=ny,
            dx=dx, dy=dy, rho=rho, mu=mu)
        # drop the duplicated trailing face row (next strip's first face;
        # kept in cu_w for the folded d_u/a_e build below)
        cu = jax.tree_util.tree_map(lambda a: a[:T], cu_w)
        cur = relax_coefficients(cu, ufw[:, :ny], alpha)

        cv = v_coefficients_window(
            u_ext, v_ext, p_ext, gi0=off, gj0=0, nx=nx, ny=ny,
            dx=dx, dy=dy, rho=rho, mu=mu)
        cv_r = relax_coefficients(cv, vfw[:, : ny + 1], alpha)

        # Gershgorin-ratio partial max of the two RELAXED systems, masked
        # to each field's solve mask (solvers/momentum._chebyshev_bounds
        # semantics) — folding the max here, while the coefficients are
        # VMEM-resident, kills two five-array HBM reads plus two global
        # reduction barriers per outer iteration on the Chebyshev-momentum
        # path (round-5 step-part attribution: the 1024^2 step is
        # latency-bound; see ROADMAP item 6).  max is an exact reduction,
        # so the folded bound is bit-identical to the XLA one up to the
        # elementwise FMA contraction of the ratio itself.
        def _ratio_max(c_un_s, ap_rel, lo_i, hi_i, lo_j, hi_j, ncol):
            ii = jax.lax.broadcasted_iota(jnp.int32, (T, ncol), 0) + off
            jj = jax.lax.broadcasted_iota(jnp.int32, (T, ncol), 1)
            m = ((ii >= lo_i) & (ii <= hi_i) & (jj >= lo_j) & (jj <= hi_j))
            safe = jnp.where(ap_rel == 0, jnp.ones_like(ap_rel), ap_rel)
            nb = (jnp.abs(c_un_s.a_e) + jnp.abs(c_un_s.a_w)
                  + jnp.abs(c_un_s.a_n) + jnp.abs(c_un_s.a_s))
            return jnp.max(jnp.where(m, nb / safe, 0.0))

        gmax_u = _ratio_max(cu, cur.a_p, 1, nx - 1, 1, ny - 2, ny)
        gmax_v = _ratio_max(cv, cv_r.a_p, 1, nx - 2, 1, ny - 1, ny + 1)

        vals = (cu.a_e, cu.a_w, cu.a_n, cu.a_s, cu.a_p, cu.src,
                cur.a_p, cur.src,
                cv.a_e, cv.a_w, cv.a_n, cv.a_s, cv.a_p, cv.src,
                cv_r.a_p, cv_r.src,
                jnp.full((8, 128), gmax_u, cu.a_p.dtype),
                jnp.full((8, 128), gmax_v, cu.a_p.dtype))

        if poisson_variant is not None:
            # d-coefficients + pressure-correction operator, folded while
            # the relaxed diagonals are VMEM-resident (ROADMAP #6 step-glue
            # item).  d semantics: ops/powerlaw.d_coefficient (zero on the
            # unsolved boundary rows/cols); pc semantics:
            # ops/poisson.poisson_coefficients — every boundary zero of pc
            # falls out of d's own masking (d_u[0]=d_u[nx]=0 covers the
            # a_w/a_e pads, d_v cols 0/ny the a_s/a_n pads), so the folded
            # arrays are bit-identical to the XLA build up to FMA
            # contraction.  The u-face window carries the duplicated row
            # gT+T, giving a_e its d_u[i+1] read without cross-strip halo.
            ap_u = cu_w.a_p  # uncropped: rows gT .. gT+T (T+1 rows)
            ap_u_rel = jnp.where(jnp.abs(ap_u) > 1e-12, ap_u, 1e-12) / alpha
            ii_u = (jax.lax.broadcasted_iota(jnp.int32, (T + 1, ny), 0)
                    + off)
            d_u = jnp.where((ii_u >= 1) & (ii_u <= nx - 1), dy / ap_u_rel,
                            0.0)
            ap_v_rel = cv_r.a_p
            jj_v = jax.lax.broadcasted_iota(jnp.int32, (T, ny + 1), 1)
            d_v = jnp.where((jj_v >= 1) & (jj_v <= ny - 1), dx / ap_v_rel,
                            0.0)
            d_u_m, d_v_m = d_u, d_v
            if poisson_variant == "consistent":
                jj_u = jax.lax.broadcasted_iota(jnp.int32, (T + 1, ny), 1)
                d_u_m = jnp.where((jj_u >= 1) & (jj_u <= ny - 2), d_u, 0.0)
                ii_v = (jax.lax.broadcasted_iota(jnp.int32, (T, ny + 1), 0)
                        + off)
                d_v_m = jnp.where((ii_v >= 1) & (ii_v <= nx - 2), d_v, 0.0)
            a_e = rho * dy * d_u_m[1: T + 1, :]
            a_w = rho * dy * d_u_m[:T, :]
            a_n = rho * dx * d_v_m[:, 1: ny + 1]
            a_s = rho * dx * d_v_m[:, :ny]
            diag = jnp.zeros((T, ny), a_e.dtype)
            if poisson_variant == "reference":
                ii_p = (jax.lax.broadcasted_iota(jnp.int32, (T, ny), 0)
                        + off)
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
            vals = vals + (d_u[:T], d_v, a_e, a_w, a_n, a_s, diag)

        for o, val in zip(outs, vals):
            o[:] = val

    return kernel


def fused_assembly_pair(u, v, p, *, dx, dy, rho, mu, alpha,
                        interpret: bool = False, with_bounds: bool = False,
                        poisson_variant: str | None = None):
    """Both momentum fields' (unrelaxed, relaxed) coefficient sets in one
    strip-fused pass over u, v, p.  Returns ``(cu_un, cu_rel, cv_un,
    cv_rel)`` equal to ``u_momentum_coefficients`` / ``relax_coefficients``
    (and the v counterparts) up to FMA contraction.

    ``with_bounds=True`` appends ``(rho_u, rho_v)``: the masked Gershgorin
    ratio maxima ``max |a_nb|/a_p`` of the two RELAXED systems (the raw
    input of ``solvers/momentum._bounds_from_rho``), folded into the
    kernel so the Chebyshev momentum path skips its per-field five-array
    read + global max barrier.  The same compiled kernel serves both
    flags (the two (8,128) bound tiles are always emitted; discarding
    them is free).

    ``poisson_variant``: when set ('consistent'/'symmetric'/'reference'),
    additionally fold the momentum d-coefficients and the 5-point
    pressure-correction operator (``ops/poisson.poisson_coefficients``)
    into the same pass, returning ``(..., d_u, d_v, pc)`` — the step-glue
    arrays the SIMPLE/SIMPLER/PISO bodies otherwise rebuild from HBM."""
    nxp1, ny = u.shape
    nx = nxp1 - 1
    # the Gershgorin bound tiles are in the kernel for BOTH with_bounds
    # settings (discarding them is free), so only the poisson fold's 7
    # extra outputs change the liveness class
    T = _strip_rows_assembly(nx, ny, folded=poisson_variant is not None)
    W = T + 2 * PAD
    # rows: PAD+1 on top (so the gT-1 halo row sits at the aligned
    # in-window offset PAD), enough at the bottom for the last window
    # [nx-T, nx-T+W); columns: the one-ring zero extension
    lane = lambda n: (-(-n // 128)) * 128  # DMA lane extents must be
    # 128-aligned, so the column-extended arrays are lane-padded too
    u_e = jnp.pad(u, ((PAD + 1, PAD - 1), (1, lane(ny + 2) - ny - 1)))
    v_e = jnp.pad(v, ((PAD + 1, PAD), (1, lane(ny + 3) - ny - 2)))
    p_e = jnp.pad(p, ((PAD + 1, PAD), (1, lane(ny + 2) - ny - 1)))
    u_f = jnp.pad(u, ((0, 0), (0, lane(ny) - ny)))
    v_f = jnp.pad(v, ((0, 0), (0, lane(ny + 1) - ny - 1)))
    dt = u.dtype

    n_strips = nx // T
    out_shapes = ([jax.ShapeDtypeStruct((nx, ny), dt)] * 8
                  + [jax.ShapeDtypeStruct((nx, ny + 1), dt)] * 8
                  + [jax.ShapeDtypeStruct((8 * n_strips, 128), dt)] * 2)
    out_specs = ([pl.BlockSpec((T, ny), lambda g: (g, 0))] * 8
                 + [pl.BlockSpec((T, ny + 1), lambda g: (g, 0))] * 8
                 + [pl.BlockSpec((8, 128), lambda g: (g, 0))] * 2)
    if poisson_variant is not None:
        # d_u (nx, ny: the zero face row nx is appended in XLA), d_v,
        # then the five pc arrays
        out_shapes += ([jax.ShapeDtypeStruct((nx, ny), dt),
                        jax.ShapeDtypeStruct((nx, ny + 1), dt)]
                       + [jax.ShapeDtypeStruct((nx, ny), dt)] * 5)
        out_specs += ([pl.BlockSpec((T, ny), lambda g: (g, 0)),
                       pl.BlockSpec((T, ny + 1), lambda g: (g, 0))]
                      + [pl.BlockSpec((T, ny), lambda g: (g, 0))] * 5)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    outs = pl.pallas_call(
        _mk_kernel(nx, ny, T, dx, dy, rho, mu, alpha,
                   poisson_variant=poisson_variant),
        grid=(nx // T,),
        out_shape=out_shapes,
        in_specs=[any_spec] * 5,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((W, lane(ny + 2)), dt),
                        pltpu.VMEM((W, lane(ny + 3)), dt),
                        pltpu.VMEM((W, lane(ny + 2)), dt),
                        pltpu.VMEM((T, lane(ny)), dt),
                        pltpu.VMEM((T, lane(ny + 1)), dt),
                        pltpu.SemaphoreType.DMA((5,))],
        compiler_params=kernel_params(),
        interpret=interpret,
    )(u_e, v_e, p_e, u_f, v_f)

    # append the never-solved last u-face row (I = nx): links and the
    # unrelaxed pair are zero; relaxation floors a_p at 1e-12
    zrow = jnp.zeros((1, ny), dt)
    ap_last = jnp.full((1, ny), 1e-12 / alpha, dt)
    src_last = (1.0 - alpha) * ap_last * u[nx:nx + 1]
    (ue, uw_, un, us, upn, usrc, upr, usrcr,
     ve, vw_, vn, vs, vpn, vsrc, vpr, vsrcr, gu, gv), rest = (
        outs[:18], outs[18:])
    cat = lambda a, last: jnp.concatenate([a, last], 0)
    cu_un = StencilCoeffs(a_e=cat(ue, zrow), a_w=cat(uw_, zrow),
                          a_n=cat(un, zrow), a_s=cat(us, zrow),
                          a_p=cat(upn, zrow), src=cat(usrc, zrow))
    cu_rel = StencilCoeffs(a_e=cu_un.a_e, a_w=cu_un.a_w, a_n=cu_un.a_n,
                           a_s=cu_un.a_s, a_p=cat(upr, ap_last),
                           src=cat(usrcr, src_last))
    cv_un = StencilCoeffs(a_e=ve, a_w=vw_, a_n=vn, a_s=vs, a_p=vpn,
                          src=vsrc)
    cv_rel = StencilCoeffs(a_e=ve, a_w=vw_, a_n=vn, a_s=vs, a_p=vpr,
                           src=vsrcr)
    out = (cu_un, cu_rel, cv_un, cv_rel)
    if with_bounds:
        # the appended u face row (a_p floor, zero links) is outside the
        # solve mask, so the strip maxima already cover the full arrays
        out = out + (jnp.max(gu), jnp.max(gv))
    if poisson_variant is not None:
        from .poisson import PoissonCoeffs

        du_s, dv, pe, pw, pn, ps, pdiag = rest
        # the face row I = nx is never solved: d_coefficient zeroes it
        d_u = jnp.concatenate([du_s, jnp.zeros((1, ny), dt)], 0)
        pc = PoissonCoeffs(a_e=pe, a_w=pw, a_n=pn, a_s=ps, diag=pdiag)
        out = out + (d_u, dv, pc)
    return out
