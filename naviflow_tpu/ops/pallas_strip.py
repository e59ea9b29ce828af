"""Temporal-blocking strip kernels for bandwidth-bound fine multigrid
levels (the round-2 verdict's top-next item: tile-resident multi-sweep
smoothing at 1024^2-4096^2).

The fused whole-hierarchy kernels (``ops/pallas_mg.py``) win the
latency-bound regime (<= 255^2) by eliminating dispatches, but cannot hold
a 1024^2 hierarchy in VMEM.  At those sizes the cost is HBM streaming: an
XLA V-cycle's fine level reads p, b and the five stencil arrays from HBM
for EVERY half-sweep — pre-smoothing(2 sweeps = 4 halves) + residual +
restriction stream ~35 array passes per cycle.

These kernels convert k dependent sweeps from k array reads into ~1: the
fine level is processed in row strips of ``T`` rows with an ``H``-row halo
(``H = 16`` covers 2 sweeps x 2 half-sweeps + residual + alignment);
each strip DMAs p, b and the stencil into VMEM once, runs ALL the
smoothing half-sweeps, the residual, and the restriction (down) or the
prolongation-correction and post-smoothing (up) on the VMEM-resident
tile, and writes only the T owned rows back.  Redundant compute at the
overlaps is 2H/T (~25% at T=128) — cheap against an ~7x cut in fine-level
HBM traffic.

Exactness: each half-sweep invalidates one row at each interior window
edge (the window's wrap-around rolls read the opposite window edge, not
the true neighbor).  The halo absorbs it: pre = 4 halves + residual = 5
rows consumed < H = 16; the up-kernel's local-clamped row prolongation is
exact everywhere except the outermost window row, also inside the slop
(and AT physical edges the local clamp IS the global clamp).  Row
transfers use small static locally-clamped factors on the MXU; COLUMN
transfers run outside in XLA on the half-height coarse intermediates — a
global column-factor matrix is O(ny^2) of VMEM (8 MB at 2048^2, measured
stack OOM).  Agreement with the XLA path is pinned to ~1 ULP
per cycle by ``tests/test_pallas_strip.py``.

Both level flavors are stripped: the five-point finest level (red-black
halves) and 9-point Galerkin levels (4-color quarters, live corner
links) — at a 1024^2 problem that covers levels 0 and 1 of the peel,
with the sub-256^2 tail running as the whole-hierarchy fused kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stencil9 import Stencil9

try:  # pallas is TPU-only at lowering time; import is safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

from .pallas_mg import _inv_diag, apply9v, kernel_params, mm

# Halo rows per side.  Correctness needs 5 (2 sweeps x 2 halves +
# residual); 16 is chosen for ALIGNMENT: window offsets are then
# multiples of 16, so the up-kernel's coarse-grid DMA offset off//2 is
# 8-aligned — Mosaic requires provable (8,128)-tile alignment on every
# sliced sublane offset.
H = 16

# Window cap in cells (W * ny), per stencil family.  Originally an
# EMPIRICAL proxy for Mosaic's default 16 MiB scoped-VMEM stack (the
# 7-array five-point kernel: W=160 x ny=1024 ~12-13 MB compiled; W=96 x
# ny=2048 allocated 19.2 MB and OOM'd the 16 MB scope; the kernel's live
# set is the scratch arrays plus ~2.5x in sweep temporaries).  The
# kernels now raise the per-kernel limit to KERNEL_VMEM_LIMIT_BYTES
# (pallas_mg.kernel_params — the 16 MB default is a compiler budget, not
# the v5e's 128 MiB capacity), which admits ~4x the window: the caps
# below keep the same ~2.5x-liveness safety ratio against the raised
# ceiling.  This un-gates the interleaved strips at 4096^2 (W=128+32
# rows x 4096 lanes = 655k cells).  Nine-point levels carry 11 arrays +
# corner-roll temporaries — ~60% of the five-point budget.
_CAP_FIVE = 656 * 1024
_CAP_NINE = 384 * 1024


def _strip_rows(nx: int, ny: int, five: bool = True) -> int:
    """Largest strip height T (multiple of 16, <= nx/2) whose window fits
    the scoped-VMEM budget; 0 if none does."""
    cap = _CAP_FIVE if five else _CAP_NINE
    for T in (256, 128, 64, 32, 16):
        if T + 2 * H > nx or nx % T:
            continue
        if (T + 2 * H) * ny <= cap:
            return T
    return 0


def supports_strip(nx: int, ny: int, five_point: bool, cfg, dtype) -> bool:
    """Gate: big even square level, GS smoothing (red-black on five-point
    levels, 4-color on Galerkin 9-point levels) with <= 2 pre/post sweeps,
    cell-centered transfers, f32."""
    if not HAVE_PALLAS or dtype != jnp.float32:
        return False
    if nx != ny or nx % 2:
        return False
    if (cfg.smoother != "gs" or cfg.pre_smoothing > 2
            or cfg.post_smoothing > 2
            or getattr(cfg, "smoother_dtype", "float32") != "float32"):
        return False
    if cfg.restriction != "full_weighting" or cfg.prolongation != "linear":
        return False
    return _strip_rows(nx, ny, five_point) > 0


@functools.lru_cache(maxsize=32)
def _cc_row_restrict(Tc: int, T: int):
    """(Tc, T) static 2-row-mean restriction factor."""
    R = np.zeros((Tc, T), np.float32)
    I = np.arange(Tc)
    R[I, 2 * I] = 0.5
    R[I, 2 * I + 1] = 0.5
    return R


@functools.lru_cache(maxsize=32)
def _cc_row_prolong(W: int, Wc: int):
    """(W, Wc) static clamped bilinear row prolongation (the clamped rows
    are exact at physical edges and fall inside the halo slop at interior
    windows — see module docstring)."""
    P = np.zeros((W, Wc), np.float32)
    I = np.arange(Wc)
    P[2 * I, I] += 0.75
    P[2 * I, np.maximum(I - 1, 0)] += 0.25
    P[2 * I + 1, I] += 0.75
    P[2 * I + 1, np.minimum(I + 1, Wc - 1)] += 0.25
    return P


def _smooth_window(p, b, S, ii, jj, omega, n_sweeps):
    """GS sweeps on the VMEM-resident window: red-black halves on
    five-point levels (len(S) == 5), 4-color quarters on Galerkin 9-point
    levels — mirroring ``_rb2_sweep`` / ``gs4_sweep``.

    The sweeps are VPU-compute-bound (BENCHMARKS.md round-3b), so the
    update is algebraically re-associated to minimize per-cell ops: the
    stencil is diagonal-normalized ONCE per kernel invocation
    (``p_new = b_hat - sum(link_hat * neighbor)``, saving the per-color
    ``c*p`` recompute and the ``*invc``), and the ``omega == 1`` blend is
    specialized away.  Same fixed point and smoothing factor as the XLA
    sweeps; rounding differs by a few ULPs (iteration-count parity pinned
    on hardware by ``benchmarks/strip_parity_check.py``).
    """
    from .pallas_mg import _roll

    invc = _inv_diag(S)
    bh = b * invc
    Lh = [x * invc for x in S[1:]]

    def gauss(p, color):
        off = (
            Lh[0] * _roll(p, -1, 0)
            + Lh[1] * _roll(p, 1, 0)
            + Lh[2] * _roll(p, -1, 1)
            + Lh[3] * _roll(p, 1, 1)
        )
        if len(S) == 9:
            off = off + (
                Lh[4] * _roll(_roll(p, -1, 0), -1, 1)
                + Lh[5] * _roll(_roll(p, 1, 0), -1, 1)
                + Lh[6] * _roll(_roll(p, -1, 0), 1, 1)
                + Lh[7] * _roll(_roll(p, 1, 0), 1, 1)
            )
        p_new = bh - off
        if omega != 1.0:
            p_new = p + omega * (p_new - p)
        return jnp.where(color, p_new, p)

    if len(S) == 5:
        red = (ii + jj) % 2 == 0
        colors = [red, jnp.logical_not(red)]
    else:
        colors = [((ii % 2) == a) & ((jj % 2) == bb)
                  for a in range(2) for bb in range(2)]
    for _ in range(n_sweeps):
        for color in colors:
            p = gauss(p, color)
    return p


def _window(nx, T, g):
    W = T + 2 * H
    off = jnp.clip(g * T - H, 0, nx - W)
    # every term is a multiple of 16 (T, H multiples of 16), but Mosaic
    # cannot prove it through the clip; sublane loads need the hint
    s0 = pl.multiple_of(g * T - off, 8)
    return pl.multiple_of(off, 16), s0


def _mk_down_kernel(nx, ny, T, ns, pre, omega):
    W = T + 2 * H

    def kernel(*refs):
        hbm = refs[:2 + ns]          # p, b, stencil entries
        rloc_ref = refs[2 + ns]
        p_out, rr_out = refs[3 + ns: 5 + ns]
        scratch = refs[5 + ns: 7 + 2 * ns]
        sems = refs[7 + 2 * ns]
        pw, bw = scratch[0], scratch[1]
        g = pl.program_id(0)
        off, s0 = _window(nx, T, g)
        dmas = []
        for i, (src, dst) in enumerate(zip(hbm, scratch)):
            dma = pltpu.make_async_copy(src.at[pl.ds(off, W)], dst,
                                        sems.at[i])
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()
        S = tuple(r[:] for r in scratch[2:])
        b = bw[:]
        ii = off + jax.lax.broadcasted_iota(jnp.int32, (W, ny), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (W, ny), 1)
        p = _smooth_window(pw[:], b, S, ii, jj, omega, pre)
        r = b - apply9v(p, S)
        # Mosaic has no value-level dynamic_slice: round-trip through the
        # (now-consumed) input scratch refs and load a pl.ds window
        pw[:] = p
        p_out[:] = pw[pl.ds(s0, T), :]
        bw[:] = r
        # rows restricted here (small static factor on the MXU); the
        # COLUMN restriction runs outside in XLA — a global column-factor
        # matmul would put an O(ny^2) constant in VMEM (8 MB at 2048,
        # measured stack OOM), while the XLA transpose-sandwich pass on
        # the half-height intermediate costs ~2 reads of a half array
        rr_out[:] = mm(rloc_ref[:], bw[pl.ds(s0, T), :])

    return kernel


def _mk_up_kernel(nx, ny, T, ns, post, omega):
    W = T + 2 * H
    Wc = W // 2

    def kernel(*refs):
        hbm = refs[:2 + ns]
        ec2_h = refs[2 + ns]
        ploc_ref = refs[3 + ns]
        p_out = refs[4 + ns]
        scratch = refs[5 + ns: 7 + 2 * ns]
        ecw = refs[7 + 2 * ns]
        sems = refs[8 + 2 * ns]
        pw, bw = scratch[0], scratch[1]
        g = pl.program_id(0)
        off, s0 = _window(nx, T, g)
        dmas = []
        for i, (src, dst) in enumerate(zip(hbm, scratch)):
            dma = pltpu.make_async_copy(src.at[pl.ds(off, W)], dst,
                                        sems.at[i])
            dma.start()
            dmas.append(dma)
        co = pl.multiple_of(off // 2, 8)  # 8-aligned because off is 16-aligned
        dma_c = pltpu.make_async_copy(ec2_h.at[pl.ds(co, Wc)], ecw,
                                      sems.at[2 + ns])
        dma_c.start()
        for dma in dmas:
            dma.wait()
        dma_c.wait()
        S = tuple(r[:] for r in scratch[2:])
        b = bw[:]
        # coarse correction: columns were prolonged OUTSIDE in XLA (see
        # down kernel's rationale); here only the local-clamped row
        # prolongation (small static factor on the MXU)
        ef = mm(ploc_ref[:], ecw[:])
        p = pw[:] + ef
        ii = off + jax.lax.broadcasted_iota(jnp.int32, (W, ny), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (W, ny), 1)
        p = _smooth_window(p, b, S, ii, jj, omega, post)
        pw[:] = p  # Mosaic has no value-level dynamic_slice (see down kernel)
        p_out[:] = pw[pl.ds(s0, T), :]

    return kernel


def _st_arrays(st: Stencil9, five: bool):
    if five:
        return [st.c, st.e, st.w, st.n, st.s]
    return [st.c, st.e, st.w, st.n, st.s, st.ne, st.nw, st.se, st.sw]


def strip_down(p, b, st: Stencil9, cfg, five: bool = True, *,
               interpret: bool = False):
    """Pre-smooth (``cfg.pre_smoothing`` GS sweeps) + residual +
    cell-centered restriction of a (five- or nine-point) level,
    strip-blocked.  Returns ``(p_smoothed, r_coarse)``; replaces the XLA
    sequence ``_smooth; r = b - apply; restrict_cc(r)``."""
    from .transfer_cc import _restrict_ax0

    nx, ny = p.shape
    nxc = nx // 2
    ns = 5 if five else 9
    T = _strip_rows(nx, ny, five)
    W = T + 2 * H
    inputs = [p, b] + _st_arrays(st, five) + [
        jnp.asarray(_cc_row_restrict(T // 2, T))]
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    p_sm, rr = pl.pallas_call(
        _mk_down_kernel(nx, ny, T, ns, cfg.pre_smoothing, cfg.omega),
        grid=(nx // T,),
        out_shape=[jax.ShapeDtypeStruct((nx, ny), p.dtype),
                   jax.ShapeDtypeStruct((nxc, ny), p.dtype)],
        in_specs=[any_spec] * (2 + ns) + [vmem],
        out_specs=[pl.BlockSpec((T, ny), lambda g: (g, 0)),
                   pl.BlockSpec((T // 2, ny), lambda g: (g, 0))],
        scratch_shapes=[pltpu.VMEM((W, ny), p.dtype) for _ in range(2 + ns)]
        + [pltpu.SemaphoreType.DMA((2 + ns,))],
        compiler_params=kernel_params(),
        interpret=interpret,
    )(*inputs)
    # column restriction in XLA on the half-height intermediate
    return p_sm, _restrict_ax0(rr.T).T


def strip_up(p, b, st: Stencil9, ec, cfg, five: bool = True, *,
             interpret: bool = False):
    """Prolongated coarse correction + post-smoothing of a (five- or
    nine-point) level, strip-blocked.  Replaces
    ``p + prolong_cc(ec); _smooth(post)``."""
    from .transfer_cc import _prolong_ax0

    nx, ny = p.shape
    ns = 5 if five else 9
    T = _strip_rows(nx, ny, five)
    W = T + 2 * H
    # column prolongation in XLA (clamped bilinear sandwich); the kernel
    # adds only the row prolongation
    ec2 = _prolong_ax0(ec.T).T
    inputs = [p, b] + _st_arrays(st, five) + [
        ec2, jnp.asarray(_cc_row_prolong(W, W // 2))]
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mk_up_kernel(nx, ny, T, ns, cfg.post_smoothing, cfg.omega),
        grid=(nx // T,),
        out_shape=jax.ShapeDtypeStruct((nx, ny), p.dtype),
        in_specs=[any_spec] * (3 + ns) + [vmem],
        out_specs=pl.BlockSpec((T, ny), lambda g: (g, 0)),
        scratch_shapes=[pltpu.VMEM((W, ny), p.dtype) for _ in range(2 + ns)]
        + [pltpu.VMEM((W // 2, ny), p.dtype),
           pltpu.SemaphoreType.DMA((3 + ns,))],
        compiler_params=kernel_params(),
        interpret=interpret,
    )(*inputs)
