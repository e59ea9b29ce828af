"""Strip-blocked Pallas kernels for the PLANE-resident fine level.

The round-3 verdict's large-grid gap (#3): at 4096^2 the interleaved
strip kernels (``ops/pallas_strip.py``) are gated off — their smallest
legal window, (16 + 32 rows) x 4096 lanes = 197k cells, exceeds the
~160k-cell empirical Mosaic scoped-VMEM cap — so the fine level fell
back to XLA (round-4 shootout, LAYOUT_SHOOTOUT.jsonl: 20-30 ms/cycle).
The color-plane layout (``ops/plane.py``) halves the array width:
at 4096^2 the planes are 4096 x 2048, and a strip window fits again.

These kernels run the plane-form fine-level down pass (pre-smoothing +
residual + cell-centered restriction) and up pass (prolonged correction
+ post-smoothing) as ONE kernel launch each, with both color planes
VMEM-resident per strip:

* down: DMA the R/B windows plus the diagonal-normalized stencil planes
  (``PlaneStencil5``), run the red-black half-sweeps in VMEM (each
  half-sweep touches exactly the cells it updates — no color masks),
  form the residual in normalized form ``r = c * (bh - p - sum(link_hat
  * neighbor))``, and row-restrict on the MXU; the restriction output is
  already the STANDARD-layout coarse grid (row-pair sums only — the
  plane layout needs no column transfer pass at all, unlike the
  interleaved strips' XLA column sandwich).
* up: the column+row prolongation runs OUTSIDE in XLA
  (``plane_prolong_cc`` — one pass over half-size arrays); the kernel
  adds the correction planes and post-smooths.

Halo accounting (down, pre=2): each half-sweep invalidates one window-
edge row (wrapped sublane rolls read the opposite window edge); 2
sweeps = 4 half-sweeps + the residual consume 5 rows < H = 8.  Lane
rolls (the n/s neighbors in plane space) stay inside the full row, so
the lane dimension needs NO halo — wraps at the lane edges are physical
domain edges, annihilated by the zero boundary links (same convention
as the value-level ``ops/plane.py``).  H = 8 also keeps every DMA
offset 8-row aligned (Mosaic requires provable (8,128) tile alignment
on sliced sublane offsets).

Parity with the XLA plane path is the same re-association contract as
the interleaved strips: identical fixed point, few-ULP rounding per
cycle (CPU interpret tests in ``tests/test_pallas_plane.py``;
iteration-count parity on hardware via ``benchmarks/strip_parity_check.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU-only at lowering time; import is safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

from .pallas_mg import kernel_params

H = 8  # halo rows per side (5 consumed worst-case; 8 for tile alignment)

# 14 half-width window arrays live per strip (R, B, bh x2, links x8,
# c x2).  Hardware probe (benchmarks/plane_strip_probe.py, TPU v5e,
# 2026-08-18, nc=2048): T=16 ok 4.58 ms/down+up, T=32 ok 3.48, T=64 ok
# 3.09 — (64+16) x 2048 = 160k window cells x 14 arrays (~9 MB scratch)
# still compiles and is the fastest measured point, matching the
# interleaved strips' ~160k-cell empirical budget
# (ops/pallas_strip.py:_strip_rows) despite the doubled array count —
# the Mosaic scoped-VMEM ceiling tracks the WINDOW footprint, not the
# total scratch bytes.  Cap set at the measured-good point.
_CAP_CELLS = 160 * 1024


def _plane_rows(m: int, nc: int) -> int:
    """Preferred strip height T (multiple of 8, dividing m) whose
    14-array window fits the scoped-VMEM budget; 0 if none does.

    T=64 first, NOT largest-fitting: the hardware probe
    (plane_strip_probe.py, TPU v5e, 2026-08-18) measured ms/down+up
    nc=2048: T=16 4.58 / T=32 3.48 / T=64 3.09; nc=1024: T=16 0.80 /
    T=32 0.53 / **T=64 0.32** / T=128 0.80 — past T=64 the bigger
    window LOSES (less DMA/compute overlap across fewer grid steps),
    so bigger-if-it-fits is the wrong rule."""
    # no T=8: the down kernel's coarse output block is (T//2, nc) and
    # T//2=4 would violate Mosaic's (8,128) sublane tiling on hardware
    # (interpret-mode tests cannot catch it) — every candidate keeps
    # T//2 a multiple of 8
    for T in (64, 96, 128, 48, 32, 16):
        if T + 2 * H > m or m % T:
            continue
        if (T + 2 * H) * nc <= _CAP_CELLS:
            return T
    return 0


def supports_plane_strip(m: int, nc: int, cfg, dtype) -> bool:
    """Gate mirroring ``multigrid_solve``'s plane-path conditions plus
    the window-fit test."""
    if not HAVE_PALLAS or dtype != jnp.float32:
        return False
    if (cfg.smoother != "gs" or cfg.omega != 1.0
            or cfg.pre_smoothing > 2 or cfg.post_smoothing > 2
            or getattr(cfg, "smoother_dtype", "float32") != "float32"):
        return False
    if cfg.restriction != "full_weighting" or cfg.prolongation != "linear":
        return False
    return _plane_rows(m, nc) > 0


@functools.lru_cache(maxsize=16)
def _plane_row_restrict(Tc: int, T: int):
    """(Tc, T) static factor: coarse row I = 0.25 * (fine 2I + fine 2I+1)
    (the row-pair quarter-sum of ``plane_restrict_cc`` — the column sum
    already happened via rR + rB)."""
    R = np.zeros((Tc, T), np.float32)
    I = np.arange(Tc)
    R[I, 2 * I] = 0.25
    R[I, 2 * I + 1] = 0.25
    return R


def _window(m, T, g):
    W = T + 2 * H
    off = jnp.clip(g * T - H, 0, m - W)
    s0 = pl.multiple_of(g * T - off, 8)
    return pl.multiple_of(off, 8), s0


def _sweeps(R, B, S, odd, n_sweeps):
    """Red-black GS sweeps on the VMEM-resident plane windows —
    the pltpu.roll transcription of ``plane.plane_rb_sweep``."""
    (bh0, bh1, eh0, wh0, nh0, sh0, eh1, wh1, nh1, sh1) = S
    roll = pltpu.roll

    def red(B):
        e = roll(B, -1 % B.shape[0], 0)
        w = roll(B, 1, 0)
        n = jnp.where(odd, roll(B, -1 % B.shape[1], 1), B)
        s = jnp.where(odd, B, roll(B, 1, 1))
        return bh0 - (eh0 * e + wh0 * w + nh0 * n + sh0 * s)

    def black(R):
        e = roll(R, -1 % R.shape[0], 0)
        w = roll(R, 1, 0)
        n = jnp.where(odd, R, roll(R, -1 % R.shape[1], 1))
        s = jnp.where(odd, roll(R, 1, 1), R)
        return bh1 - (eh1 * e + wh1 * w + nh1 * n + sh1 * s)

    for _ in range(n_sweeps):
        R = red(B)
        B = black(R)
    return R, B


def _residual_planes(R, B, S, c0, c1, odd):
    """Normalized-form residual: r = c * (bh - p - sum(link_hat * nbr))."""
    (bh0, bh1, eh0, wh0, nh0, sh0, eh1, wh1, nh1, sh1) = S
    roll = pltpu.roll
    e = roll(B, -1 % B.shape[0], 0)
    w = roll(B, 1, 0)
    n = jnp.where(odd, roll(B, -1 % B.shape[1], 1), B)
    s = jnp.where(odd, B, roll(B, 1, 1))
    rR = c0 * (bh0 - R - (eh0 * e + wh0 * w + nh0 * n + sh0 * s))
    e = roll(R, -1 % R.shape[0], 0)
    w = roll(R, 1, 0)
    n = jnp.where(odd, R, roll(R, -1 % R.shape[1], 1))
    s = jnp.where(odd, roll(R, 1, 1), R)
    rB = c1 * (bh1 - B - (eh1 * e + wh1 * w + nh1 * n + sh1 * s))
    return rR, rB


def _mk_down_kernel(m, nc, T, pre):
    from .pallas_mg import mm

    W = T + 2 * H
    NA = 14  # R, B, bh x2, links x8, c x2

    def kernel(*refs):
        hbm = refs[:NA]
        rloc_ref = refs[NA]
        R_out, B_out, rc_out = refs[NA + 1: NA + 4]
        scratch = refs[NA + 4: 2 * NA + 4]
        sems = refs[2 * NA + 4]
        g = pl.program_id(0)
        off, s0 = _window(m, T, g)
        dmas = []
        for i, (src, dst) in enumerate(zip(hbm, scratch)):
            dma = pltpu.make_async_copy(src.at[pl.ds(off, W)], dst,
                                        sems.at[i])
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()
        Rw, Bw = scratch[0], scratch[1]
        S = tuple(r[:] for r in scratch[2:12])
        c0, c1 = scratch[12][:], scratch[13][:]
        ii = off + jax.lax.broadcasted_iota(jnp.int32, (W, nc), 0)
        odd = (ii % 2) == 1
        R, B = _sweeps(Rw[:], Bw[:], S, odd, pre)
        rR, rB = _residual_planes(R, B, S, c0, c1, odd)
        # Mosaic has no value-level dynamic_slice: round-trip through the
        # consumed input scratch refs and load a pl.ds window
        Rw[:] = R
        Bw[:] = B
        R_out[:] = Rw[pl.ds(s0, T), :]
        B_out[:] = Bw[pl.ds(s0, T), :]
        Rw[:] = rR + rB  # column pair-sum of the residual
        rc_out[:] = mm(rloc_ref[:], Rw[pl.ds(s0, T), :])

    return kernel


def _mk_up_kernel(m, nc, T, post):
    W = T + 2 * H
    NA = 14  # R, B, efR, efB, bh x2, links x8

    def kernel(*refs):
        hbm = refs[:NA]
        R_out, B_out = refs[NA: NA + 2]
        scratch = refs[NA + 2: 2 * NA + 2]
        sems = refs[2 * NA + 2]
        g = pl.program_id(0)
        off, s0 = _window(m, T, g)
        dmas = []
        for i, (src, dst) in enumerate(zip(hbm, scratch)):
            dma = pltpu.make_async_copy(src.at[pl.ds(off, W)], dst,
                                        sems.at[i])
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()
        Rw, Bw = scratch[0], scratch[1]
        efR, efB = scratch[2][:], scratch[3][:]
        S = tuple(r[:] for r in scratch[4:14])
        ii = off + jax.lax.broadcasted_iota(jnp.int32, (W, nc), 0)
        odd = (ii % 2) == 1
        R, B = _sweeps(Rw[:] + efR, Bw[:] + efB, S, odd, post)
        Rw[:] = R
        Bw[:] = B
        R_out[:] = Rw[pl.ds(s0, T), :]
        B_out[:] = Bw[pl.ds(s0, T), :]

    return kernel


def _norm_arrays(ps):
    """The 10 diagonal-normalized stencil planes in kernel order."""
    return [ps.bh[0], ps.bh[1], ps.eh[0], ps.wh[0], ps.nh[0], ps.sh[0],
            ps.eh[1], ps.wh[1], ps.nh[1], ps.sh[1]]


def plane_strip_down(R, B, ps, cfg, *, interpret: bool = False):
    """Plane-form fine-level down pass as one kernel:
    ``plane_fine_down`` (pre-smooth + residual + restriction) with both
    color planes strip-resident in VMEM.  Returns ``(R, B, r_coarse)``
    with ``r_coarse`` in STANDARD coarse layout."""
    m, nc = R.shape
    T = _plane_rows(m, nc)
    inputs = [R, B] + _norm_arrays(ps) + [ps.c[0], ps.c[1],
                                          jnp.asarray(_plane_row_restrict(T // 2, T))]
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    W = T + 2 * H
    R2, B2, rc = pl.pallas_call(
        _mk_down_kernel(m, nc, T, cfg.pre_smoothing),
        grid=(m // T,),
        out_shape=[jax.ShapeDtypeStruct((m, nc), R.dtype),
                   jax.ShapeDtypeStruct((m, nc), R.dtype),
                   jax.ShapeDtypeStruct((m // 2, nc), R.dtype)],
        in_specs=[any_spec] * 14 + [vmem],
        out_specs=[pl.BlockSpec((T, nc), lambda g: (g, 0)),
                   pl.BlockSpec((T, nc), lambda g: (g, 0)),
                   pl.BlockSpec((T // 2, nc), lambda g: (g, 0))],
        scratch_shapes=[pltpu.VMEM((W, nc), R.dtype) for _ in range(14)]
        + [pltpu.SemaphoreType.DMA((14,))],
        compiler_params=kernel_params(),
        interpret=interpret,
    )(*inputs)
    # zero-diagonal cells (consistent-variant corners) drop their b term
    # in the in-kernel normalized-form residual; ps.rc_zdiag restores it
    return R2, B2, rc + ps.rc_zdiag


def plane_strip_up(R, B, ps, ec, cfg, *, interpret: bool = False):
    """Plane-form fine-level up pass as one kernel: prolonged coarse
    correction + post-smoothing (``plane_fine_up``).  The row+column
    prolongation to correction planes runs outside in XLA
    (``plane_prolong_cc`` — one pass over half-size arrays)."""
    from .plane import plane_prolong_cc

    m, nc = R.shape
    T = _plane_rows(m, nc)
    efR, efB = plane_prolong_cc(ec)
    inputs = [R, B, efR, efB] + _norm_arrays(ps)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    W = T + 2 * H
    R2, B2 = pl.pallas_call(
        _mk_up_kernel(m, nc, T, cfg.post_smoothing),
        grid=(m // T,),
        out_shape=[jax.ShapeDtypeStruct((m, nc), R.dtype),
                   jax.ShapeDtypeStruct((m, nc), R.dtype)],
        in_specs=[any_spec] * 14,
        out_specs=[pl.BlockSpec((T, nc), lambda g: (g, 0)),
                   pl.BlockSpec((T, nc), lambda g: (g, 0))],
        scratch_shapes=[pltpu.VMEM((W, nc), R.dtype) for _ in range(14)]
        + [pltpu.SemaphoreType.DMA((14,))],
        compiler_params=kernel_params(),
        interpret=interpret,
    )(*inputs)
    return R2, B2
