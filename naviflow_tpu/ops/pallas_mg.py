"""Fused whole-V-cycle Pallas TPU kernel (VERDICT r1 #10, ROADMAP #4).

Hypothesis under test: at latency-bound grids (63^2 .. 255^2) an XLA
V-cycle is hundreds of micro-kernel dispatches — every smoother color,
shifted read, and transfer is its own kernel, and at these sizes each
kernel is ~a microsecond of launch latency wrapping nanoseconds of
arithmetic.  Fusing the ENTIRE cycle — all levels' smoothing sweeps,
residuals, and transfers — into ONE VMEM-resident kernel removes all of
it.  (The round-1 single-sweep kernels lost ~6x to XLA fusion because they
fused too little; this kernel is the multi-level whole-cycle experiment
the round-1 verdict asked for.)

Design (TPU-first, no strided memory access anywhere):

* every level's field and 9-point Galerkin stencil live at their native
  ``(nx_l, ny_l)`` shapes in VMEM for the whole kernel;
* stencil applications are ``pltpu.roll``s — wrap-around contributions are
  annihilated by the zero out-of-domain stencil links (``galerkin_coarsen``
  builds them from zero-filled shifts, and ``poisson_coefficients`` zeroes
  boundary links on the finest level), the same trick as
  ``pallas_kernels.py``;
* restriction / prolongation are separable tensor-product MATMULS on the
  MXU: full-weighting ``R = kron(r, r)`` with rows
  ``r[I, 2I:2I+3] = [1/4, 1/2, 1/4]`` (the h^2-scaled weights of
  ``ops/transfer.restrict_full_weighting``) and bilinear ``P`` with the
  boundary-slab copies of ``ops/transfer.prolong_linear`` baked into rows
  0 / nf-1 — numerically equal to the strided-slice versions up to
  summation order.

The kernel implements the default configuration of
``solvers/multigrid.py:_cycle``: V-cycle, red-black SOR on the 5-point
finest level, 4-color GS on the 9-point Galerkin levels, full-weighting
restriction, bilinear prolongation.  Anything else falls back to the XLA
path (``supports_fused`` is the gate).
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

# Per-level estimate: stencil refs (5 on the five-point finest level, 9 on
# Galerkin levels) + ~3 live field temporaries, against the 16 MB
# scoped-VMEM limit.  255^2 hierarchies estimate ~3.5 MB (measured fine);
# a 511^2 hierarchy estimates ~12 MB here but Mosaic's scoped allocation
# measured 20.8 MB (stack OOM), so the budget keeps 511^2 on the XLA path.
VMEM_BUDGET_BYTES = 8 * 2**20


def _padded_bytes(nx, ny):
    """f32 VMEM footprint of an (nx, ny) array under (8, 128) tiling."""
    return (-(-nx // 8) * 8) * (-(-ny // 128) * 128) * 4


# Mosaic's per-kernel scoped-VMEM stack defaults to 16 MiB (the
# --xla_tpu_scoped_vmem_limit_kib XLA default) — a COMPILER budget, not
# the chip's capacity (v5e VMEM is 128 MiB).  The whole-algorithm
# kernels' long dependency chains put their liveness stack right at that
# default (measured on v5e: 255^2 SIMPLE whole-step 16.68 MiB after the
# round-4 algo parameterization, 255^2 SIMPLEC 16.42 MiB, 511^2 fused
# V-cycle 20.8 MiB — all "scoped allocation ... exceeded scoped vmem
# limit" stack OOMs), so the heavyweight single-invocation kernels raise
# the per-kernel limit explicitly; the *_BUDGET admission gates remain
# the policy against the raised ceiling.
KERNEL_VMEM_LIMIT_BYTES = 64 * 2**20


def kernel_params():
    """Shared Mosaic compiler params for the whole-algorithm kernels."""
    return pltpu.CompilerParams(vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES)


@functools.lru_cache(maxsize=64)
def _transfer_matrices(nf: int, nc: int):
    """1-D factors of the separable transfers, as numpy f32.

    Returns ``(R, Rt, P, Pt)``: ``rc = R @ r @ Rt`` is the restriction,
    ``ef = P @ ec @ Pt`` the prolongation.  ``nf == 2*nc + 1``: vertex
    grids — full-weighting / bilinear with the boundary-slab copy rows of
    ``ops/transfer.py``.  ``nf == 2*nc``: cell-centered grids — 2x2 block
    mean / clamped bilinear of ``ops/transfer_cc.py``.
    """
    I = np.arange(nc)
    if nf == 2 * nc + 1:  # vertex (odd) grids
        R = np.zeros((nc, nf), np.float32)
        R[I, 2 * I] = 0.25
        R[I, 2 * I + 1] = 0.5
        R[I, 2 * I + 2] = 0.25

        P = np.zeros((nf, nc), np.float32)
        P[2 * I + 1, I] = 1.0
        Im = np.arange(nc - 1)
        P[2 * Im + 2, Im] = 0.5
        P[2 * Im + 2, Im + 1] = 0.5
        P[0, :] = P[1, :]  # boundary slabs from the first interior line
        P[nf - 1, :] = P[nf - 2, :]
    elif nf == 2 * nc:  # cell-centered (even) grids
        R = np.zeros((nc, nf), np.float32)
        R[I, 2 * I] = 0.5
        R[I, 2 * I + 1] = 0.5

        P = np.zeros((nf, nc), np.float32)
        P[2 * I, I] += 0.75
        P[2 * I, np.maximum(I - 1, 0)] += 0.25  # clamped at I=0
        P[2 * I + 1, I] += 0.75
        P[2 * I + 1, np.minimum(I + 1, nc - 1)] += 0.25  # clamped at top
    else:
        raise ValueError(f"no transfer factorization for {nf} -> {nc}")
    return R, np.ascontiguousarray(R.T), P, np.ascontiguousarray(P.T)


def supports_fused(levels, cfg) -> bool:
    """True when the (levels, cfg) combination lowers to the fused kernel.

    ``cycle_type='fmg'`` is accepted (ROADMAP #2): the FMG bootstrap runs
    BEFORE the cycle/check loop (``multigrid_solve`` computes ``p_start``
    and hands it to ``fused_mg_solve``), and FMG's in-loop cycles are
    plain V-cycles — exactly what the kernel implements.  The whole-step
    kernel (``pallas_step``) separately requires 'v' because its in-kernel
    solve starts from zeros with no bootstrap."""
    if not HAVE_PALLAS:
        return False
    if (cfg.cycle_type not in ("v", "fmg") or cfg.smoother != "gs"
            or cfg.restriction != "full_weighting"
            or cfg.prolongation != "linear"
            or getattr(cfg, "smoother_dtype", "float32") != "float32"):
        return False
    total = 0
    for st, (nx, ny), five, _ in levels:
        if nx != ny:
            return False
        if st.c.dtype != jnp.float32:
            return False
        # five-point levels ship 5 stencil refs, 9-point levels 9;
        # ~3 live field temporaries either way
        total += ((5 if five else 9) + 3) * _padded_bytes(nx, ny)
    # every transition must have a separable factorization (odd->vertex,
    # even->cell-centered)
    for (_, (nf, _), _, _), (_, (nc, _), _, _) in zip(levels, levels[1:]):
        if nf not in (2 * nc, 2 * nc + 1):
            return False
    return total <= VMEM_BUDGET_BYTES


# ---------------------------------------------------------------------------
# Value-level building blocks — usable both inside this module's kernels and
# inside larger fused kernels (ops/pallas_step.py composes the whole SIMPLE
# step from these plus the ordinary jnp assembly functions).

def _roll(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


def apply9v(x, S):
    """9-point stencil apply on a 5- or 9-tuple of coefficient arrays
    (five-point levels omit the identically-zero corner links)."""
    c, e, w, n, s = S[:5]
    out = (
        c * x
        + e * _roll(x, -1, 0)
        + w * _roll(x, 1, 0)
        + n * _roll(x, -1, 1)
        + s * _roll(x, 1, 1)
    )
    if len(S) == 9:
        ne, nw, se, sw = S[5:]
        out = (
            out
            + ne * _roll(_roll(x, -1, 0), -1, 1)
            + nw * _roll(_roll(x, 1, 0), -1, 1)
            + se * _roll(_roll(x, -1, 0), 1, 1)
            + sw * _roll(_roll(x, 1, 0), 1, 1)
        )
    return out


def _inv_diag(S):
    c = S[0]
    safe = jnp.where(jnp.abs(c) < 1e-15, jnp.ones_like(c), c)
    return 1.0 / safe


def _masks(shape):
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return ii, jj


def rb2_sweep_v(p, b, S, omega):
    ii, jj = _masks(p.shape)
    red = (ii + jj) % 2 == 0
    invc = _inv_diag(S)

    def half(p, color):
        off = apply9v(p, S) - S[0] * p
        p_new = (b - off) * invc
        return jnp.where(color, p + omega * (p_new - p), p)

    p = half(p, red)
    return half(p, jnp.logical_not(red))


def gs4_sweep_v(p, b, S, omega):
    ii, jj = _masks(p.shape)
    invc = _inv_diag(S)

    def quarter(p, color):
        off = apply9v(p, S) - S[0] * p
        p_new = (b - off) * invc
        return jnp.where(color, p + omega * (p_new - p), p)

    for a in range(2):
        for bpar in range(2):
            p = quarter(p, (ii % 2 == a) & (jj % 2 == bpar))
    return p


def smooth_v(p, b, S, n, five, omega):
    fn = rb2_sweep_v if five else gs4_sweep_v
    if n <= 2:
        for _ in range(n):
            p = fn(p, b, S, omega)
        return p
    return jax.lax.fori_loop(0, n, lambda _, q: fn(q, b, S, omega), p)


def mm(a, b):
    """In-kernel matmul at FULL f32 precision.

    The MXU's default f32 mode multiplies in bf16; the Galerkin comb
    recovery depends on near-cancellation of stencil row sums, and the
    default precision was measured to corrupt coarse operators
    progressively down a 255^2 hierarchy (0.7% at 127^2 compounding to
    86% at 7^2 — enough to make coarse smoothing non-contractive and NaN
    a Re=1000 solve).  HIGHEST runs the 6-pass bf16 decomposition; these
    matmuls are tiny, so the cost is negligible."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def vcycle_value(p, b, stencils, trans, meta, cfg, lvl: int = 0):
    """One V-cycle over value tuples (stencils/transfer factors already
    loaded from refs or computed in-kernel)."""
    L = len(meta)
    S = stencils[lvl]
    _, five = meta[lvl]
    if lvl == L - 1:
        return smooth_v(p, b, S, cfg.coarsest_sweeps, five, cfg.omega)
    p = smooth_v(p, b, S, cfg.pre_smoothing, five, cfg.omega)
    r = b - apply9v(p, S)
    R, Rt, P, Pt = trans[lvl]
    rc = mm(R, mm(r, Rt))
    ec = vcycle_value(jnp.zeros_like(rc), rc, stencils, trans, meta, cfg,
                      lvl + 1)
    p = p + mm(P, mm(ec, Pt))
    return smooth_v(p, b, S, cfg.post_smoothing, five, cfg.omega)


def mg_solve_value(p0, b, stencils, trans, meta, cfg, mean_normalize: bool):
    """The full multigrid_solve loop over values: cycles + convergence
    while_loop + optional mean normalization.  Returns (p, r, cycles, rel)."""
    S0 = stencils[0]
    # compensated in-kernel norms: Mosaic's sequential reductions lose
    # O(n*eps) at 255^2+, corrupting the relative-residual stopping test
    # (ops/compensated.py fold_* rationale)
    from .compensated import fold_norm2
    bnorm = jnp.sqrt(fold_norm2(b))
    safe_b = jnp.where(bnorm > 0, bnorm, jnp.ones_like(bnorm))

    def cond(carry):
        p, k, rel = carry
        return (k < cfg.max_cycles) & (rel >= cfg.tolerance)

    def body(carry):
        p, k, _ = carry
        for _ in range(cfg.check_every):
            p = vcycle_value(p, b, stencils, trans, meta, cfg)
        r = b - apply9v(p, S0)
        rel = jnp.sqrt(fold_norm2(r)) / safe_b
        return (p, k + cfg.check_every, rel)

    big = jnp.asarray(jnp.inf, b.dtype)
    p, cycles, rel = jax.lax.while_loop(
        cond, body, (p0, jnp.asarray(0, jnp.int32), big))
    if mean_normalize:
        p = p - jnp.mean(p)
    return p, b - apply9v(p, S0), cycles, rel


def _mk_kernel(meta, cfg, whole_solve: bool = False,
               mean_normalize: bool = True):
    """Build the kernel body for a static hierarchy ``meta`` =
    [(shape, five_point), ...] finest -> coarsest.

    ``whole_solve=False``: one V-cycle, one output (p').
    ``whole_solve=True``: the ENTIRE ``multigrid_solve`` iteration — the
    cycle/convergence ``lax.while_loop`` (which lowers on Pallas TPU),
    the optional mean normalization, and the final residual — with
    outputs (p, r, cycles, rel)."""
    L = len(meta)

    def kernel(*refs):
        # layout: p, b, per-level stencils (5 or 9 refs), 4*(L-1)
        # transfer factors, out(s)
        p_ref, b_ref = refs[0], refs[1]
        stencils = []
        off = 2
        for _, five in meta:
            k = 5 if five else 9
            stencils.append(tuple(r[:] for r in refs[off: off + k]))
            off += k
        trans = [tuple(refs[off + 4 * l + k][:] for k in range(4))
                 for l in range(L - 1)]

        if not whole_solve:
            refs[-1][:] = vcycle_value(p_ref[:], b_ref[:], stencils, trans,
                                       meta, cfg)
            return

        p_out, r_out, cyc_out, rel_out = refs[-4:]
        p, r, cycles, rel = mg_solve_value(p_ref[:], b_ref[:], stencils,
                                           trans, meta, cfg, mean_normalize)
        p_out[:] = p
        r_out[:] = r
        # (1,1)-shaped vector stores — Mosaic cannot store scalars to VMEM
        cyc_out[:] = jnp.reshape(cycles, (1, 1))
        rel_out[:] = jnp.reshape(rel, (1, 1))

    return kernel


_RAP_OFFSETS = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
                (1, 1), (-1, 1), (1, -1), (-1, -1))  # Stencil9 field order


def supports_fused_rap(nx, ny, cfg, dtype) -> bool:
    """Gate for :func:`galerkin_levels_pallas` — odd square vertex grids,
    default transfers, f32, whole hierarchy + fine-shape temporaries in
    VMEM (the <= 255^2 latency-bound regime)."""
    if not HAVE_PALLAS or dtype != jnp.float32:
        return False
    if (cfg.restriction != "full_weighting" or cfg.prolongation != "linear"
            or cfg.coarsening != "galerkin"):
        return False
    if nx != ny or nx % 2 == 0:
        return False
    return 14 * _padded_bytes(nx, ny) <= VMEM_BUDGET_BYTES


def galerkin_rap_value(S, shapes, trans):
    """All Galerkin coarse stencils over values (see
    :func:`galerkin_levels_pallas`).  ``S``: fine stencil tuple (5 or 9
    arrays); returns a list of 9-tuples, one per coarse level."""
    dtype = S[0].dtype
    out_levels = []
    for lvl in range(len(shapes) - 1):
        nxc, nyc = shapes[lvl + 1]
        R, Rt, P, Pt = trans[lvl]
        ii = jax.lax.broadcasted_iota(jnp.int32, (nxc, nyc), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (nxc, nyc), 1)
        images = []
        for a in range(3):
            for b in range(3):
                comb = ((ii % 3 == a) & (jj % 3 == b)).astype(dtype)
                pe = mm(P, mm(comb, Pt))
                images.append(mm(R, mm(apply9v(pe, S), Rt)))
        entries = []
        for di, dj in _RAP_OFFSETS:
            val = jnp.zeros((nxc, nyc), dtype)
            ai = (ii + di) % 3
            bj = (jj + dj) % 3
            for a in range(3):
                for b in range(3):
                    val = jnp.where((ai == a) & (bj == b),
                                    images[3 * a + b], val)
            inside = ((ii + di >= 0) & (ii + di <= nxc - 1)
                      & (jj + dj >= 0) & (jj + dj <= nyc - 1))
            entries.append(jnp.where(inside, val,
                                     jnp.zeros((nxc, nyc), dtype)))
        out_levels.append(tuple(entries))
        S = tuple(entries)
    return out_levels


def _mk_rap_kernel(shapes, fine_five: bool):
    """Kernel computing EVERY Galerkin coarse stencil of the hierarchy in
    one launch.  ``shapes``: [(nx0,ny0), (nx1,ny1), ...] finest->coarsest."""
    L = len(shapes)

    def kernel(*refs):
        # inputs: fine stencil (5 or 9), then R/Rt/P/Pt per transition;
        # outputs: 9 arrays per coarse level
        nf_st = 5 if fine_five else 9
        S = tuple(r[:] for r in refs[:nf_st])
        trans = [tuple(refs[nf_st + 4 * l + k][:] for k in range(4))
                 for l in range(L - 1)]
        outs = refs[nf_st + 4 * (L - 1):]
        for lvl, entries in enumerate(galerkin_rap_value(S, shapes, trans)):
            for k in range(9):
                outs[9 * lvl + k][:] = entries[k]

    return kernel


def galerkin_levels_pallas(fine_st: Stencil9, shapes, fine_five: bool,
                           *, interpret: bool = False):
    """The whole Galerkin RAP hierarchy rebuild as ONE Pallas kernel.

    Composed in XLA, the rebuild is 9 comb chains x ~15 kernels x levels
    (~500 dispatches, measured 5.1 ms at 63^2 — the DOMINANT per-iteration
    cost once cycles and momentum are fused, amortized to ~0.6 ms/iter at
    ``coarse_rebuild_every=8``).  Here: combs from iota masks, transfers
    as MXU tensor-product matmuls (same R/P factors as the fused V-cycle),
    stencil applications as rolls, entry recovery as class-mask selection
    — all elementwise, no gathers.  Returns a list of ``Stencil9``, one
    per coarse level, numerically equal to ``stencil9.galerkin_coarsen``
    up to summation order.
    """
    L = len(shapes)
    if fine_five:
        inputs = [fine_st.c, fine_st.e, fine_st.w, fine_st.n, fine_st.s]
    else:
        inputs = [fine_st.c, fine_st.e, fine_st.w, fine_st.n, fine_st.s,
                  fine_st.ne, fine_st.nw, fine_st.se, fine_st.sw]
    for (nf_, _), (nc_, _) in zip(shapes, shapes[1:]):
        inputs += [jnp.asarray(m) for m in _transfer_matrices(nf_, nc_)]

    dtype = fine_st.c.dtype
    out_shapes = [jax.ShapeDtypeStruct((nxc, nyc), dtype)
                  for (nxc, nyc) in shapes[1:] for _ in range(9)]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _mk_rap_kernel(tuple(shapes), fine_five),
        out_shape=out_shapes,
        in_specs=[spec] * len(inputs),
        out_specs=[spec] * len(out_shapes),
        compiler_params=kernel_params(),
        interpret=interpret,
    )(*inputs)
    sts = []
    for lvl in range(L - 1):
        c, e, w, n, s, ne, nw, se, sw = outs[9 * lvl: 9 * (lvl + 1)]
        sts.append(Stencil9(c=c, e=e, w=w, n=n, s=s, ne=ne, nw=nw, se=se,
                            sw=sw))
    return sts


def fused_vcycle(p, b, levels, cfg, *, interpret: bool = False):
    """One V-cycle at level 0, as a single Pallas kernel launch.

    Drop-in for ``multigrid._cycle(p, b, levels, 0, cfg)`` under the
    configurations accepted by :func:`supports_fused` (caller's
    responsibility to gate).  ``interpret=True`` runs the kernel in the
    Pallas interpreter (CPU tests).
    """
    meta = tuple(((nx, ny), five) for _, (nx, ny), five, _ in levels)
    inputs = [p, b]
    for st, _, five, _ in levels:
        inputs += [st.c, st.e, st.w, st.n, st.s]
        if not five:
            inputs += [st.ne, st.nw, st.se, st.sw]
    for (_, (nf, _), _, _), (_, (nc, _), _, _) in zip(levels, levels[1:]):
        inputs += [jnp.asarray(m) for m in _transfer_matrices(nf, nc)]

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mk_kernel(meta, cfg),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        in_specs=[spec] * len(inputs),
        out_specs=spec,
        compiler_params=kernel_params(),
        interpret=interpret,
    )(*inputs)


def fused_mg_solve(p0, b, levels, cfg, *, mean_normalize: bool = True,
                   interpret: bool = False):
    """The ENTIRE ``multigrid_solve`` loop as one Pallas kernel launch:
    cycles, convergence checks (in-kernel ``lax.while_loop``), optional
    mean normalization, and the final residual.  Returns
    ``(p, r_field, cycles, rel)`` with the scalars as 0-d arrays.  Gate
    with :func:`supports_fused` (caller's responsibility)."""
    meta = tuple(((nx, ny), five) for _, (nx, ny), five, _ in levels)
    inputs = [p0, b]
    for st, _, five, _ in levels:
        inputs += [st.c, st.e, st.w, st.n, st.s]
        if not five:
            inputs += [st.ne, st.nw, st.se, st.sw]
    for (_, (nf, _), _, _), (_, (nc, _), _, _) in zip(levels, levels[1:]):
        inputs += [jnp.asarray(m) for m in _transfer_matrices(nf, nc)]

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct(p0.shape, p0.dtype),  # p
        jax.ShapeDtypeStruct(p0.shape, p0.dtype),  # residual field
        jax.ShapeDtypeStruct((1, 1), jnp.int32),   # cycles
        jax.ShapeDtypeStruct((1, 1), p0.dtype),    # rel residual
    ]
    p, r, cycles, rel = pl.pallas_call(
        _mk_kernel(meta, cfg, whole_solve=True, mean_normalize=mean_normalize),
        out_shape=out_shapes,
        in_specs=[spec] * len(inputs),
        out_specs=[spec] * 4,
        compiler_params=kernel_params(),
        interpret=interpret,
    )(*inputs)
    return p, r, cycles[0, 0], rel[0, 0]
