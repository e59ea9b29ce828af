"""Explicit staggered domain decomposition over a 2-D device mesh.

This is the fully sharded multi-chip path (SURVEY §7 step 7): the global
staggered fields are decomposed into per-device blocks, every stencil op
runs on the local block, and 1-cell halos ride the ICI via
``jax.lax.ppermute`` inside ``shard_map``.  Reductions (residual norms,
Krylov dot products) are ``psum`` collectives.

Block layout (device (bx, by) of an ('x','y') mesh; global p grid (nx, ny)
with nx % mx == 0 and ny % my == 0; nxl = nx//mx, nyl = ny//my):

* cells  gi0..gi0+nxl-1 x gj0..gj0+nyl-1, gi0 = bx*nxl, gj0 = by*nyl;
* u faces gi0..gi0+nxl (the faces on block edges are **duplicated** between
  x-neighbors and kept consistent by construction — both owners compute
  them from identical halo data);
* v faces gj0..gj0+nyl (duplicated between y-neighbors).

The blocked *global* arrays stack the local blocks, so they shard evenly:
``U_blk`` (mx*(nxl+1), my*nyl), ``V_blk`` (mx*nxl, my*(nyl+1)),
``P_blk`` (nx, ny) — all ``NamedSharding(P('x','y'))``.

Operator assembly on blocks reuses the window-form kernels
(``ops/windowed.py``) whose boundary handling is global-index masks, so the
distributed step is *bit-compatible* with the single-device step (verified
in ``tests/test_distributed.py``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.stencil import StencilCoeffs


# --------------------------------------------------------------------------
# blocked layout conversions (host/jit-side, static loops over blocks)
# --------------------------------------------------------------------------

def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _pad_axis(a, axis: int, size: int):
    """Zero-pad ``a`` up to ``size`` along ``axis`` (no-op when equal)."""
    if a.shape[axis] == size:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, size - a.shape[axis])
    return jnp.pad(a, pad)


def to_blocked_u(u, mx: int, my: int = 1):
    """(nx+1, ny) -> (mx*(nxl+1), my*nyl): per-block face rows with
    duplicated shared edges.  Non-divisible grids are zero-padded up to the
    tiled extent (``nxl = ceil(nx/mx)``); padded cells are excluded from
    every update and reduction by the global-index masks (real ``nx`` is
    carried on :class:`Decomp`, not inferred from the padded layout)."""
    nx = u.shape[0] - 1
    nxl, nyl = _ceil_div(nx, mx), _ceil_div(u.shape[1], my)
    u = _pad_axis(_pad_axis(u, 0, mx * nxl + 1), 1, my * nyl)
    return jnp.concatenate([u[b * nxl : b * nxl + nxl + 1, :] for b in range(mx)], 0)


def from_blocked_u(u_blk, mx: int):
    """Inverse of :func:`to_blocked_u` up to the zero padding (crop the
    result to ``[:nx+1, :ny]`` for non-divisible grids)."""
    nrow = u_blk.shape[0] // mx
    parts = [u_blk[b * nrow : (b + 1) * nrow, :] for b in range(mx)]
    return jnp.concatenate([p[:-1] for p in parts[:-1]] + [parts[-1]], 0)


def to_blocked_v(v, my: int, mx: int = 1):
    ny = v.shape[1] - 1
    nxl, nyl = _ceil_div(v.shape[0], mx), _ceil_div(ny, my)
    v = _pad_axis(_pad_axis(v, 0, mx * nxl), 1, my * nyl + 1)
    return jnp.concatenate([v[:, b * nyl : b * nyl + nyl + 1] for b in range(my)], 1)


def from_blocked_v(v_blk, my: int):
    ncol = v_blk.shape[1] // my
    parts = [v_blk[:, b * ncol : (b + 1) * ncol] for b in range(my)]
    return jnp.concatenate([p[:, :-1] for p in parts[:-1]] + [parts[-1]], 1)


def to_blocked_p(p, mx: int, my: int):
    """(nx, ny) zero-padded to the (mx, my)-tiled extent (identity for
    divisible grids)."""
    nxl, nyl = _ceil_div(p.shape[0], mx), _ceil_div(p.shape[1], my)
    return _pad_axis(_pad_axis(p, 0, mx * nxl), 1, my * nyl)


# --------------------------------------------------------------------------
# halo exchange (inside shard_map)
# --------------------------------------------------------------------------

def _perm_up(n):
    return [(i, i + 1) for i in range(n - 1)]


def _perm_down(n):
    return [(i + 1, i) for i in range(n - 1)]


def _halo(a, axis: int, name: str, n_shards: int, lo_send: int, hi_send: int,
          width: int = 1):
    """Return (halo_lo, halo_hi): ``width``-wide slices received from the
    lower / upper neighbor along mesh axis ``name`` (zeros at physical
    edges).

    ``lo_send``: start index of MY slice that the upper neighbor uses as
    its lo halo; ``hi_send``: start index of my slice the lower neighbor
    uses as hi halo.
    """
    def take(idx):
        s = idx % a.shape[axis]
        return jax.lax.slice_in_dim(a, s, s + width, axis=axis)

    if n_shards == 1:
        z = jnp.zeros_like(take(0))
        return z, z
    halo_lo = jax.lax.ppermute(take(lo_send), name, _perm_up(n_shards))
    halo_hi = jax.lax.ppermute(take(hi_send), name, _perm_down(n_shards))
    return halo_lo, halo_hi


@dataclasses.dataclass(frozen=True)
class Decomp:
    """Static decomposition descriptor.

    ``nx``/``ny`` are the REAL global cell counts; ``nxl``/``nyl`` the
    per-block extents (``ceil``) — for non-divisible grids the blocked
    layout is zero-padded up to ``(nxp, nyp) = (mx*nxl, my*nyl)`` and every
    update/reduction masks on global indices against the real sizes, so
    padded cells stay exactly zero and contribute nothing (round-2 verdict
    item #7: grids no longer need to divide the device mesh)."""

    nx: int
    ny: int
    mx: int
    my: int

    @property
    def nxl(self):
        return _ceil_div(self.nx, self.mx)

    @property
    def nyl(self):
        return _ceil_div(self.ny, self.my)

    @property
    def nxp(self):
        """Padded (tiled) global x extent."""
        return self.mx * self.nxl

    @property
    def nyp(self):
        return self.my * self.nyl

    @property
    def padded(self):
        return self.nxp != self.nx or self.nyp != self.ny


def extend_u(u_loc, dec: Decomp):
    """(nxl+1, nyl) -> (nxl+3, nyl+2) with neighbor halos (zeros at edges).

    x halos: the neighbor's *second* face from the shared edge (the shared
    face itself is already duplicated locally); y halos: neighbor cell rows.
    """
    lo_x, hi_x = _halo(u_loc, 0, "x", dec.mx, lo_send=-2, hi_send=1)
    u = jnp.concatenate([lo_x, u_loc, hi_x], 0)
    lo_y, hi_y = _halo(u, 1, "y", dec.my, lo_send=-1, hi_send=0)
    return jnp.concatenate([lo_y, u, hi_y], 1)


def extend_v(v_loc, dec: Decomp):
    """(nxl, nyl+1) -> (nxl+2, nyl+3)."""
    lo_x, hi_x = _halo(v_loc, 0, "x", dec.mx, lo_send=-1, hi_send=0)
    v = jnp.concatenate([lo_x, v_loc, hi_x], 0)
    lo_y, hi_y = _halo(v, 1, "y", dec.my, lo_send=-2, hi_send=1)
    return jnp.concatenate([lo_y, v, hi_y], 1)


def extend_u2(u_loc, dec: Decomp):
    """(nxl+1, nyl) -> (nxl+5, nyl+4): TWO halo rings (zeros at physical
    edges) for the 9-point QUICK/LUDS momentum stencils.

    x halos are the neighbor's second and third faces from the shared edge
    (the shared face itself is duplicated locally); y halos are two
    neighbor cell columns.
    """
    lo_x, hi_x = _halo(u_loc, 0, "x", dec.mx, lo_send=-3, hi_send=1, width=2)
    u = jnp.concatenate([lo_x, u_loc, hi_x], 0)
    lo_y, hi_y = _halo(u, 1, "y", dec.my, lo_send=-2, hi_send=0, width=2)
    return jnp.concatenate([lo_y, u, hi_y], 1)


def extend_v2(v_loc, dec: Decomp):
    """(nxl, nyl+1) -> (nxl+4, nyl+5)."""
    lo_x, hi_x = _halo(v_loc, 0, "x", dec.mx, lo_send=-2, hi_send=0, width=2)
    v = jnp.concatenate([lo_x, v_loc, hi_x], 0)
    lo_y, hi_y = _halo(v, 1, "y", dec.my, lo_send=-3, hi_send=1, width=2)
    return jnp.concatenate([lo_y, v, hi_y], 1)


def extend_p2(p_loc, dec: Decomp):
    """(nxl, nyl) -> (nxl+4, nyl+4): two halo rings."""
    lo_x, hi_x = _halo(p_loc, 0, "x", dec.mx, lo_send=-2, hi_send=0, width=2)
    p = jnp.concatenate([lo_x, p_loc, hi_x], 0)
    lo_y, hi_y = _halo(p, 1, "y", dec.my, lo_send=-2, hi_send=0, width=2)
    return jnp.concatenate([lo_y, p, hi_y], 1)


def extend_p(p_loc, dec: Decomp):
    """(nxl, nyl) -> (nxl+2, nyl+2)."""
    lo_x, hi_x = _halo(p_loc, 0, "x", dec.mx, lo_send=-1, hi_send=0)
    p = jnp.concatenate([lo_x, p_loc, hi_x], 0)
    lo_y, hi_y = _halo(p, 1, "y", dec.my, lo_send=-1, hi_send=0)
    return jnp.concatenate([lo_y, p, hi_y], 1)


def extend_p_edge(p_loc, dec: Decomp):
    """(nxl, nyl) -> (nxl+2, nyl+2) with *edge-replicated* physical
    boundaries (interior halos from neighbors as usual).

    This is the halo flavor the cell-centered bilinear prolongation needs:
    ``ops/transfer_cc.prolong_cc`` clamps at domain edges, so a block's
    halo at a physical wall must replicate its own edge row — equivalently
    the global array padded with ``mode='edge'`` and sliced per block.
    Corners ride two hops (x exchange first, then y on the extended array).
    """
    lo_x, hi_x = _halo(p_loc, 0, "x", dec.mx, lo_send=-1, hi_send=0)
    bx = jax.lax.axis_index("x")
    lo_x = jnp.where(bx == 0, p_loc[:1], lo_x)
    hi_x = jnp.where(bx == dec.mx - 1, p_loc[-1:], hi_x)
    p = jnp.concatenate([lo_x, p_loc, hi_x], 0)
    lo_y, hi_y = _halo(p, 1, "y", dec.my, lo_send=-1, hi_send=0)
    by = jax.lax.axis_index("y")
    lo_y = jnp.where(by == 0, p[:, :1], lo_y)
    hi_y = jnp.where(by == dec.my - 1, p[:, -1:], hi_y)
    return jnp.concatenate([lo_y, p, hi_y], 1)


def gather_blocks(x_loc):
    """Local (a, b) block -> full global array, replicated on every device."""
    gx = jax.lax.all_gather(x_loc, "x", axis=0, tiled=True)
    return jax.lax.all_gather(gx, "y", axis=1, tiled=True)


# --------------------------------------------------------------------------
# distributed reductions / stencil helpers
# --------------------------------------------------------------------------

def pnorm2(x):
    """Global L2 norm of a (possibly masked) local field."""
    s = jax.lax.psum(jax.lax.psum(jnp.sum(x * x), "x"), "y")
    return jnp.sqrt(s)


def pmean(x, count):
    s = jax.lax.psum(jax.lax.psum(jnp.sum(x), "x"), "y")
    return s / count


def apply_stencil_halo(x_loc, c: StencilCoeffs, extend_fn, dec: Decomp):
    """A @ x on a local block: extend with halos, apply, crop."""
    x_ext = extend_fn(x_loc, dec)
    return (
        c.a_p * x_loc
        - c.a_e * x_ext[2:, 1:-1]
        - c.a_w * x_ext[:-2, 1:-1]
        - c.a_n * x_ext[1:-1, 2:]
        - c.a_s * x_ext[1:-1, :-2]
    )


def neighbor_sum_halo(x_loc, c: StencilCoeffs, extend_fn, dec: Decomp):
    x_ext = extend_fn(x_loc, dec)
    return (
        c.a_e * x_ext[2:, 1:-1]
        + c.a_w * x_ext[:-2, 1:-1]
        + c.a_n * x_ext[1:-1, 2:]
        + c.a_s * x_ext[1:-1, :-2]
    )
