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

def to_blocked_u(u, mx: int):
    """(nx+1, ny) -> (mx*(nxl+1), ny): per-block face rows with duplicated
    shared edges."""
    nx = u.shape[0] - 1
    nxl = nx // mx
    return jnp.concatenate([u[b * nxl : (b + 1) * nxl + 1, :] for b in range(mx)], 0)


def from_blocked_u(u_blk, mx: int):
    nrow = u_blk.shape[0] // mx
    parts = [u_blk[b * nrow : (b + 1) * nrow, :] for b in range(mx)]
    return jnp.concatenate([p[:-1] for p in parts[:-1]] + [parts[-1]], 0)


def to_blocked_v(v, my: int):
    ny = v.shape[1] - 1
    nyl = ny // my
    return jnp.concatenate([v[:, b * nyl : (b + 1) * nyl + 1] for b in range(my)], 1)


def from_blocked_v(v_blk, my: int):
    ncol = v_blk.shape[1] // my
    parts = [v_blk[:, b * ncol : (b + 1) * ncol] for b in range(my)]
    return jnp.concatenate([p[:, :-1] for p in parts[:-1]] + [parts[-1]], 1)


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
    """Static decomposition descriptor."""

    nx: int
    ny: int
    mx: int
    my: int

    @property
    def nxl(self):
        return self.nx // self.mx

    @property
    def nyl(self):
        return self.ny // self.my

    def __post_init__(self):
        if self.nx % self.mx or self.ny % self.my:
            raise ValueError(
                f"grid ({self.nx},{self.ny}) must divide the mesh ({self.mx},{self.my})"
            )


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
