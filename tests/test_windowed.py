"""Window-form assembly equivalence: full-window and sub-window vs global ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from naviflow_tpu.ops.powerlaw import u_momentum_coefficients, v_momentum_coefficients
from naviflow_tpu.ops.poisson import poisson_coefficients
from naviflow_tpu.ops.windowed import (
    poisson_coefficients_window,
    u_coefficients_window,
    v_coefficients_window,
)

RNG = np.random.default_rng(11)


def _fields(nx, ny, lid=1.0):
    u = RNG.normal(size=(nx + 1, ny))
    v = RNG.normal(size=(nx, ny + 1))
    u[0, :] = u[nx, :] = 0.0
    u[:, 0] = 0.0
    u[:, ny - 1] = lid
    v[0, :] = v[nx - 1, :] = 0.0
    v[:, 0] = v[:, ny] = 0.0
    p = RNG.normal(size=(nx, ny))
    return map(jnp.asarray, (u, v, p))


def _pad1(x):
    return jnp.pad(x, 1)


@pytest.mark.parametrize("nx,ny", [(12, 12), (16, 8)])
def test_u_window_full_equals_global(nx, ny):
    u, v, p = _fields(nx, ny)
    kw = dict(dx=1.0 / (nx - 1), dy=1.0 / (ny - 1), rho=1.0, mu=0.01)
    g = u_momentum_coefficients(u, v, p, **kw)
    w = u_coefficients_window(_pad1(u), _pad1(v), _pad1(p),
                              gi0=0, gj0=0, nx=nx, ny=ny, **kw)
    for name in ("a_e", "a_w", "a_n", "a_s", "a_p", "src"):
        np.testing.assert_allclose(np.asarray(getattr(w, name)),
                                   np.asarray(getattr(g, name)),
                                   rtol=1e-13, atol=1e-15, err_msg=name)


@pytest.mark.parametrize("nx,ny", [(12, 12), (16, 8)])
def test_v_window_full_equals_global(nx, ny):
    u, v, p = _fields(nx, ny)
    kw = dict(dx=1.0 / (nx - 1), dy=1.0 / (ny - 1), rho=1.0, mu=0.01)
    g = v_momentum_coefficients(u, v, p, **kw)
    w = v_coefficients_window(_pad1(u), _pad1(v), _pad1(p),
                              gi0=0, gj0=0, nx=nx, ny=ny, **kw)
    for name in ("a_e", "a_w", "a_n", "a_s", "a_p", "src"):
        np.testing.assert_allclose(np.asarray(getattr(w, name)),
                                   np.asarray(getattr(g, name)),
                                   rtol=1e-13, atol=1e-15, err_msg=name)


def test_u_window_subblock_equals_global_slice():
    nx = ny = 16
    u, v, p = _fields(nx, ny)
    kw = dict(dx=1.0 / (nx - 1), dy=1.0 / (ny - 1), rho=1.0, mu=0.01)
    g = u_momentum_coefficients(u, v, p, **kw)
    # block (bx, by) = (1, 0) of a 2x2 decomposition: cells 8..15 x 0..7,
    # faces 8..16 x cells 0..7
    nxl = nyl = 8
    gi0, gj0 = 8, 0
    up = _pad1(u)
    vp = _pad1(v)
    pp = _pad1(p)
    # halo-extended local views carved out of the padded global arrays
    u_ext = up[gi0 : gi0 + nxl + 3, gj0 : gj0 + nyl + 2]
    v_ext = vp[gi0 : gi0 + nxl + 2, gj0 : gj0 + nyl + 3]
    p_ext = pp[gi0 : gi0 + nxl + 2, gj0 : gj0 + nyl + 2]
    w = u_coefficients_window(u_ext, v_ext, p_ext, gi0=gi0, gj0=gj0,
                              nx=nx, ny=ny, **kw)
    for name in ("a_e", "a_w", "a_n", "a_s", "a_p", "src"):
        np.testing.assert_allclose(
            np.asarray(getattr(w, name)),
            np.asarray(getattr(g, name))[gi0 : gi0 + nxl + 1, gj0 : gj0 + nyl],
            rtol=1e-13, atol=1e-15, err_msg=name,
        )


def test_v_window_subblock_equals_global_slice():
    nx = ny = 16
    u, v, p = _fields(nx, ny)
    kw = dict(dx=1.0 / (nx - 1), dy=1.0 / (ny - 1), rho=1.0, mu=0.01)
    g = v_momentum_coefficients(u, v, p, **kw)
    nxl = nyl = 8
    gi0, gj0 = 8, 8
    u_ext = _pad1(u)[gi0 : gi0 + nxl + 3, gj0 : gj0 + nyl + 2]
    v_ext = _pad1(v)[gi0 : gi0 + nxl + 2, gj0 : gj0 + nyl + 3]
    p_ext = _pad1(p)[gi0 : gi0 + nxl + 2, gj0 : gj0 + nyl + 2]
    w = v_coefficients_window(u_ext, v_ext, p_ext, gi0=gi0, gj0=gj0,
                              nx=nx, ny=ny, **kw)
    for name in ("a_e", "a_w", "a_n", "a_s", "a_p", "src"):
        np.testing.assert_allclose(
            np.asarray(getattr(w, name)),
            np.asarray(getattr(g, name))[gi0 : gi0 + nxl, gj0 : gj0 + nyl + 1],
            rtol=1e-13, atol=1e-15, err_msg=name,
        )


@pytest.mark.parametrize("variant", ["consistent", "reference", "symmetric"])
def test_poisson_window_equals_global(variant):
    nx = ny = 16
    d_u = jnp.asarray(RNG.random((nx + 1, ny)) + 0.1)
    d_v = jnp.asarray(RNG.random((nx, ny + 1)) + 0.1)
    kw = dict(dx=0.07, dy=0.07, rho=1.2, variant=variant)
    g = poisson_coefficients(d_u, d_v, **kw)
    # full window
    w = poisson_coefficients_window(d_u, d_v, gi0=0, gj0=0, nx=nx, ny=ny, **kw)
    for name in ("a_e", "a_w", "a_n", "a_s", "diag"):
        np.testing.assert_allclose(np.asarray(getattr(w, name)),
                                   np.asarray(getattr(g, name)),
                                   rtol=1e-13, err_msg=name)
    # sub-block (0,1) of 2x2: cells 0..7 x 8..15
    nxl = nyl = 8
    gi0, gj0 = 0, 8
    du_loc = d_u[gi0 : gi0 + nxl + 1, gj0 : gj0 + nyl]
    dv_loc = d_v[gi0 : gi0 + nxl, gj0 : gj0 + nyl + 1]
    w2 = poisson_coefficients_window(du_loc, dv_loc, gi0=gi0, gj0=gj0,
                                     nx=nx, ny=ny, **kw)
    for name in ("a_e", "a_w", "a_n", "a_s", "diag"):
        np.testing.assert_allclose(
            np.asarray(getattr(w2, name)),
            np.asarray(getattr(g, name))[gi0 : gi0 + nxl, gj0 : gj0 + nyl],
            rtol=1e-13, err_msg=name,
        )


# ---------------------------------------------------------------------------
# 9-point (QUICK/LUDS) windows — 2-ring halos
# ---------------------------------------------------------------------------

from naviflow_tpu.ops.highorder import (
    u_momentum_coefficients9,
    v_momentum_coefficients9,
)
from naviflow_tpu.ops.windowed import (
    u_coefficients9_window,
    v_coefficients9_window,
)

C9_NAMES = ("a_e", "a_w", "a_n", "a_s", "a_ee", "a_ww", "a_nn", "a_ss",
            "a_p", "src")


def _pad2(x):
    return jnp.pad(x, 2)


@pytest.mark.parametrize("scheme", ["quick", "luds"])
@pytest.mark.parametrize("kind", ["u", "v"])
def test_window9_full_equals_global(scheme, kind):
    nx, ny = 16, 12
    u, v, p = _fields(nx, ny)
    kw = dict(dx=1.0 / (nx - 1), dy=1.0 / (ny - 1), rho=1.0, mu=0.01)
    if kind == "u":
        g = u_momentum_coefficients9(u, v, p, scheme=scheme, **kw)
        w = u_coefficients9_window(_pad2(u), _pad2(v), _pad2(p),
                                   gi0=0, gj0=0, nx=nx, ny=ny,
                                   scheme=scheme, **kw)
    else:
        g = v_momentum_coefficients9(u, v, p, scheme=scheme, **kw)
        w = v_coefficients9_window(_pad2(u), _pad2(v), _pad2(p),
                                   gi0=0, gj0=0, nx=nx, ny=ny,
                                   scheme=scheme, **kw)
    for name in C9_NAMES:
        np.testing.assert_allclose(np.asarray(getattr(w, name)),
                                   np.asarray(getattr(g, name)),
                                   rtol=1e-13, atol=1e-15, err_msg=name)


@pytest.mark.parametrize("scheme", ["quick", "luds"])
@pytest.mark.parametrize("gi0,gj0", [(8, 0), (0, 8), (8, 8), (0, 0)])
def test_window9_subblock_equals_global_slice(scheme, gi0, gj0):
    nx = ny = 16
    nxl = nyl = 8
    u, v, p = _fields(nx, ny)
    kw = dict(dx=1.0 / (nx - 1), dy=1.0 / (ny - 1), rho=1.0, mu=0.01)
    up, vp, pp = _pad2(u), _pad2(v), _pad2(p)

    gu = u_momentum_coefficients9(u, v, p, scheme=scheme, **kw)
    u_ext2 = up[gi0 : gi0 + nxl + 5, gj0 : gj0 + nyl + 4]
    v_ext2 = vp[gi0 : gi0 + nxl + 4, gj0 : gj0 + nyl + 5]
    p_ext2 = pp[gi0 : gi0 + nxl + 4, gj0 : gj0 + nyl + 4]
    wu = u_coefficients9_window(u_ext2, v_ext2, p_ext2, gi0=gi0, gj0=gj0,
                                nx=nx, ny=ny, scheme=scheme, **kw)
    for name in C9_NAMES:
        np.testing.assert_allclose(
            np.asarray(getattr(wu, name)),
            np.asarray(getattr(gu, name))[gi0 : gi0 + nxl + 1, gj0 : gj0 + nyl],
            rtol=1e-13, atol=1e-15, err_msg=f"u {name}")

    gv = v_momentum_coefficients9(u, v, p, scheme=scheme, **kw)
    wv = v_coefficients9_window(u_ext2, v_ext2, p_ext2, gi0=gi0, gj0=gj0,
                                nx=nx, ny=ny, scheme=scheme, **kw)
    for name in C9_NAMES:
        np.testing.assert_allclose(
            np.asarray(getattr(wv, name)),
            np.asarray(getattr(gv, name))[gi0 : gi0 + nxl, gj0 : gj0 + nyl + 1],
            rtol=1e-13, atol=1e-15, err_msg=f"v {name}")
