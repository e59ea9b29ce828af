"""MG debug-dump parity tool (reference multigrid.py:26-29 debug mode)."""

import jax.numpy as jnp
import pytest

import naviflow_tpu as nf
from naviflow_tpu.algorithms import SIMPLEConfig, simple_solve
from naviflow_tpu.core.bc import apply_velocity_bcs
from naviflow_tpu.ops.poisson import pressure_rhs
from naviflow_tpu.ops.powerlaw import (d_coefficient, relax_coefficients,
                                       u_momentum_coefficients,
                                       v_momentum_coefficients)
from naviflow_tpu.solvers.multigrid import (MultigridConfig, _cycle,
                                            build_levels)
from naviflow_tpu.utils.mg_debug import debug_vcycle, dump_vcycle_pdf


def _problem(nx=31):
    mesh = nf.StructuredMesh(nx=nx, ny=nx)
    fluid = nf.FluidProperties(density=1.0, reynolds_number=100.0)
    bc = nf.lid_driven_cavity(1.0)
    st = nf.initialize_state(mesh, bc)
    st, _ = simple_solve(mesh, fluid, bc, st,
                         SIMPLEConfig(max_iterations=30, tolerance=0.0))
    dx, dy = mesh.get_cell_sizes()
    u, v = apply_velocity_bcs(st.u, st.v, bc)
    cu = relax_coefficients(
        u_momentum_coefficients(u, v, st.p, dx=dx, dy=dy, rho=1.0, mu=1e-2),
        u, 0.7)
    cv = relax_coefficients(
        v_momentum_coefficients(u, v, st.p, dx=dx, dy=dy, rho=1.0, mu=1e-2),
        v, 0.7)
    d_u = d_coefficient(cu.a_p, dy, is_u=True)
    d_v = d_coefficient(cv.a_p, dx, is_u=False)
    cfg = MultigridConfig()
    levels = build_levels(d_u, d_v, cfg, dx=dx, dy=dy, rho=1.0,
                          variant="consistent")
    b = pressure_rhs(u, v, dx=dx, dy=dy, rho=1.0)
    return levels, b, cfg


def test_debug_vcycle_bit_identical_to_production_cycle():
    levels, b, cfg = _problem()
    p0 = jnp.zeros_like(b)
    p_ref = _cycle(p0, b, levels, 0, cfg)
    p_dbg, stages = debug_vcycle(p0, b, levels, cfg)
    assert float(jnp.max(jnp.abs(p_ref - p_dbg))) == 0.0
    # chronological stage record: 6 stages per non-coarsest level + 1
    # coarsest (reference lists pre-smooth/residual/restrict/interpolate/
    # correct/post-smooth)
    assert len(stages) == 6 * (len(levels) - 1) + 1
    assert "pre-smoothing" in stages[0][0]
    assert "coarsest" in stages[3 * (len(levels) - 1)][0]
    assert "post-smoothing" in stages[-1][0]


def test_dump_vcycle_pdf_writes_pages(tmp_path):
    levels, b, cfg = _problem()
    path = tmp_path / "mg_debug.pdf"
    _, n_pages = dump_vcycle_pdf(path, jnp.zeros_like(b), b, levels, cfg,
                                 n_cycles=2)
    assert path.exists() and path.stat().st_size > 1000
    assert n_pages == 2 * (6 * (len(levels) - 1) + 1)
