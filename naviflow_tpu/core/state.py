"""Flow-state pytrees and field containers.

The reference stores fields in OO containers
(``naviflow_oo/preprocessing/fields/scalar_field.py``, ``vector_field.py``)
and mutates them in place.  Here the solver state is an immutable pytree that
flows through ``jax.jit`` / ``lax.while_loop``; thin ``ScalarField`` /
``VectorField`` wrappers are provided for API familiarity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .bc import BoundaryConditions, apply_velocity_bcs
from .mesh import StructuredMesh


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlowState:
    """Staggered-grid flow state: u (nx+1, ny), v (nx, ny+1), p (nx, ny)."""

    u: jax.Array
    v: jax.Array
    p: jax.Array

    @property
    def dtype(self):
        return self.u.dtype

    def replace(self, **kw) -> "FlowState":
        return dataclasses.replace(self, **kw)


def initialize_state(
    mesh: StructuredMesh,
    bc: BoundaryConditions,
    dtype=jnp.float32,
) -> FlowState:
    """Zero fields with velocity BCs applied.

    Parity with ``BaseAlgorithm.initialize_fields`` (``base_algorithm.py:68-80``).
    """
    u = jnp.zeros(mesh.u_shape, dtype)
    v = jnp.zeros(mesh.v_shape, dtype)
    p = jnp.zeros(mesh.p_shape, dtype)
    u, v = apply_velocity_bcs(u, v, bc)
    return FlowState(u=u, v=v, p=p)


class ScalarField:
    """Cell-centered scalar field wrapper (reference ``scalar_field.py``)."""

    def __init__(self, mesh: StructuredMesh, initial_value=0.0, dtype=jnp.float32):
        self.mesh = mesh
        self.data = jnp.full(mesh.p_shape, initial_value, dtype)

    def set_boundary_value(self, boundary: str, value: float) -> "ScalarField":
        nx, ny = self.mesh.get_dimensions()
        d = self.data
        if boundary == "left":
            d = d.at[0, :].set(value)
        elif boundary == "right":
            d = d.at[nx - 1, :].set(value)
        elif boundary == "bottom":
            d = d.at[:, 0].set(value)
        elif boundary == "top":
            d = d.at[:, ny - 1].set(value)
        else:
            raise ValueError(f"Unknown boundary: {boundary}")
        self.data = d
        return self


class VectorField:
    """Staggered vector field wrapper (reference ``vector_field.py``).

    ``set_boundary_value`` on a staggered top boundary applies the ghost
    reflection ``v[:, ny] = -v[:, ny-1]`` convention used by the reference
    (``vector_field.py:98-113``) when ``reflect=True``.
    """

    def __init__(self, mesh: StructuredMesh, dtype=jnp.float32):
        self.mesh = mesh
        self.u = jnp.zeros(mesh.u_shape, dtype)
        self.v = jnp.zeros(mesh.v_shape, dtype)

    def set_boundary_value(self, boundary: str, u_value=0.0, v_value=0.0, reflect=False):
        nx, ny = self.mesh.get_dimensions()
        if boundary == "top":
            self.u = self.u.at[:, ny - 1].set(u_value)
            if reflect:
                self.v = self.v.at[:, ny].set(-self.v[:, ny - 1])
            else:
                self.v = self.v.at[:, ny].set(v_value)
        elif boundary == "bottom":
            self.u = self.u.at[:, 0].set(u_value)
            self.v = self.v.at[:, 0].set(v_value)
        elif boundary == "left":
            self.u = self.u.at[0, :].set(u_value)
            self.v = self.v.at[0, :].set(v_value)
        elif boundary == "right":
            self.u = self.u.at[nx, :].set(u_value)
            self.v = self.v.at[nx - 1, :].set(v_value)
        else:
            raise ValueError(f"Unknown boundary: {boundary}")
        return self
