"""Level-set quantities as quadrature-point fields.

Mirrors /root/reference/python/cutfemx/level_set.py: lazy fields evaluated
at runtime quadrature points for use inside weak forms — ``normal`` is
sign*grad(phi)/|grad(phi)| (cpp/cutfemx/level_set/normal.h:35),
``level_set_value`` tabulates phi (level_set/value.h:34-119),
``surface_normal`` is the geometric normal of the cut facet
(geometry/surface_normal.h). Evaluators receive the RuntimeQuadratureRules
and return padded (n, Qmax, *shape) arrays aligned with them.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .elements import lagrange_element
from .forms.dsl import QuadratureField

__all__ = ["normal", "level_set_value", "surface_normal", "conormal",
           "correction_distance"]


def _phi_dofs_per_parent(phi, rules):
    V = phi.function_space
    cells = rules.parent_cells
    return jnp.asarray(phi.x)[V.dofmap[cells]]


def _tabulate_at_rule_points(space, rules):
    """Basis values/grads of `space` at the padded rule points.

    Returns (val (n, Qmax, nd), refgrad (n, Qmax, nd, tdim))."""
    el = space.element
    pts = jnp.asarray(rules.points_padded)
    return el.tabulate(pts), el.tabulate_grad(pts)


def level_set_value(level_set, *, name=None):
    """Lazy quadrature field of phi values (level_set.py:545)."""

    def evaluator(rules):
        dofs = _phi_dofs_per_parent(level_set, rules)
        val, _ = _tabulate_at_rule_points(level_set.function_space, rules)
        return jnp.einsum("nqd,nd->nq", val, dofs)

    return QuadratureField(name or "level_set_value", (), evaluator,
                           mesh=level_set.function_space.mesh)


def normal(level_set, *, name=None, sign=1.0):
    """Lazy quadrature field sign*grad(phi)/|grad(phi)| (level_set.py:553,
    normal.h:35-188; norm clamped at 1e-14)."""
    mesh = level_set.function_space.mesh
    gdim = mesh.gdim

    def evaluator(rules):
        dofs = _phi_dofs_per_parent(level_set, rules)
        _, rg = _tabulate_at_rule_points(level_set.function_space, rules)
        gref = jnp.einsum("nqdt,nd->nqt", rg, dofs)      # (n, Q, tdim)
        # K = J^{-1} at the rule points
        el1 = lagrange_element(mesh.cell_type, 1)
        pts = jnp.asarray(rules.points_padded)
        dphi = el1.tabulate_grad(pts)                    # (n, Q, nv, tdim)
        coords = jnp.asarray(mesh.cell_vertex_coords[rules.parent_cells],
                             pts.dtype)
        J = jnp.einsum("nvg,nqvt->nqgt", coords, dphi)
        K = jnp.linalg.inv(J) if J.shape[-1] == J.shape[-2] \
            else jnp.linalg.pinv(J)
        g = jnp.einsum("nqtg,nqt->nqg", K, gref)
        nrm = jnp.linalg.norm(g, axis=-1, keepdims=True)
        return sign * g / jnp.maximum(nrm, 1e-14)

    return QuadratureField(name or "normal", (gdim,), evaluator, mesh=mesh)


def surface_normal(cut_data, selector=None, *, name=None, sign=1.0):
    """Geometric (facet-exact) normal of the cut surface, read from the
    normals the marching tables recorded on the interface rules
    (the role of RuntimeSurfaceProvenance, cut/runtime_quadrature.h:30-41).
    """
    mesh = cut_data.mesh

    def evaluator(rules):
        if rules.normals_padded is None:
            raise ValueError(
                "surface_normal requires interface ('phi=0') runtime rules")
        return sign * jnp.asarray(rules.normals_padded)

    return QuadratureField(name or "surface_normal", (mesh.gdim,),
                           evaluator, mesh=mesh)


def conormal(cut_data, selector=None, *, name=None):
    """Side-aware surface conormal (geometry/conormal.h) — pending the
    surface-DG milestone."""
    raise NotImplementedError(
        "conormal lands with the surface-PDE milestone")


def correction_distance(level_set, direction, *, name=None):
    """Root-finding distance along a direction field
    (geometry/correction_distance.h) — pending the surface-PDE milestone."""
    raise NotImplementedError(
        "correction_distance lands with the surface-PDE milestone")
