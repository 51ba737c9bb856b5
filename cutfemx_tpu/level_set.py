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


def conormal(normal_field, *, tolerance=1e-14, name=None):
    """Side-aware surface conormal for runtime dS measures
    (/root/reference/python/cutfemx/level_set.py:606 and
    cpp/cutfemx/geometry/conormal.h:237-296): the unit vector tangent to
    the surface and normal to the skeleton curve, pointing out of each
    side's cell — mu_side = normalize((I - n n^T) n_facet,side).
    ``normal_field`` is a vector QuadratureField (cutfemx_tpu.normal)."""
    if not isinstance(normal_field, QuadratureField) or \
            len(normal_field.shape) != 1:
        raise TypeError("conormal expects a vector-valued quadrature field")
    mesh = normal_field.mesh
    gdim = mesh.gdim
    from .geometry import facet_reference_normals, pullback
    import jax

    def evaluator(rules, side):
        if rules.local_facets is None:
            raise ValueError(
                "conormal requires facet-hosted runtime rules (a runtime "
                "dS measure)")
        n_surf = jnp.asarray(normal_field.evaluator(rules))  # (E, Q, g)
        facets = rules.parent_map
        col = 0 if side == "+" else 1
        cells = mesh.facet_cells[facets, col]
        locals_ = mesh.facet_local_index[facets, col]
        pts = jnp.asarray(rules.points_padded)    # '+' cell ref coords
        coords = jnp.asarray(mesh.cell_vertex_coords[cells], pts.dtype)
        if side == "-":
            plus_coords = jnp.asarray(
                mesh.cell_vertex_coords[rules.parent_cells], pts.dtype)
            phi1 = lagrange_element(mesh.cell_type, 1).tabulate(pts)
            xq = jnp.einsum("eqv,evg->eqg", phi1, plus_coords)
            pts = jax.vmap(lambda c, x: pullback(
                mesh.cell_type, c, x))(coords, xq)
        el1 = lagrange_element(mesh.cell_type, 1)
        dphi = el1.tabulate_grad(pts)             # (E, Q, nv, t)
        J = jnp.einsum("evg,eqvt->eqgt", coords, dphi)
        K = jnp.linalg.inv(J) if J.shape[-1] == J.shape[-2] else \
            jnp.linalg.pinv(J)
        nref = jnp.asarray(facet_reference_normals(mesh.cell_type),
                           pts.dtype)[jnp.asarray(locals_)]  # (E, t)
        nf = jnp.einsum("eqtg,et->eqg", K, nref)
        nf = nf / jnp.maximum(jnp.linalg.norm(nf, axis=-1, keepdims=True),
                              tolerance)
        mu = nf - jnp.einsum("eqg,eqg->eq", nf, n_surf)[..., None] * n_surf
        nrm = jnp.linalg.norm(mu, axis=-1, keepdims=True)
        return mu / jnp.maximum(nrm, tolerance)

    return QuadratureField(name or "conormal", (gdim,), evaluator,
                           mesh=mesh, side_dependent=True)


def correction_distance(level_set, direction, *, max_iterations=20,
                        tolerance=1e-12, name=None):
    """Root-finding distance rho(x) such that phi(x + rho * d(x)) = 0
    along a direction quadrature field (geometry/correction_distance.h:
    71-358): Newton iterations with the host cell's polynomial extension
    of phi."""
    mesh = level_set.function_space.mesh
    from .geometry import pullback
    import jax

    def evaluator(rules):
        d = jnp.asarray(direction.evaluator(rules))        # (E, Q, g)
        pts = jnp.asarray(rules.points_padded)             # (E, Q, t)
        cells = rules.parent_cells
        coords = jnp.asarray(mesh.cell_vertex_coords[cells], pts.dtype)
        el1 = lagrange_element(mesh.cell_type, 1)
        phi1 = el1.tabulate(pts)
        x0 = jnp.einsum("eqv,evg->eqg", phi1, coords)
        V = level_set.function_space
        dofs = jnp.asarray(level_set.x)[V.dofmap[cells]]

        def phi_and_grad(x):
            ref = jax.vmap(lambda c, xx: pullback(
                mesh.cell_type, c, xx))(coords, x)
            val = jnp.einsum("eqn,en->eq", V.element.tabulate(ref), dofs)
            rg = jnp.einsum("eqnt,en->eqt", V.element.tabulate_grad(ref),
                            dofs)
            dphi = el1.tabulate_grad(ref)
            J = jnp.einsum("evg,eqvt->eqgt", coords, dphi)
            K = jnp.linalg.inv(J)
            g = jnp.einsum("eqtg,eqt->eqg", K, rg)
            return val, g

        rho = jnp.zeros(pts.shape[:2], pts.dtype)
        for _ in range(max_iterations):
            x = x0 + rho[..., None] * d
            val, g = phi_and_grad(x)
            slope = jnp.einsum("eqg,eqg->eq", g, d)
            step = val / jnp.where(jnp.abs(slope) > tolerance, slope, 1.0)
            rho = rho - jnp.where(jnp.abs(slope) > tolerance, step, 0.0)
        return rho

    return QuadratureField(name or "correction_distance", (), evaluator,
                           mesh=mesh)
