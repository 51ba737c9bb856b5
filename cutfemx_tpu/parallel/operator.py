"""Multi-device sharding: distributed assembly + matrix-free solves.

The TPU-native replacement for the reference's MPI domain decomposition
(SURVEY.md §2f): the element batch (cells) is sharded over a 1D device mesh
axis ``cells``; element kernels run shard-local, and the global scatter-add
is a ``psum`` over the mesh axis inside ``shard_map`` (the role of DOLFINx
``scatter_rev(add)``). Krylov vectors are kept replicated, so CG's dot
products need no extra collectives; communication is exactly one psum per
operator application, riding ICI.

A halo-exchange (owner-computes, ``ppermute``) variant for very large dof
counts lands with the scaling milestone.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_device_mesh", "pad_to_multiple", "shard_instances",
           "sharded_matfree_operator", "sharded_cut_poisson_step"]


def make_device_mesh(n_devices=None, axis="cells", devices=None):
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def pad_to_multiple(arr, multiple, axis=0):
    """Zero-pad along axis to a multiple (element batches must divide the
    device count; zero rows scatter zeros into dof 0 — harmless)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    if isinstance(arr, np.ndarray):
        return np.pad(arr, pad)
    return jnp.pad(arr, pad)


def shard_instances(element_matrices, dofs, mesh, axis="cells"):
    """Shard (E, nd, nd) element matrices and (E, nd) dof maps over the
    device mesh, padding E to a multiple of the axis size."""
    n = mesh.shape[axis]
    out_m, out_d = [], []
    for Ae, dd in zip(element_matrices, dofs):
        Ae = pad_to_multiple(jnp.asarray(Ae), n)
        dd = pad_to_multiple(jnp.asarray(dd), n)
        sm = NamedSharding(mesh, P(axis))
        out_m.append(jax.device_put(Ae, sm))
        out_d.append(jax.device_put(dd, sm))
    return out_m, out_d


def sharded_matfree_operator(element_matrices, dofs, dim, mesh,
                             axis="cells", active=None):
    """Matrix-free A@x with cells sharded over the mesh axis.

    element_matrices: list of (E_i, nd_i, nd_i); dofs: list of (E_i, nd_i)
    (already sharded via shard_instances). x is replicated; the return is
    replicated (one psum per apply)."""

    in_specs = tuple((P(axis), P(axis)) for _ in element_matrices)
    flat_specs = sum(in_specs, ()) + (P(),)

    @partial(jax.shard_map, mesh=mesh, in_specs=flat_specs, out_specs=P())
    def _apply(*args):
        *pairs, x = args
        y = jnp.zeros(dim, x.dtype)
        for i in range(len(element_matrices)):
            Ae, dd = pairs[2 * i], pairs[2 * i + 1]
            xe = x[dd]
            ye = jnp.einsum("eij,ej->ei", Ae, xe)
            y = y.at[dd.ravel()].add(ye.ravel())
        return jax.lax.psum(y, axis)

    def apply(x):
        if active is not None:
            xin = jnp.where(active, x, 0.0)
        else:
            xin = x
        flat = []
        for Ae, dd in zip(element_matrices, dofs):
            flat += [Ae, dd]
        y = _apply(*flat, xin)
        if active is not None:
            y = jnp.where(active, y, x)
        return y

    return apply


def sharded_cut_poisson_step(form, domain, mesh, axis="cells",
                             cg_iters=20):
    """Build a jitted distributed step for a rank-2 cut form: shard element
    batches, assemble element matrices on-device, run ``cg_iters`` CG
    iterations with Jacobi preconditioning. Returns (step_fn, b_template).

    This is the multi-chip 'training step' the driver dry-runs
    (__graft_entry__.dryrun_multichip)."""
    from ..fem import CutOperator
    from ..la import cg

    # precompute element matrices (host-side jit), then shard
    op = CutOperator(form, domain)
    mats, dofs = shard_instances(op.element_matrices, op.row_dofs, mesh,
                                 axis)
    active = op.active
    apply = sharded_matfree_operator(mats, dofs, op.dim, mesh, axis,
                                     active=active)

    d = op.diagonal()

    @jax.jit
    def step(b):
        bb = jnp.where(active, b, 0.0) if active is not None else b
        x, its, res = cg(apply, bb, M=lambda r: r / d, rtol=1e-12,
                         maxiter=cg_iters)
        return x, res

    return step
