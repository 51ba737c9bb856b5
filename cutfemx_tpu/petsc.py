"""Solver-backend layer mirroring ``cutfemx.petsc``
(/root/reference/python/cutfemx/petsc.py): the reference duplicates its
assembly/deactivation surface onto PETSc Mat/Vec (including nest-matrix
blocks). Here the same API is provided over the host CSR backend, and when
``petsc4py`` is importable the assembled operators are converted to PETSc
matrices so user KSP code keeps working.

The TPU-native solve path does not need PETSc: matrix-free CG/BiCGStab on
device (``fem.CutOperator``/``la``) is the performance route; this module
exists for API parity and for coupling to external CPU solver stacks.
"""

from __future__ import annotations

import numpy as np

from . import fem as _fem
from .la import MatrixCSR

__all__ = [
    "assemble_matrix", "assemble_vector", "create_matrix",
    "deactivate_outside", "deactivate_outside_blocks", "zero_rows",
    "zero_block_rows", "apply_lifting", "set_bc",
    "assemble_extension_penalty", "to_petsc",
]


def _have_petsc():
    try:
        import petsc4py  # noqa: F401
        return True
    except ImportError:
        return False


def to_petsc(A: MatrixCSR):
    """Convert a host CSR matrix to a PETSc Mat (requires petsc4py)."""
    if not _have_petsc():
        raise RuntimeError(
            "petsc4py is not available in this environment; use the "
            "MatrixCSR/CutOperator paths instead")
    from petsc4py import PETSc
    m = A.to_scipy().tocsr()
    return PETSc.Mat().createAIJ(size=m.shape,
                                 csr=(m.indptr, m.indices, m.data))


def assemble_matrix(form, bcs=None, petsc=False):
    """Assemble; with petsc=True (and petsc4py present) return a PETSc
    Mat, otherwise a MatrixCSR (identical values — the reference's
    test_petsc.py:31 path-equality contract)."""
    A = _fem.assemble_matrix(form, bcs=bcs)
    return to_petsc(A) if petsc else A


def assemble_vector(form):
    return np.array(_fem.assemble_vector(form))


def create_matrix(form, extension_terms=None):
    return _fem.create_matrix(form, extension_terms)


deactivate_outside = _fem.deactivate_outside
deactivate_outside_blocks = _fem.deactivate_outside_blocks
zero_rows = _fem.zero_rows
zero_block_rows = _fem.zero_block_rows
apply_lifting = _fem.apply_lifting
set_bc = _fem.set_bc


def assemble_extension_penalty(A, V, cut_data, aggregation, beta=None,
                               quadrature_degree=None):
    from .extensions import assemble_extension_penalty as _aep
    return _aep(A, V, cut_data, aggregation, beta, quadrature_degree)


def assemble_matrix_nest(form_expr_or_blocks, petsc=False):
    """Assemble a mixed form into block ("nest") structure: a nested list
    of per-block matrices with None for empty blocks (the reference's
    assemble_matrix_nest, petsc.py:330-344). Accepts a mixed form
    expression, a MixedCutForm, or an extract_blocks grid. With
    petsc=True and petsc4py present, returns a PETSc MatNest."""
    if isinstance(form_expr_or_blocks, _fem.MixedCutForm):
        blocks = form_expr_or_blocks.blocks
    elif isinstance(form_expr_or_blocks, (list, tuple)) and \
            form_expr_or_blocks and isinstance(form_expr_or_blocks[0],
                                               (list, tuple)):
        blocks = form_expr_or_blocks
    else:
        blocks = _fem.extract_blocks(form_expr_or_blocks)
    A = [[_fem.assemble_matrix(blk) if blk is not None else None
          for blk in row] for row in blocks]
    if not petsc:
        return A
    if not _have_petsc():
        raise RuntimeError("petsc4py is not available in this environment")
    from petsc4py import PETSc
    mats = [[to_petsc(blk) if blk is not None else None for blk in row]
            for row in A]
    return PETSc.Mat().createNest(mats)


def assemble_vector_nest(form_expr_or_blocks, spaces=None):
    """Assemble a mixed rank-1 form into per-block vectors (zero-filled
    for absent blocks when the owning spaces are known)."""
    if isinstance(form_expr_or_blocks, _fem.MixedCutForm):
        f = form_expr_or_blocks
        return [np.array(_fem.assemble_vector(b)) if b is not None
                else np.zeros(sp.dim)
                for b, sp in zip(f.blocks, f.test_spaces)]
    blocks = (_fem.extract_blocks(form_expr_or_blocks)
              if not isinstance(form_expr_or_blocks, (list, tuple))
              else form_expr_or_blocks)
    out = []
    for i, b in enumerate(blocks):
        if b is not None:
            out.append(np.array(_fem.assemble_vector(b)))
        elif spaces is not None:
            out.append(np.zeros(spaces[i].dim))
        else:
            out.append(None)
    return out
