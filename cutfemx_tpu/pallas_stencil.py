"""Pallas TPU kernel for the interior grid-stencil apply.

The XLA version of the interior apply (stencil.py:_grid_apply_body)
materializes a (n, n, n, L) gather stack, a same-sized matmul result,
and L sequential dynamic-update-adds — ~1 GB of HBM round trips per
apply at n=108 (measured 41.7 ms, ~8x above the stream roofline).

This kernel fuses the whole thing: each program owns a disjoint
(T, T, Nz) tile of output points, DMAs one halo-extended input block
for all channels into VMEM (halo windows overlap between programs,
which BlockSpec cannot express — hence manual DMA from HBM), evaluates
the per-cube local-matrix action as unrolled vector FMAs over shifted
value slices, masks per cube, and assembles the output tile
gather-style. HBM traffic per apply drops to ~(halo-amplified read +
write) ~= 3-4x the vector size.

Mosaic constraints shape the layout:
- DMA memref slices must be tile-aligned: the minor (lane/z) axis is
  zero-padded to a multiple of 128 and never sliced, and the sliced
  x/y axes use 8-aligned offsets (i*T) with 8-aligned sizes (T+8,
  covering the +2 halo with slack), so every DMA moves whole
  (8, 128) tiles.
- The 0/+1 z offsets of the 2x2x2 cube-slot table become static lane
  rolls (tpu.rotate); the cube mask zeroes every wrapped lane (mask
  lanes >= n are zero).
- The output tile is assembled from value-level slices (gather-style
  sum over slots), so there are no read-modify-write stores at
  unaligned sublane offsets.

Role: the hot SpMV of the cut-Poisson solve — the reference's
per-element assembled-matrix economics (assemble_matrix_impl.h:700-806 +
PETSc MatMult) re-designed for the TPU memory hierarchy.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["interior_stencil_apply", "pad_mask_for_stencil"]

_LANE = 128
_SUB = 8


class _AStatic:
    """Hashable wrapper: the local cube matrix enters the kernel as
    Python-float immediates (compiled constants), not a captured tensor,
    so it can be a jit static argument."""

    def __init__(self, a):
        self.a = np.asarray(a, np.float64)
        self._key = self.a.tobytes()

    def __getitem__(self, ij):
        return self.a[ij]

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _AStatic) and self._key == other._key


def _kernel(T, table, A, nch, xb_hbm, mb_hbm, out_ref, xb, mb, sems):
    """One (T, T, NzP) output tile of points; gathers contributions from
    the (T+1, T+1) extended cube window around it. All lane-dim (z)
    reads/writes are full-width; z offsets are rolls."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    T1 = T + 1
    TW = T + _SUB

    in_dma = pltpu.make_async_copy(
        xb_hbm.at[:, pl.ds(i * T, TW), pl.ds(j * T, TW), :],
        xb, sems.at[0])
    mb_dma = pltpu.make_async_copy(
        mb_hbm.at[pl.ds(i * T, TW), pl.ds(j * T, TW), :],
        mb, sems.at[1])
    in_dma.start()
    mb_dma.start()
    in_dma.wait()
    mb_dma.wait()

    mask = mb[0:T1, 0:T1, :]
    # input slot planes over the (T+1)^2 cube window: point value at
    # z = k + dz lands in lane k (wrapped tail lanes are masked zero)
    xsl = []
    for (ch, (dx, dy, dz)) in table:
        v = xb[ch, dx:dx + T1, dy:dy + T1, :]
        if dz:
            v = jnp.roll(v, -1, axis=-1)
        xsl.append(v)
    # per-slot cube results, masked
    ys = []
    for sp in range(len(table)):
        y = None
        for s in range(len(table)):
            a = float(A[sp, s])
            if a == 0.0:
                continue
            t = a * xsl[s]
            y = t if y is None else y + t
        ys.append(None if y is None else y * mask)
    # gather-style output assembly: out[chp] at tile point p sums
    # y_sp[p - off_sp]; tile points start at cube index 1 of the window
    for chp in range(nch):
        o = None
        for sp, (ch, (dxp, dyp, dzp)) in enumerate(table):
            if ch != chp or ys[sp] is None:
                continue
            v = ys[sp][1 - dxp:1 - dxp + T, 1 - dyp:1 - dyp + T, :]
            if dzp:
                v = jnp.roll(v, 1, axis=-1)
            o = v if o is None else o + v
        out_ref[chp] = o if o is not None else jnp.zeros_like(out_ref[chp])


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _stencil_call(T, table, A_static, interpret, Xp, Mp):
    nch = Xp.shape[0]
    NzP = Xp.shape[3]
    NP = Xp.shape[1] - _SUB
    nT = NP // T
    kern = partial(_kernel, T, table, A_static, nch)
    return pl.pallas_call(
        kern,
        grid=(nT, nT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (nch, T, T, NzP), lambda i, j: (0, i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nch, NP, NP, NzP), Xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((nch, T + _SUB, T + _SUB, NzP), Xp.dtype),
            pltpu.VMEM((T + _SUB, T + _SUB, NzP), Mp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * len(table) ** 2 * NzP * NP * NP,
            bytes_accessed=3 * nch * NP * NP * NzP * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Xp, Mp)


def pad_mask_for_stencil(cube_mask, n, T=8):
    """(n, n, n) cube mask -> zero-padded (NP+8, NP+8, NzP) f32 array the
    kernel DMA-slices per tile (NP = ceil((n+1)/T)*T, NzP = lane-padded
    n+1). Lane k holds cube (i, j, k); lanes >= n are zero, which also
    kills the kernel's roll wrap-around."""
    if T % _SUB:
        raise ValueError(f"tile size T must be a multiple of {_SUB}")
    N = n + 1
    nT = -(-N // T)
    NP = nT * T
    NzP = -(-N // _LANE) * _LANE
    Mp = np.zeros((NP + _SUB, NP + _SUB, NzP), np.float32)
    # padded cube index = global cube + 1 in x/y (same 1-low-side shift
    # as the padded input points); z is unshifted (lane rolls instead)
    Mp[1:n + 1, 1:n + 1, :n] = np.asarray(cube_mask, np.float32)
    return jnp.asarray(Mp)


def interior_stencil_apply(n, N, nch, table, A_local, Mp, Xin, T=8,
                           interpret=False):
    """Interior stencil apply on a masked (nch*N^3,) flat grid vector.

    Equivalent to the xc-stack/einsum/scatter interior path of
    _grid_apply_body; table offsets must be in {0, 1} (the 2x2x2
    cube-slot layout). Mp comes from pad_mask_for_stencil (same T).
    """
    if T % _SUB:
        raise ValueError(f"tile size T must be a multiple of {_SUB}")
    table = tuple((int(ch), (int(o[0]), int(o[1]), int(o[2])))
                  for ch, o in table)
    X = Xin.reshape(nch, N, N, N)
    nT = -(-N // T)
    NP = nT * T
    NzP = -(-N // _LANE) * _LANE
    # +1 halo on the low side of x/y, zero tail padding to NP+8 so every
    # (T+8)-row DMA window is in range; the z (lane) axis is padded to
    # NzP and handled by rolls in the kernel
    Xp = jnp.pad(X, ((0, 0), (1, NP + _SUB - 1 - N), (1, NP + _SUB - 1 - N),
                     (0, NzP - N)))
    out = _stencil_call(T, table, _AStatic(A_local), interpret, Xp, Mp)
    return out[:, :N, :N, :N].reshape(-1)
