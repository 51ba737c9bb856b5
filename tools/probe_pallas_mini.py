"""Minimal TPU repro for the Pallas interior-stencil kernel: synthetic
table/matrix/mask (no FEM build), small n — fast compile iterations."""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cutfemx_tpu.pallas_stencil import (interior_stencil_apply,
                                            pad_mask_for_stencil)
    from cutfemx_tpu.stencil import _local_dof_table

    n = int(os.environ.get("MINI_N", "16"))
    T = int(os.environ.get("MINI_T", "8"))
    deg = 2
    N = n + 1
    table = tuple((ch, off) for ch, off in _local_dof_table(deg))
    nch = 8
    L = len(table)
    rng = np.random.default_rng(0)
    M = rng.standard_normal((L, L)).astype(np.float32)
    A_local = (M + M.T + 2 * L * np.eye(L, dtype=np.float32))
    cube_mask = rng.random((n, n, n)) < 0.8
    gsize = nch * N ** 3
    x = jnp.asarray(rng.standard_normal(gsize).astype(np.float32))
    A_j = jnp.asarray(A_local)
    mask_j = jnp.asarray(cube_mask)

    def xla_interior(xx):
        X = xx.reshape(nch, N, N, N)
        parts = [X[ch, dx:dx + n, dy:dy + n, dz:dz + n]
                 for (ch, (dx, dy, dz)) in table]
        xc = jnp.stack(parts, axis=-1)
        yc = jnp.einsum("xyzl,lm->xyzm", xc, A_j,
                        precision=jax.lax.Precision.HIGHEST)
        yc = jnp.where(mask_j[..., None], yc, 0.0)
        Y = jnp.zeros_like(X)
        for s, (ch, (dx, dy, dz)) in enumerate(table):
            Y = Y.at[ch, dx:dx + n, dy:dy + n, dz:dz + n].add(yc[..., s])
        return Y.reshape(-1)

    Mp = pad_mask_for_stencil(cube_mask, n, T=T)

    def pallas_interior(xx):
        return interior_stencil_apply(n, N, nch, table, A_local, Mp, xx,
                                      T=T)

    t0 = time.perf_counter()
    y_p = np.asarray(jax.jit(pallas_interior)(x))
    print(f"pallas n={n} T={T} compile+1st {time.perf_counter()-t0:.1f}s",
          flush=True)
    y_x = np.asarray(jax.jit(xla_interior)(x))
    err = np.abs(y_p - y_x).max() / (np.abs(y_x).max() + 1e-30)
    print(f"pallas vs XLA rel err {err:.2e}", flush=True)
    assert err < 2e-6


if __name__ == "__main__":
    main()
