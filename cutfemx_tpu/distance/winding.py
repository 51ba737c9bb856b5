"""Fast generalized winding numbers: the Barnes-Hut octree of the
reference (/root/reference/cpp/cutfemx/distance/winding.h:85-330)
re-designed TPU-first as a TWO-LEVEL clustered reduction:

- triangles Morton-sort by centroid and group into fixed-size clusters
  (a flattened octree level: contiguous Morton ranges are spatially
  compact boxes);
- each cluster carries the first-order multipole of the winding
  integrand — the area-weighted normal sum N_c and area centroid
  (Barill et al. 2018 fast winding numbers use the same dipole);
- a query point sums DENSE dipole contributions over all far clusters
  (one batched (P, C) einsum — MXU work, no tree traversal control
  flow) and exact solid angles over the few near clusters' triangles
  (gathered fixed-size blocks).

Accuracy: the dipole term's relative error is O((r_c / d)^2); with the
opening criterion d > beta * r_c (beta = 2) the per-cluster error is
well under the 0.5 threshold margin for sign decisions; near-surface
points take the exact path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["WindingCluster", "build_winding_clusters", "winding_numbers"]


def _morton3(q):
    """Interleave 10-bit coords -> 30-bit Morton codes. q: (N, 3) int."""
    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << 16)) & np.uint64(0x30000FF)
        x = (x | (x << 8)) & np.uint64(0x300F00F)
        x = (x | (x << 4)) & np.uint64(0x30C30C3)
        x = (x | (x << 2)) & np.uint64(0x9249249)
        return x
    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


class WindingCluster:
    """Clustered triangle soup + per-cluster dipoles."""

    def __init__(self, tri_coords, K=64):
        tc = np.asarray(tri_coords, np.float64)      # (NT, 3, 3)
        NT = tc.shape[0]
        cent = tc.mean(axis=1)
        lo = cent.min(axis=0)
        span = np.maximum(cent.max(axis=0) - lo, 1e-300)
        qc = np.minimum((1023 * (cent - lo) / span).astype(np.int64), 1023)
        order = np.argsort(_morton3(qc), kind="stable")
        tc = tc[order]
        pad = (-NT) % K
        if pad:
            # degenerate (zero-area) copies of the last triangle
            filler = np.repeat(tc[-1:, :1, :], 3, axis=1)[None] \
                .repeat(pad, axis=0).reshape(pad, 3, 3)
            tc = np.concatenate([tc, filler])
        C = tc.shape[0] // K
        self.tri = tc.reshape(C, K, 3, 3)
        e1 = self.tri[:, :, 1] - self.tri[:, :, 0]
        e2 = self.tri[:, :, 2] - self.tri[:, :, 0]
        an = 0.5 * np.cross(e1, e2)                  # area-weighted normals
        area = np.linalg.norm(an, axis=-1)           # (C, K)
        self.dipole = an.sum(axis=1)                 # (C, 3)
        w = area / np.maximum(area.sum(axis=1, keepdims=True), 1e-300)
        ctr = self.tri.mean(axis=2)                  # (C, K, 3)
        self.centroid = (w[..., None] * ctr).sum(axis=1)   # (C, 3)
        self.radius = np.sqrt(((self.tri
                                - self.centroid[:, None, None, :]) ** 2)
                              .sum(-1).max(axis=(1, 2)))   # (C,)
        self.n_clusters = C
        self.K = K


def build_winding_clusters(soup, K=64):
    return WindingCluster(soup.triangle_coords(), K=K)


def _solid_angles(p, tri):
    """Exact per-triangle solid angle sum (van Oosterom-Strackee).
    p: (P, 3); tri: (P, M, 3, 3) -> (P,)."""
    a = tri[:, :, 0, :] - p[:, None, :]
    b = tri[:, :, 1, :] - p[:, None, :]
    c = tri[:, :, 2, :] - p[:, None, :]
    la = jnp.linalg.norm(a, axis=-1)
    lb = jnp.linalg.norm(b, axis=-1)
    lc = jnp.linalg.norm(c, axis=-1)
    num = jnp.einsum("pmg,pmg->pm", a, jnp.cross(b, c))
    den = (la * lb * lc + jnp.einsum("pmg,pmg->pm", a, b) * lc
           + jnp.einsum("pmg,pmg->pm", b, c) * la
           + jnp.einsum("pmg,pmg->pm", a, c) * lb)
    return jnp.sum(2.0 * jnp.arctan2(num, den), axis=1)


@jax.jit
def _far_field(p, centroid, dipole, far_mask):
    """Dipole winding contribution of far clusters: (P,)."""
    d = centroid[None, :, :] - p[:, None, :]         # (P, C, 3)
    r2 = jnp.sum(d * d, axis=-1)
    r3 = r2 * jnp.sqrt(r2)
    contrib = jnp.einsum("pcg,cg->pc", d, dipole) / jnp.maximum(
        r3, 1e-300)
    return jnp.sum(jnp.where(far_mask, contrib, 0.0), axis=1)


@jax.jit
def _near_field(p, tri_blocks):
    """Exact winding over gathered near-cluster triangle blocks.
    tri_blocks: (P, M, K, 3, 3) (padded blocks repeat a degenerate
    triangle -> zero contribution)."""
    P_, M, K = tri_blocks.shape[:3]
    return _solid_angles(p, tri_blocks.reshape(P_, M * K, 3, 3))


def winding_numbers(points, clusters: WindingCluster, beta=2.0,
                    chunk=4096):
    """Generalized winding numbers at query points (host orchestration,
    device math). Returns (NP,) float64."""
    pts = np.asarray(points, np.float64)
    C = clusters.n_clusters
    cen = jnp.asarray(clusters.centroid)
    dip = jnp.asarray(clusters.dipole)
    rad = clusters.radius
    tri = jnp.asarray(clusters.tri)
    # one all-zero block for padding near-lists (degenerate triangles)
    tri_pad = jnp.concatenate([tri, jnp.zeros((1,) + tri.shape[1:])])

    out = np.empty(len(pts))
    for s in range(0, len(pts), chunk):
        p = pts[s:s + chunk]
        d2 = ((p[:, None, :] - clusters.centroid[None]) ** 2).sum(-1)
        near = d2 <= (beta * rad[None]) ** 2         # (P, C) host
        counts = near.sum(axis=1)
        M = max(int(counts.max()), 1)
        idx = np.full((len(p), M), C, np.int64)      # C -> zero block
        rows, cols = np.nonzero(near)
        slot = np.concatenate([np.arange(c) for c in counts]) \
            if counts.sum() else np.zeros(0, np.int64)
        idx[rows, slot] = cols
        pj = jnp.asarray(p)
        w = _far_field(pj, cen, dip, jnp.asarray(~near)) \
            + _near_field(pj, tri_pad[jnp.asarray(idx)])
        out[s:s + chunk] = np.asarray(w)
    return out / (4.0 * np.pi)
