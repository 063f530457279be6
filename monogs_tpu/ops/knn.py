"""K-nearest-neighbor mean squared distance (simple-knn replacement).

TPU-native equivalent of the `simple_knn._C.distCUDA2` CUDA extension
(reference .gitmodules:1-3, call site gaussian_splatting/scene/
gaussian_model.py:294-303): for each point, the mean squared distance to its
3 nearest neighbors, used to initialize new-Gaussian scales.

Implemented as a blocked pairwise-distance computation: the |x-y|^2 expansion
puts the cross term on the MXU (a single matmul), and a 3-step running-min
extracts the 3 smallest distances without a sort. Invalid points (masked)
neither contribute as neighbors nor receive distances.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e10


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_mean_sq_dist(
    points: jnp.ndarray,            # (N, 3)
    mask: jnp.ndarray | None = None,  # (N,) bool; False = padding
    k: int = 3,
    block: int = 1024,
) -> jnp.ndarray:
    """Mean squared distance of each point to its k nearest (valid) neighbors."""
    N = points.shape[0]
    if mask is None:
        mask = jnp.ones((N,), bool)
    sq = jnp.sum(points * points, axis=-1)            # (N,)

    pad = (-N) % block
    pts_p = jnp.pad(points, ((0, pad), (0, 0)))
    sq_p = jnp.pad(sq, (0, pad))
    mask_p = jnp.pad(mask, (0, pad))
    nb = (N + pad) // block

    def process_block(i):
        rows = jax.lax.dynamic_slice_in_dim(pts_p, i * block, block)      # (B,3)
        rows_sq = jax.lax.dynamic_slice_in_dim(sq_p, i * block, block)
        rows_mask = jax.lax.dynamic_slice_in_dim(mask_p, i * block, block)
        # Full pairwise distances block x all: |a-b|^2 = |a|^2 - 2ab + |b|^2
        cross = rows @ pts_p.T                                            # (B, NP)
        d2 = rows_sq[:, None] - 2.0 * cross + sq_p[None, :]
        # Exclude self and invalid neighbors.
        col = jnp.arange(sq_p.shape[0])[None, :]
        row_ids = i * block + jnp.arange(block)[:, None]
        d2 = jnp.where((col == row_ids) | ~mask_p[None, :], _BIG, d2)
        d2 = jnp.maximum(d2, 0.0)
        # k smallest via running min-extraction (k is tiny).
        total = jnp.zeros((block,), d2.dtype)
        for _ in range(k):
            m = jnp.min(d2, axis=1)
            total = total + m
            d2 = jnp.where(d2 <= m[:, None], _BIG, d2)
        return jnp.where(rows_mask, total / k, 0.0)

    out = jax.lax.map(process_block, jnp.arange(nb))
    return out.reshape(-1)[:N]
