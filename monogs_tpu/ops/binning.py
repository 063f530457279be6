"""Tile binning: per-tile, depth-sorted Gaussian index lists (pure JAX).

TPU-native counterpart of the CUDA rasterizer's duplicate-with-keys +
radix-sort + tile-range stage. Instead of dynamic per-tile lists we build a
static-capacity (num_tiles, K) index matrix:

  1. each visible Gaussian covers a rectangle of tiles; it is duplicated into
     up to MAX_DUP (tile, depth, idx) entries (static-shape padding),
  2. a two-key lexicographic sort by (tile_id, depth) groups entries per tile
     in front-to-back order,
  3. searchsorted finds each tile's segment; a gather builds the padded
     (T, K) matrix with sentinel index N for empty slots.

The index matrix carries no gradients (indices are ints); gradients flow
through the *gather* of Gaussian features by these indices, whose transpose
(scatter-add) XLA generates automatically.

Capacity overflow (per-Gaussian duplicate count > MAX_DUP or per-tile count
> K) is reported via the returned `overflow` diagnostics so callers can
re-render with a bigger bucket.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    index_matrix: jnp.ndarray  # (T, K) int32, sentinel = N for empty
    counts: jnp.ndarray        # (T,) int32 actual entries per tile (capped)
    overflow: jnp.ndarray      # () int32: dropped entries (dup + tile caps)


@functools.partial(
    jax.jit,
    static_argnames=("img_w", "img_h", "tile_size", "tile_capacity", "max_dup"),
)
def tile_bin(
    mean2d: jnp.ndarray,   # (N,2) pixel coords
    radius: jnp.ndarray,   # (N,) screen radius (0 => culled)
    depth: jnp.ndarray,    # (N,)
    valid: jnp.ndarray,    # (N,) bool
    img_w: int,
    img_h: int,
    tile_size: int = 16,
    tile_capacity: int = 512,
    max_dup: int = 16,
) -> TileBins:
    N = mean2d.shape[0]
    tiles_x = -(-img_w // tile_size)
    tiles_y = -(-img_h // tile_size)
    T = tiles_x * tiles_y

    mean2d = jax.lax.stop_gradient(mean2d)
    radius = jax.lax.stop_gradient(radius)
    depth = jax.lax.stop_gradient(depth)

    u, v = mean2d[:, 0], mean2d[:, 1]
    x0 = jnp.clip(jnp.floor((u - radius) / tile_size), 0, tiles_x).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil((u + radius + 1) / tile_size), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((v - radius) / tile_size), 0, tiles_y).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil((v + radius + 1) / tile_size), 0, tiles_y).astype(jnp.int32)
    w = jnp.where(valid, x1 - x0, 0)
    h = jnp.where(valid, y1 - y0, 0)
    n_cover = w * h                                   # (N,)

    # Duplicate: entry d of Gaussian i covers tile (x0 + d%w, y0 + d//w).
    d = jnp.arange(max_dup, dtype=jnp.int32)[None, :]          # (1,D)
    w_safe = jnp.maximum(w, 1)[:, None]
    tx = x0[:, None] + d % w_safe
    ty = y0[:, None] + d // w_safe
    dup_valid = d < n_cover[:, None]                           # (N,D)
    tile_id = jnp.where(dup_valid, ty * tiles_x + tx, T).astype(jnp.int32)

    flat_tile = tile_id.reshape(-1)
    flat_depth = jnp.broadcast_to(depth[:, None], tile_id.shape).reshape(-1)
    flat_idx = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], tile_id.shape
    ).reshape(-1)

    # Lexicographic (tile, depth) sort; invalid entries (tile_id=T) sink.
    sort_tile, _, sort_idx = jax.lax.sort(
        (flat_tile, flat_depth, flat_idx), num_keys=2
    )

    # Per-tile segments.
    starts = jnp.searchsorted(sort_tile, jnp.arange(T + 1, dtype=jnp.int32))
    seg_counts = starts[1:] - starts[:-1]                      # (T,)
    counts = jnp.minimum(seg_counts, tile_capacity).astype(jnp.int32)

    k = jnp.arange(tile_capacity, dtype=jnp.int32)[None, :]    # (1,K)
    gather_pos = starts[:-1, None] + k                         # (T,K)
    in_range = k < counts[:, None]
    gather_pos = jnp.where(in_range, gather_pos, 0)
    index_matrix = jnp.where(in_range, sort_idx[gather_pos], N).astype(jnp.int32)

    overflow = jnp.sum(jnp.maximum(n_cover - max_dup, 0)) + jnp.sum(
        jnp.maximum(seg_counts - tile_capacity, 0)
    )
    return TileBins(index_matrix=index_matrix, counts=counts,
                    overflow=overflow.astype(jnp.int32))
