"""Tile binning: per-tile, depth-sorted Gaussian index lists (pure JAX).

TPU-native counterpart of the CUDA rasterizer's duplicate-with-keys +
radix-sort + tile-range stage. Instead of dynamic per-tile lists we build a
static-capacity (num_tiles, K) index matrix:

  1. each visible Gaussian covers a rectangle of tiles; it is duplicated into
     up to MAX_DUP (tile, depth, idx) entries (static-shape padding),
  2. a single-int32-key sort groups entries per tile in front-to-back order —
     the key packs [tile_id | top bits of the IEEE-754 depth], exploiting
     that positive-float bit patterns are monotonic (same trick as the CUDA
     64-bit tile|depth keys, at 2^-11 relative depth resolution),
  3. searchsorted finds each tile's segment; a gather builds the padded
     (T, K) matrix with sentinel index N for empty slots.

The index matrix carries no gradients (indices are ints); gradients flow
through the *gather* of Gaussian features by these indices. To avoid XLA's
slow scatter-add in the gather's transpose, binning also emits
`slot_of_entry`: for every duplicated entry (gaussian i, dup d) the linear
(tile, slot) position that holds it (or a sentinel). The gather backward is
then a dense gather + per-Gaussian reduction (see tile_raster.gather_feats).

Capacity overflow (per-Gaussian duplicate count > max_dup or per-tile count
> K) is reported via the returned `overflow` diagnostics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

DEPTH_BITS = 20  # key bits for depth (below the tile id)


class TileBins(NamedTuple):
    index_matrix: jnp.ndarray   # (T, K) int32, sentinel = N for empty
    counts: jnp.ndarray         # (T,) int32 actual entries per tile (capped)
    slot_of_entry: jnp.ndarray  # (N*max_dup,) int32 linear t*K+k or T*K
    overflow: jnp.ndarray       # () int32: dropped entries (dup + tile caps)


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
    assert T < (1 << (31 - DEPTH_BITS)), "too many tiles for the packed key"

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

    # Packed sort key: [tile_id | depth bits]. Positive-float IEEE bits are
    # monotonic; clamp to >=0 so the bitcast stays order-preserving.
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(depth, 0.0).astype(jnp.float32), jnp.int32
    ) >> (31 - DEPTH_BITS)                                     # (N,) in [0, 2^20)
    key = (tile_id << DEPTH_BITS) | jnp.broadcast_to(
        depth_bits[:, None], tile_id.shape
    )
    key = jnp.where(dup_valid, key, T << DEPTH_BITS)

    E = N * max_dup
    flat_key = key.reshape(-1)
    flat_idx = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], tile_id.shape
    ).reshape(-1)
    entry_id = jnp.arange(E, dtype=jnp.int32)

    sort_key, sort_idx, sort_entry = jax.lax.sort(
        (flat_key, flat_idx, entry_id), num_keys=1
    )
    sort_tile = sort_key >> DEPTH_BITS

    # Per-tile segments.
    starts = jnp.searchsorted(sort_tile, jnp.arange(T + 1, dtype=jnp.int32))
    seg_counts = starts[1:] - starts[:-1]                      # (T,)
    counts = jnp.minimum(seg_counts, tile_capacity).astype(jnp.int32)

    k = jnp.arange(tile_capacity, dtype=jnp.int32)[None, :]    # (1,K)
    gather_pos = starts[:-1, None] + k                         # (T,K)
    in_range = k < counts[:, None]
    gather_pos_safe = jnp.where(in_range, gather_pos, 0)
    index_matrix = jnp.where(
        in_range, sort_idx[gather_pos_safe], N
    ).astype(jnp.int32)

    # Inverse mapping entry -> (tile, slot). The slot of sorted position j
    # is analytic — j minus its tile's segment start, capped by capacity —
    # so only one unique-index scatter (the un-permutation) is needed.
    K = tile_capacity
    j = jnp.arange(E, dtype=jnp.int32)
    t_j = jnp.minimum(sort_tile, T)                            # sentinel -> T
    k_j = j - starts[t_j]
    slot_sorted = jnp.where(
        (t_j < T) & (k_j < K), t_j * K + k_j, T * K
    ).astype(jnp.int32)
    slot_of_entry = jnp.full((E,), T * K, jnp.int32).at[sort_entry].set(
        slot_sorted, unique_indices=True
    )

    overflow = jnp.sum(jnp.maximum(n_cover - max_dup, 0)) + jnp.sum(
        jnp.maximum(seg_counts - tile_capacity, 0)
    )
    return TileBins(index_matrix=index_matrix, counts=counts,
                    slot_of_entry=slot_of_entry,
                    overflow=overflow.astype(jnp.int32))
