"""Tile binning: per-tile, depth-sorted Gaussian index lists (pure JAX).

TPU-native counterpart of the CUDA rasterizer's duplicate-with-keys +
radix-sort + tile-range stage. Instead of dynamic per-tile lists we build a
static-capacity *slab* layout:

  1. each visible Gaussian covers a rectangle of tiles; it is duplicated into
     up to MAX_DUP (tile, depth, idx) entries (static-shape padding),
  2. a single-int32-key sort groups entries per tile in front-to-back order —
     the key packs [tile_id | top bits of the IEEE-754 depth], exploiting
     that positive-float bit patterns are monotonic (same trick as the CUDA
     64-bit tile|depth keys, at 2^-11 relative depth resolution),
  3. the sorted entries are laid out as contiguous per-tile segments, each
     padded up to a multiple of SLAB (the rasterizer's grid-step width):
     tile t owns slab positions starting at pstart_blk[t]*SLAB, and
     `owner_blk` maps each SLAB-block back to its tile (the rasterizer's
     grid runs over blocks, selecting its output row by owner). `gauss_of_pos`
     gives the Gaussian id at each slab position (sentinel N for padding),
     so rasterizer work and DMA are proportional to real occupancy — there
     is no dense (T, K, 16) feature matrix anywhere.

The slab carries no gradients (indices are ints); gradients flow through the
*gather* of Gaussian features into slab order. To avoid XLA's slow
scatter-add in the gather's transpose, binning also emits a *gaussian-sorted*
view of the slab: `gsort_pos` lists slab positions grouped by gaussian id,
`gseg_start` flags group boundaries, and `g_last` points at each gaussian's
last entry in that order. The gather backward is then an
occupancy-proportional row gather + a log2(max_dup)-step segmented shift-add
scan (segments are one gaussian's <= max_dup duplicates; exact fp32 tree
sums, no prefix-difference cancellation) + an (N,)-row readback of segment
totals (see tile_raster.gather_pos).

`index_matrix` (T, K) is kept for the n_touched scatter (per-Gaussian
visibility counts) — it is int32-only and reused across iterations.

Capacity overflow (per-Gaussian duplicate count > max_dup, per-tile count
> tile_capacity, or total padded entries > entry_capacity) is reported via
the returned `overflow` diagnostics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

import os

ALPHA_EPS = 1.0 / 255.0  # rasterizer's alpha floor (shared with tile_raster)
DEPTH_BITS = 20   # key bits for depth (below the tile id)
# Compositing inner width (multiple of the 128-lane width) and CHUNKs per
# rasterizer grid step (env overrides are tuning hooks for perf sweeps; the
# defaults balance grid-step overhead against per-tile padding).
CHUNK = int(os.environ.get("MONOGS_CHUNK", "128"))
BLOCK_CHUNKS = int(os.environ.get("MONOGS_BLOCK_CHUNKS", "4"))
SLAB = BLOCK_CHUNKS * CHUNK  # slab segment alignment (rows per grid step)


class TileBins(NamedTuple):
    index_matrix: jnp.ndarray   # (T, K) int32, sentinel = N for empty
    counts: jnp.ndarray         # (T,) int32 actual entries per tile (capped)
    pstart_blk: jnp.ndarray     # (T,) int32 first SLAB-block of tile's slab
    owner_blk: jnp.ndarray      # (entry_capacity/SLAB,) int32 owning tile per
                                #   SLAB-block; sentinel T past the occupancy
    seg_first: jnp.ndarray      # (entry_capacity/SLAB,) int32 1 where a block
                                #   starts a new owner (output-row boundary)
    gauss_of_pos: jnp.ndarray   # (entry_capacity,) int32 gaussian id per slab
                                #   position; sentinel N on padding
    gsort_pos: jnp.ndarray      # (entry_capacity,) int32 slab positions
                                #   grouped (sorted) by gaussian id
    gseg_start: jnp.ndarray     # (entry_capacity,) int32 1 where gsort_pos
                                #   starts a new gaussian's group
    g_last: jnp.ndarray         # (N,) int32 index into gsort order of the
                                #   gaussian's LAST entry; sentinel
                                #   entry_capacity when it has none
    overflow: jnp.ndarray       # () int32: dropped entries (all caps)
    overflow_parts: jnp.ndarray  # (4,) int32 decomposition of `overflow`:
                                #   [0] coverage > max_dup_gen (gen width)
                                #   [1] cull survivors > max_dup (compaction)
                                #   [2] per-tile count > tile_capacity
                                #   [3] slab truncation at entry_capacity
                                # Only [3] is fixable by raising
                                # entry_capacity; [0]/[1] need max_dup_gen/
                                # max_dup, [2] needs tile_capacity.


def auto_entry_capacity(n: int, max_dup: int, num_tiles: int,
                        tile_capacity: int) -> int:
    """Smallest safe (no-drop) slab capacity, SLAB-rounded."""
    k_pad = -(-tile_capacity // SLAB) * SLAB
    worst = min(n * max_dup + num_tiles * (SLAB - 1), num_tiles * k_pad)
    return -(-worst // SLAB) * SLAB


def _tile_candidates(u, v, radius, valid, opacity, conic,
                     tiles_x, tiles_y, T, tile_size, max_dup, max_dup_gen,
                     cull_alpha=ALPHA_EPS):
    """Candidate (tile, gaussian) entry generation shared by tile_bin and
    measure_entry_demand: rectangle coverage, exact peak-alpha corner cull,
    survivor compaction to max_dup columns.

    cull_alpha is the peak-alpha cull threshold. At the default ALPHA_EPS
    (1/255) the cull is EXACT: it drops precisely the tiles the kernel's
    per-pixel `ok` floor would zero anyway (reference parity — the CUDA
    rasterizer generates 3-sigma rectangles and skips alpha < 1/255
    per pixel; an exact peak cull is strictly tighter). Raising it trades
    bounded image error (each dropped tile contributes < cull_alpha of
    pre-saturation weight per pixel) for compositing pair count — the
    isotropic protocol's footprints put ~15-30% of pairs below 4/255
    (r5 study, RESULTS.md). This subsumes the "opacity-dependent isoline
    radius" idea: the cull already bounds each tile by its exact peak
    alpha, which IS the isoline test, per tile instead of per radius.

    Returns (tile_id (N, max_dup) with sentinel T, dup_valid, n_cover,
    surv_gen, D_gen)."""
    x0 = jnp.clip(jnp.floor((u - radius) / tile_size), 0, tiles_x).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil((u + radius + 1) / tile_size), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((v - radius) / tile_size), 0, tiles_y).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil((v + radius + 1) / tile_size), 0, tiles_y).astype(jnp.int32)
    w = jnp.where(valid, x1 - x0, 0)
    h = jnp.where(valid, y1 - y0, 0)
    n_cover = w * h                                   # (N,)

    # Duplicate: entry d of Gaussian i covers tile (x0 + d%w, y0 + d//w).
    # Candidates are generated at width D_gen >= max_dup; after the peak
    # cull, survivors are compacted per-gaussian down to max_dup columns
    # (cheap (N, D_gen) minor-axis bitonic sort), so every downstream
    # E-sized sort/scan runs at N*max_dup instead of N*D_gen.
    D_gen = max_dup if max_dup_gen is None else max(max_dup_gen, max_dup)
    d = jnp.arange(D_gen, dtype=jnp.int32)[None, :]            # (1,D)
    w_safe = jnp.maximum(w, 1)[:, None]
    tx = x0[:, None] + d % w_safe
    ty = y0[:, None] + d // w_safe
    dup_valid = d < n_cover[:, None]                           # (N,D)

    if opacity is not None and conic is not None:
        # Exact corner cull: a candidate tile whose PEAK alpha stays below
        # the rasterizer's ALPHA_EPS floor contributes nothing (the
        # in-kernel `ok` test would zero every pixel), so drop it here and
        # save its slab entry. The power -1/2 x^T A x is concave, so its
        # max over the tile rect is 0 if the mean lies inside, else the max
        # over the 4 edges — each a 1-D quadratic with a closed-form
        # clamped maximizer. Exact => drops precisely the all-zero tiles.
        opacity = jax.lax.stop_gradient(opacity)
        conic = jax.lax.stop_gradient(conic)
        if isinstance(conic, tuple):
            c0, c1, c2 = conic
        else:
            c0, c1, c2 = conic[:, 0], conic[:, 1], conic[:, 2]
        ca = jnp.maximum(c0, 1e-12)[:, None]                   # (N,1)
        cb = c1[:, None]
        cc = jnp.maximum(c2, 1e-12)[:, None]
        lx = tx.astype(jnp.float32) * tile_size - u[:, None]   # (N,D)
        hx = lx + tile_size
        ly = ty.astype(jnp.float32) * tile_size - v[:, None]
        hy = ly + tile_size

        def pw(X, Y):
            return -0.5 * (ca * X * X + cc * Y * Y) - cb * X * Y

        def edge_x(X):                     # max over {X} x [ly, hy]
            Y = jnp.clip(-cb * X / cc, ly, hy)
            return pw(X, Y)

        def edge_y(Y):                     # max over [lx, hx] x {Y}
            X = jnp.clip(-cb * Y / ca, lx, hx)
            return pw(X, Y)

        inside = (lx <= 0) & (0 <= hx) & (ly <= 0) & (0 <= hy)
        pmax = jnp.maximum(
            jnp.maximum(edge_x(lx), edge_x(hx)),
            jnp.maximum(edge_y(ly), edge_y(hy)),
        )
        pmax = jnp.where(inside, 0.0, pmax)
        peak = opacity[:, None] * jnp.exp(pmax)
        dup_valid = dup_valid & (peak >= cull_alpha)
    tile_id = jnp.where(dup_valid, ty * tiles_x + tx, T).astype(jnp.int32)
    surv_gen = jnp.sum(dup_valid.astype(jnp.int32), axis=1)    # (N,)
    if D_gen > max_dup:
        # Compact cull survivors leftward: dead candidates carry the
        # sentinel tile T, so an ascending minor-axis sort pushes them past
        # the kept window. Row order is irrelevant (the global tile|depth
        # sort below re-orders), and candidate tiles within a row are
        # distinct, so truncation drops only survivors beyond max_dup
        # (counted in `overflow`).
        tile_id = jax.lax.sort(tile_id, dimension=1)[:, :max_dup]
        dup_valid = tile_id < T
    return tile_id, dup_valid, n_cover, surv_gen, D_gen


@functools.partial(
    jax.jit,
    static_argnames=("img_w", "img_h", "tile_size", "tile_capacity",
                     "max_dup", "max_dup_gen", "cull_alpha"),
)
def measure_entry_demand(
    u, v, radius, valid, opacity, conic,
    img_w: int, img_h: int, tile_size: int, tile_capacity: int,
    max_dup: int, max_dup_gen: int | None = None,
    cull_alpha: float = ALPHA_EPS,
):
    """Occupancy probe: the SLAB-padded slab size the current scene actually
    needs (sum over tiles of ceil(min(count, K)/SLAB)*SLAB) plus the live
    survivor count — WITHOUT building any slab structures, so it compiles
    in a fraction of tile_bin's time and can run once at startup / on map
    growth to derive a tight production entry_capacity (VERDICT r1 #7: the
    safe-auto worst case crosses the 16 MB gather VMEM cliff and reads
    ~1.7x slow; a hand-pinned capacity should not be required).

    Returns (padded_rows_needed, n_survivor_entries) as int32 scalars."""
    tiles_x = -(-img_w // tile_size)
    tiles_y = -(-img_h // tile_size)
    T = tiles_x * tiles_y
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    radius = jax.lax.stop_gradient(radius)
    tile_id, dup_valid, _, _, _ = _tile_candidates(
        u, v, radius, valid, opacity, conic,
        tiles_x, tiles_y, T, tile_size, max_dup, max_dup_gen, cull_alpha,
    )
    # Per-tile counts via one flat sort + searchsorted (same recipe as
    # tile_bin, minus the entry payloads).
    sort_tile = jax.lax.sort(tile_id.reshape(-1))
    starts = jnp.searchsorted(sort_tile, jnp.arange(T + 1, dtype=jnp.int32))
    seg_counts = jnp.minimum(starts[1:] - starts[:-1], tile_capacity)
    padded = jnp.sum(-(-seg_counts // SLAB) * SLAB)
    return padded.astype(jnp.int32), jnp.sum(seg_counts).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("img_w", "img_h", "tile_size", "tile_capacity",
                     "max_dup", "entry_capacity", "max_dup_gen",
                     "cull_alpha"),
)
def tile_bin(
    mean2d: jnp.ndarray,   # (N,2) pixel coords, or None with uv=
    radius: jnp.ndarray,   # (N,) screen radius (0 => culled)
    depth: jnp.ndarray,    # (N,)
    valid: jnp.ndarray,    # (N,) bool
    img_w: int,
    img_h: int,
    tile_size: int = 16,
    tile_capacity: int = 512,
    max_dup: int = 16,
    entry_capacity: int | None = None,
    opacity: jnp.ndarray | None = None,   # (N,) activated; enables peak cull
    conic: jnp.ndarray | None = None,     # (N,3) 2D conic (a, b, c), or
                                          #   ((N,),)*3 channel tuple
    uv: tuple | None = None,              # ((N,), (N,)) channel alternative
                                          #   to mean2d (hot path: no stack)
    max_dup_gen: int | None = None,       # candidate width before the cull;
                                          #   > max_dup enables survivor
                                          #   compaction (see below)
    cull_alpha: float = ALPHA_EPS,        # peak-alpha cull threshold; the
                                          #   1/255 default is exact parity
                                          #   (_tile_candidates docstring)
) -> TileBins:
    if uv is not None:
        u, v = uv
    else:
        u, v = mean2d[:, 0], mean2d[:, 1]
    N = u.shape[0]
    tiles_x = -(-img_w // tile_size)
    tiles_y = -(-img_h // tile_size)
    T = tiles_x * tiles_y
    K = tile_capacity
    assert T < (1 << (31 - DEPTH_BITS)), "too many tiles for the packed key"
    assert K % CHUNK == 0, "tile_capacity must be a multiple of CHUNK"
    if entry_capacity is None:
        entry_capacity = auto_entry_capacity(N, max_dup, T, K)
    assert entry_capacity % SLAB == 0 and entry_capacity >= SLAB
    P_cap = entry_capacity
    EB = P_cap // SLAB               # grid blocks

    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    radius = jax.lax.stop_gradient(radius)
    depth = jax.lax.stop_gradient(depth)

    tile_id, dup_valid, n_cover, surv_gen, D_gen = _tile_candidates(
        u, v, radius, valid, opacity, conic,
        tiles_x, tiles_y, T, tile_size, max_dup, max_dup_gen, cull_alpha,
    )
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

    # Per-tile segments of the sorted entry list.
    starts = jnp.searchsorted(sort_tile, jnp.arange(T + 1, dtype=jnp.int32))
    seg_counts = starts[1:] - starts[:-1]                      # (T,)
    counts = jnp.minimum(seg_counts, K).astype(jnp.int32)

    # SLAB-padded slab layout: pstart per tile (in SLAB-block units),
    # truncated to the entry capacity (tail tiles lose entries; reported
    # via overflow).
    nblk0 = (counts + SLAB - 1) // SLAB                        # (T,)
    pstart0 = jnp.cumsum(nblk0) - nblk0
    nblk = jnp.minimum(nblk0, jnp.clip(EB - pstart0, 0, None))
    counts_eff = jnp.minimum(counts, nblk * SLAB).astype(jnp.int32)
    cum = jnp.cumsum(nblk)                                     # inclusive
    pstart_blk = (cum - nblk).astype(jnp.int32)

    # (T, K) index matrix (int32 only; used for n_touched aggregation).
    k = jnp.arange(K, dtype=jnp.int32)[None, :]                # (1,K)
    gather_pos_tk = starts[:-1, None] + k                      # (T,K)
    in_range = k < counts_eff[:, None]
    index_matrix = jnp.where(
        in_range, sort_idx[jnp.where(in_range, gather_pos_tk, 0)], N
    ).astype(jnp.int32)

    # gauss_of_pos: owner tile per block (tiny searchsorted over blocks),
    # per-tile scalars gathered at BLOCK granularity (EB elements) and
    # broadcast to positions — XLA's element-serialized 1-D gather at
    # position granularity measured ~7 ms per 800k lookups in context.
    b = jnp.arange(EB, dtype=jnp.int32)
    owner_blk = jnp.searchsorted(cum, b, side="right").astype(jnp.int32)
    seg_first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (owner_blk[1:] != owner_blk[:-1]).astype(jnp.int32)]
    )                                                          # (EB,)
    owner_safe = jnp.minimum(owner_blk, T - 1)
    rep = lambda a: jnp.broadcast_to(a[:, None], (EB, SLAB)).reshape(-1)
    p = jnp.arange(EB * SLAB, dtype=jnp.int32)
    t_p = rep(owner_blk)
    k_p = p - rep(pstart_blk[owner_safe]) * SLAB
    ok_p = (t_p < T) & (k_p < rep(counts_eff[owner_safe]))
    j_p = jnp.clip(rep(starts[owner_safe]) + k_p, 0, E - 1)
    gauss_of_pos = jnp.where(ok_p, sort_idx[j_p], N).astype(jnp.int32)

    # Slab position of each sorted entry, from segment-boundary scans —
    # no per-entry table lookups (cummax/cumsum are ~1.4 ms at E=800k where
    # the three 1-D table gathers they replace measured ~7 ms each):
    #   k_j  = offset within the entry's segment (j - cummax of boundaries)
    #   S_j  = SLAB-padded start of the segment (cumsum of the previous
    #          segments' padded, capacity-capped sizes at each boundary)
    # Matches the per-tile pstart/counts arithmetic above by construction.
    j = jnp.arange(E, dtype=jnp.int32)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), sort_tile[1:] != sort_tile[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(boundary, j, 0))
    k_j = j - seg_start
    prev_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), seg_start[:-1]]
    )
    prev_kept = jnp.minimum(j - prev_start, K)                 # at boundaries
    prev_pad = jnp.where(
        boundary & (j > 0), -(-prev_kept // SLAB) * SLAB, 0
    )
    S = jnp.cumsum(prev_pad)
    pos = S + k_j
    pos_sorted = jnp.where(
        (sort_tile < T) & (k_j < K) & (pos < P_cap), pos, P_cap
    ).astype(jnp.int32)
    # Un-permute by sorting (entry, pos) pairs by entry id: a second sort is
    # much cheaper than XLA's scatter on TPU (~1.4 vs ~14 ms at E=800k),
    # and sort_entry is a permutation so the result is exact.
    _, pos_of_entry = jax.lax.sort((sort_entry, pos_sorted), num_keys=1)

    # Gaussian-sorted slab view for the occupancy-proportional gather
    # backward (tile_raster._segsum_last). The flat (N, max_dup) entry table
    # is already gaussian-major, so per-gaussian survivor counts, segment
    # bounds and each entry's destination rank in the compacted view are all
    # ELEMENTWISE cumsums (a vectorized searchsorted here measured 17.5
    # ms/iter: XLA lowers it to ~log2(E_cap) serialized gather passes). One
    # more E-sort places survivors at their destinations; segment order
    # within a gaussian is irrelevant (the backward only sums segments).
    surv = (pos_of_entry < P_cap).reshape(N, max_dup)
    k_i = jnp.sum(surv.astype(jnp.int32), axis=1)              # (N,)
    incl = jnp.cumsum(k_i)
    excl = incl - k_i
    g_last = jnp.where(k_i > 0, incl - 1, P_cap).astype(jnp.int32)
    rank = jnp.cumsum(surv.astype(jnp.int32), axis=1) - 1      # (N, D)
    gpos = (excl[:, None] + rank).astype(jnp.int32)
    dest = jnp.where(surv, gpos, E).reshape(-1)
    gauss_e = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], (N, max_dup)
    )
    gauss_val = jnp.where(surv, gauss_e, N).reshape(-1)
    _, gsort_pos, gsort_gauss = jax.lax.sort(
        (dest, jnp.minimum(pos_of_entry, P_cap - 1), gauss_val), num_keys=1
    )
    if E < P_cap:                                              # pad the tail
        padp = jnp.full((P_cap - E,), P_cap - 1, jnp.int32)
        padg = jnp.full((P_cap - E,), N, jnp.int32)
        gsort_pos = jnp.concatenate([gsort_pos, padp])
        gsort_gauss = jnp.concatenate([gsort_gauss, padg])
    else:
        gsort_pos = gsort_pos[:P_cap]
        gsort_gauss = gsort_gauss[:P_cap]
    gseg_start = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (gsort_gauss[1:] != gsort_gauss[:-1]).astype(jnp.int32)]
    )

    overflow_parts = jnp.stack([
        jnp.sum(jnp.maximum(n_cover - D_gen, 0)),
        jnp.sum(jnp.maximum(surv_gen - max_dup, 0)),
        jnp.sum(jnp.maximum(seg_counts - K, 0)),
        jnp.sum(counts - counts_eff),
    ]).astype(jnp.int32)
    return TileBins(index_matrix=index_matrix, counts=counts_eff,
                    pstart_blk=pstart_blk, owner_blk=owner_blk,
                    seg_first=seg_first,
                    gauss_of_pos=gauss_of_pos, gsort_pos=gsort_pos,
                    gseg_start=gseg_start, g_last=g_last,
                    overflow=jnp.sum(overflow_parts),
                    overflow_parts=overflow_parts)
