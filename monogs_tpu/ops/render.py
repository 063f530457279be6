"""High-level differentiable render op.

TPU-native counterpart of the reference render wrapper
(/root/reference/gaussian_splatting/gaussian_renderer/__init__.py:26-168):
returns rgb/depth/opacity images plus the SLAM visibility signals
(n_touched, radii) and supports a screen-space gradient hook (`mean2d_dummy`)
replacing the reference's retain_grad dummy tensor
(gaussian_renderer/__init__.py:52-58) for densification statistics.

Pipeline (single jittable graph):
  project_gaussians (autodiff, incl. pose delta)  ->  tile_bin (int indices)
  ->  slab feature gather  ->  composite_slab (Pallas custom-VJP)  ->
  assemble. Gradients w.r.t. Gaussian params flow through the gather's
  custom backward (gaussian-sorted slab gather + segmented shift-add scan,
  tile_raster.gather_pos / _segsum_last); gradients w.r.t. (rho, theta)
  flow through projection.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import SLAB, tile_bin
from .graphics import Intrinsics
from .projection import (
    ProjectedChannels,
    ProjectedGaussians,
    project_gaussians,
    project_gaussians_ch,
)
from .tile_raster import (
    RasterConfig,
    composite_slab,
    composite_tiles_ref,
    make_raster_config,
    pack_features,
    pack_features_slab,
    pack_features_window,
)


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray        # (H, W, 3)
    depth: jnp.ndarray      # (H, W) alpha-blended depth
    opacity: jnp.ndarray    # (H, W) accumulated alpha
    n_touched: jnp.ndarray  # (N,) int32 per-Gaussian contributing-pixel count
    radii: jnp.ndarray      # (N,) float screen radius (0 = culled)
    overflow: jnp.ndarray   # () int32 binning-capacity diagnostics
    overflow_parts: jnp.ndarray  # (4,) int32 (see binning.TileBins)


def _assemble_image(out: jnp.ndarray, cfg: RasterConfig) -> jnp.ndarray:
    """(T, P, C) tile buffers -> (H, W, C) image (cropped)."""
    ts, C = cfg.tile_size, out.shape[-1]
    img = out.reshape(cfg.tiles_y, cfg.tiles_x, ts, ts, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        cfg.tiles_y * ts, cfg.tiles_x * ts, C
    )
    return img[: cfg.img_h, : cfg.img_w]


def tile_image(img: jnp.ndarray, cfg: RasterConfig) -> jnp.ndarray:
    """(H, W[, C]) image -> (T, P[, C]) tile layout (_assemble_image's
    inverse; out-of-image pixels zero/False-padded).

    Purpose: the mapping hot loop computes its loss directly in tile space
    (the losses are per-pixel sums, so the layout is irrelevant as long as
    padding is masked out) — ground-truth images are tiled ONCE per chunk,
    removing the per-iteration (T,P,8)->(H,W,8) assemble and its backward
    (~3.5 ms/iter of pure layout copies at window 8, HLO-profiled)."""
    ts = cfg.tile_size
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    C = img.shape[-1]
    pad_h = cfg.tiles_y * ts - img.shape[0]
    pad_w = cfg.tiles_x * ts - img.shape[1]
    img = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
    img = img.reshape(cfg.tiles_y, ts, cfg.tiles_x, ts, C)
    tiles = img.transpose(0, 2, 1, 3, 4).reshape(
        cfg.num_tiles, cfg.pixels, C
    )
    return tiles[..., 0] if squeeze else tiles


def render_projected(
    proj: ProjectedGaussians | ProjectedChannels,
    cfg: RasterConfig,
    *,
    rgbs: jnp.ndarray | None = None,   # (N,3); required with ProjectedChannels
    bg: jnp.ndarray | None = None,
    tile_capacity: int = 512,
    max_dup: int = 16,
    max_dup_gen: int | None = None,
    entry_capacity: int | None = None,
    backend: str = "pallas",
    mean2d_dummy: jnp.ndarray | None = None,
    bins=None,
    with_n_touched: bool = True,
    assemble: bool = True,
) -> RenderOutput:
    """Rasterize already-projected Gaussians.

    `proj` may be the scalar-channel form (ProjectedChannels + rgbs) — the
    hot path, no (N,2)/(N,3) stacks — or the matrix ProjectedGaussians.
    `bins` may be a precomputed TileBins to freeze the (non-differentiable)
    tile assignment — e.g. to reuse binning across tracking iterations.
    with_n_touched=False drops the per-Gaussian visibility count (kernel
    skips its compute; the segment_sum scatter is skipped): use in hot loops
    that only consume images/gradients.
    assemble=False returns rgb/depth/opacity in TILE layout — rgb (T, P, 3),
    depth/opacity (T, P) — skipping the tile->image shuffle and its
    backward transpose; pair with `tile_image`d ground truth.
    """
    if isinstance(proj, ProjectedChannels):
        assert rgbs is not None, "rgbs required with ProjectedChannels"
        u, v = proj.u, proj.v
        conic_ch = (proj.ca, proj.cb, proj.cc)
    else:
        rgbs = proj.rgb
        u, v = proj.mean2d[:, 0], proj.mean2d[:, 1]
        conic_ch = (proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2])
    if mean2d_dummy is not None:
        u = u + mean2d_dummy[:, 0]
        v = v + mean2d_dummy[:, 1]
    N = u.shape[0]

    if bins is None:
        bins = tile_bin(
            None, proj.radius, proj.depth, proj.valid,
            img_w=cfg.img_w, img_h=cfg.img_h, tile_size=cfg.tile_size,
            tile_capacity=tile_capacity, max_dup=max_dup,
            max_dup_gen=max_dup_gen, entry_capacity=entry_capacity,
            opacity=jnp.where(proj.valid, proj.opacity, 0.0),
            conic=conic_ch, uv=(u, v),
        )

    opacity = jnp.where(proj.valid, proj.opacity, 0.0)
    if backend == "ref":
        feats = pack_features(
            jnp.stack([u, v], axis=-1),
            jnp.stack(conic_ch, axis=-1), opacity, rgbs, proj.depth,
            bins.index_matrix,
        )                                           # (T, K, 16)
        out, touched = composite_tiles_ref(feats, cfg)
    else:
        feats_pos = pack_features_slab(
            u, v, *conic_ch, opacity, rgbs, proj.depth,
            bins.gauss_of_pos, bins.gsort_pos, bins.gseg_start, bins.g_last,
            max_dup,
        )                                           # (16, E_cap)
        out, touched = composite_slab(
            feats_pos[None], bins.owner_blk, bins.seg_first, bins.pstart_blk,
            bins.counts, cfg, tile_capacity, with_n_touched,
        )

    img = _assemble_image(out, cfg) if assemble else out   # (H,W,8)|(T,P,8)
    alpha = img[..., 4]
    rgb = img[..., 0:3]
    if bg is not None:
        rgb = rgb + (1.0 - alpha)[..., None] * bg

    if with_n_touched:
        n_touched = jax.ops.segment_sum(
            touched.reshape(-1),
            bins.index_matrix.reshape(-1),
            num_segments=N + 1,
        )[:N]
    else:
        n_touched = jnp.zeros((N,), jnp.int32)

    return RenderOutput(
        rgb=rgb,
        depth=img[..., 3],
        opacity=alpha,
        n_touched=n_touched,
        radii=proj.radius,
        overflow=bins.overflow,
        overflow_parts=bins.overflow_parts,
    )


class WindowRenderOutput(NamedTuple):
    rgb: jnp.ndarray        # (W, H, W_img, 3)
    depth: jnp.ndarray      # (W, H, W_img)
    opacity: jnp.ndarray    # (W, H, W_img)
    n_touched: jnp.ndarray  # (W, N)
    radii: jnp.ndarray      # (W, N)
    overflow: jnp.ndarray   # () summed over window
    overflow_parts: jnp.ndarray  # (4,) summed over window (binning.TileBins)


def render_window(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    rgbs: jnp.ndarray,
    Rs: jnp.ndarray,           # (W, 3, 3) per-keyframe w2c
    ts: jnp.ndarray,           # (W, 3)
    intr: Intrinsics,
    *,
    rhos: jnp.ndarray,         # (W, 3) per-keyframe se(3) deltas
    thetas: jnp.ndarray,       # (W, 3)
    active: jnp.ndarray | None = None,
    bg: jnp.ndarray | None = None,
    tile_size: int = 16,
    tile_capacity: int = 512,
    max_dup: int = 16,
    max_dup_gen: int | None = None,
    entry_capacity: int | None = None,
    backend: str = "pallas",
    mean2d_dummy=None,   # (W, N, 2) array or ((W, N), (W, N)) channel pair
    bins=None,   # optional vmapped TileBins (leading window axis)
    with_n_touched: bool = True,
    assemble: bool = True,
) -> WindowRenderOutput:
    """Batched multi-view render: the mapper's whole keyframe window in ONE
    rasterizer launch.

    assemble=False returns rgb/depth/opacity in TILE layout — rgb
    (W, T, P, 3), depth/opacity (W, T, P) — skipping the tile->image
    shuffle and (in the backward) its transpose; pair with `tile_image`d
    ground truth for loss computation.

    TPU-first replacement for the reference mapper's serial per-keyframe
    render loop (slam_mapper.py:273-322): every keyframe's tiles are
    concatenated along the kernel grid axis (the kernels wrap tile indices
    per image), so the window renders as one Pallas invocation and one
    backward — the unit that later shards across devices (window/CP
    parallelism, SURVEY.md §2.3). Precomputed `bins` freeze the tile
    assignment (bin-reuse across mapping iterations).
    """
    Wn = Rs.shape[0]
    N = means3d.shape[0]
    cfg = make_raster_config(intr.width, intr.height, tile_size)
    if mean2d_dummy is None:
        z = jnp.zeros((Wn, N), means3d.dtype)
        dum_u, dum_v = z, z
    elif isinstance(mean2d_dummy, tuple):
        dum_u, dum_v = mean2d_dummy      # (W, N) channel pair — hot path
    else:
        dum_u, dum_v = mean2d_dummy[..., 0], mean2d_dummy[..., 1]

    def per_kf(R, t, rho, theta, du, dv, bins_kf):
        proj = project_gaussians_ch(
            means3d, scales, quats, opacities, R, t, rho, theta, intr,
            active=active,
        )
        u = proj.u + du
        v = proj.v + dv
        conic_ch = (proj.ca, proj.cb, proj.cc)
        if bins_kf is None:
            bins_kf = tile_bin(
                None, proj.radius, proj.depth, proj.valid,
                img_w=cfg.img_w, img_h=cfg.img_h, tile_size=cfg.tile_size,
                tile_capacity=tile_capacity, max_dup=max_dup,
                max_dup_gen=max_dup_gen, entry_capacity=entry_capacity,
                opacity=jnp.where(proj.valid, proj.opacity, 0.0),
                conic=conic_ch, uv=(u, v),
            )
        opa = jnp.where(proj.valid, proj.opacity, 0.0)
        if backend == "ref":
            feats = pack_features(
                jnp.stack([u, v], axis=-1), jnp.stack(conic_ch, axis=-1),
                opa, rgbs, proj.depth, bins_kf.index_matrix,
            )                                       # (T, K, 16)
        else:
            # Raw (N,) channels only; pack+gather happen once, un-vmapped,
            # in pack_features_window (vmapped gathers lower
            # pathologically). rgb is shared across keyframes and stays
            # outside the vmap entirely.
            feats = (u, v, *conic_ch, opa, proj.depth)
        return (feats, bins_kf.index_matrix, bins_kf.pstart_blk,
                bins_kf.owner_blk, bins_kf.seg_first, bins_kf.counts,
                proj.radius, bins_kf.overflow, bins_kf.overflow_parts,
                bins_kf.gauss_of_pos, bins_kf.gsort_pos,
                bins_kf.gseg_start, bins_kf.g_last)

    if bins is None:
        (feats, idx_mats, pstarts, owners, firsts, counts, radii,
         overflows, overflow_parts, gops, gsps, gsfs, glasts) = jax.vmap(
            lambda R, t, rho, theta, du, dv: per_kf(R, t, rho, theta,
                                                    du, dv, None)
        )(Rs, ts, rhos, thetas, dum_u, dum_v)
    else:
        (feats, idx_mats, pstarts, owners, firsts, counts, radii,
         overflows, overflow_parts, gops, gsps, gsfs, glasts) = jax.vmap(
            per_kf
        )(Rs, ts, rhos, thetas, dum_u, dum_v, bins)

    T = idx_mats.shape[1]
    K = idx_mats.shape[2]
    if backend == "ref":
        out, touched = composite_tiles_ref(
            feats.reshape(Wn * T, K, feats.shape[-1]), cfg
        )
    else:
        # One un-vmapped pack+gather builds the whole window's slab in the
        # kernel's (n_img, 16, E_cap) layout; block/tile ids become global.
        feats = pack_features_window(*feats, rgbs[:, 0], rgbs[:, 1],
                                     rgbs[:, 2], gops, gsps, gsfs, glasts,
                                     max_dup)
        E_cap = feats.shape[2]
        eb_img = E_cap // SLAB
        img = jnp.arange(Wn, dtype=jnp.int32)[:, None]
        pstart_g = (pstarts + img * eb_img).reshape(-1)
        owner_g = jnp.where(
            owners < T, owners + img * T, Wn * T
        ).reshape(-1)
        out, touched = composite_slab(
            feats, owner_g, firsts.reshape(-1), pstart_g,
            counts.reshape(-1), cfg, tile_capacity, with_n_touched,
        )

    out = out.reshape(Wn, T, cfg.pixels, 8)
    if assemble:
        imgs = jax.vmap(lambda o: _assemble_image(o, cfg))(out)
    else:
        imgs = out                                  # (W, T, P, 8) tile layout
    alpha = imgs[..., 4]
    rgb = imgs[..., 0:3]
    if bg is not None:
        rgb = rgb + (1.0 - alpha)[..., None] * bg

    if with_n_touched:
        n_touched = jax.vmap(
            lambda tch, idx: jax.ops.segment_sum(
                tch.reshape(-1), idx.reshape(-1), num_segments=N + 1
            )[:N]
        )(touched.reshape(Wn, T, K), idx_mats)
    else:
        # The segment_sum is a scatter (~20 ms/iter at window 8 / N 131072);
        # per-iteration mapping doesn't consume n_touched — the host gets
        # visibility from the dedicated visibility_pass instead.
        n_touched = jnp.zeros((Wn, N), jnp.int32)

    return WindowRenderOutput(
        rgb=rgb, depth=imgs[..., 3], opacity=alpha,
        n_touched=n_touched, radii=radii,
        overflow=jnp.sum(overflows),
        overflow_parts=jnp.sum(overflow_parts, axis=0),
    )


def render(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,       # activated (exp)
    quats: jnp.ndarray,
    opacities: jnp.ndarray,    # activated (sigmoid), (N,)
    rgbs: jnp.ndarray,
    R_w2c: jnp.ndarray,
    t_w2c: jnp.ndarray,
    intr: Intrinsics,
    *,
    rho: jnp.ndarray | None = None,
    theta: jnp.ndarray | None = None,
    active: jnp.ndarray | None = None,
    bg: jnp.ndarray | None = None,
    tile_size: int = 16,
    tile_capacity: int = 512,
    max_dup: int = 16,
    max_dup_gen: int | None = None,
    entry_capacity: int | None = None,
    backend: str = "pallas",
    mean2d_dummy: jnp.ndarray | None = None,
    bins=None,
    with_n_touched: bool = True,
) -> RenderOutput:
    """Full differentiable render (parity: gaussian_renderer/__init__.py:26).

    rho/theta are the se(3) camera-pose deltas (default zero); differentiate
    w.r.t. them for tracking (the theta/rho gradient contract of the CUDA
    rasterizer, gaussian_renderer/__init__.py:141-156).
    """
    if rho is None:
        rho = jnp.zeros(3, means3d.dtype)
    if theta is None:
        theta = jnp.zeros(3, means3d.dtype)
    cfg = make_raster_config(intr.width, intr.height, tile_size)
    proj = project_gaussians(
        means3d, scales, quats, opacities, rgbs,
        R_w2c, t_w2c, rho, theta, intr, active=active,
    )
    return render_projected(
        proj, cfg, bg=bg, tile_capacity=tile_capacity, max_dup=max_dup,
        max_dup_gen=max_dup_gen, entry_capacity=entry_capacity,
        backend=backend, mean2d_dummy=mean2d_dummy, bins=bins,
        with_n_touched=with_n_touched,
    )
