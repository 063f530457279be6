"""Tile-based alpha compositing: the Pallas rasterizer core.

TPU-native replacement for the CUDA `diff-gaussian-rasterization-w-pose`
render/backward kernels (contract documented at reference
gaussian_splatting/gaussian_renderer/__init__.py:130-168). The differentiable
boundary is `composite_slab(feats_pos)` where `feats_pos` are per-slab-
position gathered 2D Gaussian features; gradients w.r.t. 3D parameters AND
camera pose flow by JAX autodiff through the projection stage + gather that
produce `feats_pos` (see ops/projection.py, ops/render.py).

Slab layout (see ops/binning.py): sorted entries live in ONE (entry_capacity,
16) array as contiguous, SLAB-aligned per-tile segments. The kernel grid is
ONE dimension — the slab's SLAB-row blocks — so grid steps, compute, and DMA
are all proportional to real occupancy (≈ sum of per-tile entry counts), not
to the T*K capacity. The feats input streams with an identity index map (a
perfectly pipelined sequential scan); the OUTPUT row is selected per block by
the prefetched `owner_blk` tile id (blocks of one tile are consecutive, so
Pallas's revisiting pipeline accumulates the tile's output in VMEM and writes
it back once, when the owner changes). Each grid step runs an inner
BLOCK_CHUNKS-iteration loop over CHUNK-wide slots, bounded by the tile's
remaining live chunks.
Feature channels (last axis; 10 used, 6 spare for the divisibility rule):
    0: u (pixel x of 2D mean)   5: opacity (activated, 0 for padding)
    1: v                        6,7,8: r, g, b
    2: conic_a                  9: depth
    3: conic_b
    4: conic_c
Padding positions carry the sentinel Gaussian (all-zero features), whose
opacity 0 makes them exact no-ops in the compositing math.

Outputs: `out` (T, P, 8) with columns [r, g, b, depth, alpha, 0, 0, 0] per
tile pixel (P = tile_size**2, row-major in tile), and `touched` (T, K) int32
pixel counts per within-tile slot (the n_touched visibility signal,
reference slam_tracker.py:414).

Compositing math (per pixel, slots depth-sorted front-to-back):
    power_k = -0.5 (a dx^2 + 2 b dx dy + c dy^2),  dx = x - u
    alpha_k = clip to [1/255, 0.99]: opacity_k * exp(power_k); 0 outside
    T_k     = prod_{j<k} (1 - alpha_j)
    out     = sum_k alpha_k T_k * [r, g, b, depth, 1]
No hard per-pixel termination (a TPU-hostile data-dependent branch); instead
the kernels skip whole chunks once max-pixel transmittance underflows, which
changes results below fp32 noise. The backward uses the suffix-sum identity
    dL/dalpha_k = T_k g_k - S_k / (1 - alpha_k),  S_k = sum_{j>k} w_j g_j
with prefix sums realized as triangular-matrix matmuls on the MXU, and
reduces dL/dpower against the pixel quadratic basis (one more MXU matmul)
into closed-form per-slot gradients for (u, v, conic). The backward's
dfeats output is identity-blocked like the input: every slab block writes
its own rows exactly once (padding rows zero).

Tile indices wrap modulo cfg.num_tiles so several images' tiles can be
concatenated along the grid axis (batched keyframe-window rendering); each
image contributes entry_capacity slab rows.
All within-tile coordinates are tile-local to keep the quadratic forms
well-conditioned in fp32.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import BLOCK_CHUNKS, CHUNK as _BCHUNK, SLAB  # noqa: E402

ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99
TOUCH_T_MIN = 1e-4          # transmittance floor for the n_touched signal
CHUNK = _BCHUNK             # slots processed per inner step (lane width)
# Skip chunks once max log-transmittance < this. ln(1e-4) matches the
# reference CUDA rasterizer's per-pixel termination (forward.cu stops
# compositing a pixel at T < 1e-4); applying it at chunk granularity
# (every pixel of the tile must be saturated) is strictly more
# conservative than the reference per-pixel rule. Rounds 1-4 ran -16
# (T < 1.1e-7), paying extra tail chunks for precision the reference
# never had. Env override for roofline experiments
# (MONOGS_LOG_SKIP=-1e30 disables skipping -> the all-pairs cost).
LOG_SKIP = float(os.environ.get("MONOGS_LOG_SKIP", "-9.2103"))
FEAT_ROWS = 16              # sublane-padded feature rows (10 used)


class RasterConfig(NamedTuple):
    tiles_x: int
    tiles_y: int
    tile_size: int
    img_w: int
    img_h: int

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def pixels(self) -> int:
        return self.tile_size * self.tile_size


def make_raster_config(img_w: int, img_h: int, tile_size: int = 16) -> RasterConfig:
    return RasterConfig(
        tiles_x=-(-img_w // tile_size),
        tiles_y=-(-img_h // tile_size),
        tile_size=tile_size,
        img_w=img_w,
        img_h=img_h,
    )


# ---------------------------------------------------------------------------
# Pure-JAX reference implementation (correctness oracle; autodiff backward).
# ---------------------------------------------------------------------------


def _tile_pixel_coords(cfg: RasterConfig, dtype=jnp.float32):
    """Tile-local pixel-center coords (P,) each, row-major."""
    ts = cfg.tile_size
    p = jnp.arange(cfg.pixels)
    x = (p % ts).astype(dtype) + 0.5
    y = (p // ts).astype(dtype) + 0.5
    return x, y


def _tile_origins(cfg: RasterConfig, total_tiles: int, dtype=jnp.float32):
    """Tile origins; indices wrap every cfg.num_tiles so several images'
    tiles can be concatenated along the tile axis (batched window render)."""
    t = jnp.arange(total_tiles) % cfg.num_tiles
    ox = (t % cfg.tiles_x).astype(dtype) * cfg.tile_size
    oy = (t // cfg.tiles_x).astype(dtype) * cfg.tile_size
    return ox, oy


def composite_tiles_ref(feats: jnp.ndarray, cfg: RasterConfig):
    """Vectorized pure-JAX compositing. Differentiable by autodiff.

    feats: (T, K, 16) -> (out (T, P, 8), touched (T, K) int32)
    """
    T, K = feats.shape[0], feats.shape[1]
    px, py = _tile_pixel_coords(cfg)         # (P,)
    ox, oy = _tile_origins(cfg, T)           # (T,)

    def one_tile(fkc, o_x, o_y):
        f = fkc.T                             # (16, K)
        u = f[0] - o_x                        # (K,) tile-local
        v = f[1] - o_y
        a, b, c = f[2], f[3], f[4]
        opa = f[5]
        dx = px[:, None] - u[None, :]         # (P, K)
        dy = py[:, None] - v[None, :]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        expp = jnp.exp(jnp.minimum(power, 0.0))
        alpha_raw = opa[None, :] * expp
        ok = (power <= 0.0) & (alpha_raw >= ALPHA_EPS)
        alpha = jnp.where(ok, jnp.minimum(alpha_raw, ALPHA_MAX), 0.0)
        one_m = 1.0 - alpha
        Tk = jnp.cumprod(
            jnp.concatenate([jnp.ones((alpha.shape[0], 1)), one_m[:, :-1]], axis=1),
            axis=1,
        )                                     # (P, K) exclusive
        w = alpha * Tk
        pix_valid = ((o_x + px - 0.5) < cfg.img_w) & ((o_y + py - 0.5) < cfg.img_h)
        colors = jnp.stack(
            [f[6], f[7], f[8], f[9], jnp.ones_like(f[9])], axis=1
        )                                     # (K, 5)
        acc = w @ colors                      # (P, 5)
        out = jnp.concatenate([acc, jnp.zeros((acc.shape[0], 3))], axis=1)
        touched = jnp.sum(
            (ok & (Tk > TOUCH_T_MIN) & pix_valid[:, None]).astype(jnp.int32), axis=0
        )
        return out, touched

    return jax.vmap(one_tile)(feats, ox, oy)


# ---------------------------------------------------------------------------
# Pallas kernels (slab layout).
# ---------------------------------------------------------------------------


def _pix_basis(cfg: RasterConfig):
    """Per-pixel (P, 6) quadratic basis [x^2, xy, y^2, x, y, 1] and (P, 1)
    coords, tile-local (built in-kernel from iota)."""
    ts = cfg.tile_size
    P = cfg.pixels
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    x = (p % ts).astype(jnp.float32) + 0.5
    y = (p // ts).astype(jnp.float32) + 0.5
    basis = jnp.concatenate([x * x, x * y, y * y, x, y, jnp.ones_like(x)], axis=1)
    return x, y, basis


def _tri_matrices():
    """Strict / inclusive upper-triangular (CHUNK, CHUNK) prefix matrices:
    (x @ strict)[p,k] = sum_{j<k} x[p,j]; (x @ incl) includes j==k."""
    i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    strict = (i < j).astype(jnp.float32)
    incl = (i <= j).astype(jnp.float32)
    return strict, incl


def _tile_origin_of(t, cfg: RasterConfig):
    """Pixel origin of (possibly batched-image-wrapped) tile id `t`."""
    tl = jax.lax.rem(t, cfg.num_tiles)       # wrap for batched images
    ox = (jax.lax.rem(tl, cfg.tiles_x) * cfg.tile_size).astype(jnp.float32)
    oy = (jax.lax.div(tl, cfg.tiles_x) * cfg.tile_size).astype(jnp.float32)
    return ox, oy


# Experiment (measured REGRESSION, keep off): evaluate the per-(pixel, slot)
# quadratic `power` as one MXU matmul against the (P, 6) pixel basis instead
# of ~11 VPU elementwise (P, CHUNK) ops. Tracking measured 11.2 ms/iter vs
# 9.9 direct (TPU v5e, 2026-08-19): the K=6 contraction occupies the
# 128-deep systolic array like a full K=128 matmul, and Precision.HIGHEST
# (needed because the expanded form cancels ~|u_tile|^2-magnitude terms)
# multiplies that by the f32 pass count — costlier than the VPU ops it
# replaces. Numerics were fine (<=2.4e-6 image deviation on the test scenes).
MXU_POWER = os.environ.get("MONOGS_MXU_POWER", "0") == "1"


def _prefix_dot(x, tri):
    """x (P, CHUNK) @ tri (CHUNK, CHUNK) triangular prefix matmul.

    Measured (scripts/bench_kernel.py, TPU v5e, 2026-08-19): these matmuls
    are effectively FREE — bf16 inputs changed fwd+bwd latency by <1%
    (6.32 vs 6.30 ms), so the kernels are VPU/transcendental-bound, not
    MXU-bound. Keep f32 (exact oracle match costs nothing)."""
    return jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _chunk_alpha(tf, ox, oy, x, y, basis=None):
    """Shared per-chunk alpha computation on a (16, CHUNK) slab. Returns
    tile-local (u, v), conic rows, opacity row, exp(power), alpha.

    With basis (P, 6) rows [x^2, xy, y^2, x, y, 1] (and MXU_POWER on), the
    quadratic is evaluated as basis @ C6 on the MXU."""
    u = tf[0:1, :] - ox                      # (1, CHUNK) tile-local
    v = tf[1:2, :] - oy
    a = tf[2:3, :]
    b = tf[3:4, :]
    c = tf[4:5, :]
    opa = tf[5:6, :]
    if basis is not None and MXU_POWER:
        # power = -0.5 a x^2 - b xy - 0.5 c y^2 + (a u + b v) x
        #         + (b u + c v) y - 0.5 (a u^2 + 2 b u v + c v^2)
        au, bv, bu, cv = a * u, b * v, b * u, c * v
        C6 = jnp.concatenate(
            [-0.5 * a, -b, -0.5 * c, au + bv, bu + cv,
             -0.5 * (au * u + 2.0 * bu * v + cv * v)],
            axis=0,
        )                                    # (6, CHUNK)
        power = jax.lax.dot_general(
            basis, C6, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                    # (P, CHUNK)
    else:
        dx = x - u                           # (P, CHUNK)
        dy = y - v
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    expp = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = opa * expp
    ok = (power <= 0.0) & (alpha_raw >= ALPHA_EPS)
    alpha = jnp.where(ok, jnp.minimum(alpha_raw, ALPHA_MAX), 0.0)
    return u, v, a, b, c, opa, expp, alpha_raw, ok, alpha


def _block_extent(b, owner_ref, pstart_ref, counts_ref):
    """Owning tile id, first within-tile chunk index, and live-chunk count
    of slab block `b` (counts is padded so the sentinel tile reads 0)."""
    t = owner_ref[b]
    base = (b - pstart_ref[t]) * BLOCK_CHUNKS
    nct = (counts_ref[t] + CHUNK - 1) // CHUNK
    nc = jnp.clip(nct - base, 0, BLOCK_CHUNKS)
    return t, base, nc


def _slab_fwd_kernel(owner_ref, first_ref, pstart_ref, counts_ref,
                     feats_ref, out_ref, *rest, cfg: RasterConfig, K: int,
                     emit_touched: bool):
    """emit_touched=False drops the n_touched path entirely (no per-chunk
    count math, no (T+1, 8, K) output): both SLAM hot loops discard it —
    visibility comes from dedicated renders at cadence boundaries."""
    if emit_touched:
        touched_ref, logT_ref = rest
    else:
        (logT_ref,) = rest
    P = cfg.pixels
    b = pl.program_id(0)
    t, base, nc = _block_extent(b, owner_ref, pstart_ref, counts_ref)
    ox, oy = _tile_origin_of(t, cfg)
    x, y, basis = _pix_basis(cfg)
    strict, _ = _tri_matrices()
    pix_valid = ((ox + x - 0.5) < cfg.img_w) & ((oy + y - 0.5) < cfg.img_h)

    @pl.when(first_ref[b] == 1)
    def _init():
        out_ref[0] = jnp.zeros((8, P), jnp.float32)
        if emit_touched:
            touched_ref[0] = jnp.zeros((8, K), jnp.int32)
        logT_ref[...] = jnp.zeros((P, 1), jnp.float32)

    def body(j, carry):
        logT, acc = carry                     # (P,1), (8,P)

        def live(carry):
            logT, acc = carry
            tf = feats_ref[0, :, pl.ds(j * CHUNK, CHUNK)]  # (16, CHUNK)
            _, _, _, _, _, _, _, _, ok, alpha = _chunk_alpha(
                tf, ox, oy, x, y, basis
            )
            log1m = jnp.log1p(-alpha)
            excl = _prefix_dot(log1m, strict)
            Tk = jnp.exp(logT + excl)
            w = alpha * Tk
            colors_t = jnp.concatenate(
                [
                    tf[6:10, :],                          # r, g, b, depth
                    jnp.ones((1, CHUNK), jnp.float32),    # alpha accumulator
                    jnp.zeros((3, CHUNK), jnp.float32),
                ],
                axis=0,
            )                                 # (8, CHUNK)
            acc = acc + jax.lax.dot_general(
                colors_t, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                 # (8, P)
            if emit_touched:
                cnt = jnp.sum(
                    (ok & (Tk > TOUCH_T_MIN) & pix_valid).astype(jnp.int32),
                    axis=0, keepdims=True,
                )                             # (1, CHUNK)
                touched_ref[0, 0:1, pl.ds((base + j) * CHUNK, CHUNK)] = cnt
            logT = logT + jnp.sum(log1m, axis=1, keepdims=True)
            return logT, acc

        # A saturated tile skips the remaining compute.
        return jax.lax.cond(
            jnp.max(logT) > LOG_SKIP, live, lambda c: c, carry
        )

    logT0 = logT_ref[...]
    acc0 = jnp.zeros((8, P), jnp.float32)
    logT, acc = jax.lax.fori_loop(0, nc, body, (logT0, acc0))
    out_ref[0] = out_ref[0] + acc
    logT_ref[...] = logT


def _slab_bwd_kernel(owner_ref, first_ref, pstart_ref, counts_ref,
                     feats_ref, baux_ref, dfeats_ref, logT_ref, wg_ref, *,
                     cfg: RasterConfig, K: int):
    """baux: (1, 8, P) rows [g_r, g_g, g_b, g_depth, g_alpha, A, 0, 0]
    where A = per-pixel total sum_j w_j g_j (precomputed outside)."""
    P = cfg.pixels
    b = pl.program_id(0)
    t, base, nc = _block_extent(b, owner_ref, pstart_ref, counts_ref)
    ox, oy = _tile_origin_of(t, cfg)
    x, y, basis = _pix_basis(cfg)
    strict, incl = _tri_matrices()

    @pl.when(first_ref[b] == 1)
    def _init():
        logT_ref[...] = jnp.zeros((P, 1), jnp.float32)
        wg_ref[...] = jnp.zeros((P, 1), jnp.float32)

    # Every block writes its own output rows exactly once; padding rows
    # (including entire dead blocks) stay zero.
    dfeats_ref[...] = jnp.zeros((1, FEAT_ROWS, SLAB), jnp.float32)

    gvec = baux_ref[0, 0:5, :]                # (5, P)
    A = baux_ref[0, 5:6, :].T                 # (P, 1)

    def body(j, carry):
        logT, wg_pref = carry                 # (P,1), (P,1)

        def live(carry):
            logT, wg_pref = carry
            tf = feats_ref[0, :, pl.ds(j * CHUNK, CHUNK)]  # (16, CHUNK)
            u, v, a, bb, c, opa, expp, alpha_raw, ok, alpha = _chunk_alpha(
                tf, ox, oy, x, y, basis
            )
            log1m = jnp.log1p(-alpha)
            excl = _prefix_dot(log1m, strict)
            Tk = jnp.exp(logT + excl)
            w = alpha * Tk

            # Per-(pixel, slot) cotangent of w: g = c.g_rgb + d*g_d + g_a.
            props = jnp.concatenate(
                [tf[6:10, :], jnp.ones((1, CHUNK), jnp.float32)],
                axis=0,
            )                                 # (5, CHUNK)
            # NOTE: keep this K=5 contraction on the MXU — a 5-term VPU
            # rank-1 fma chain measured 8.49 vs 6.30 ms fwd+bwd
            # (scripts/bench_kernel.py): the kernel is VPU-bound, so the
            # MXU path overlaps while the fma chain serializes.
            g = jax.lax.dot_general(
                gvec, props, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                 # (P, CHUNK)
            wg = w * g
            pref = wg_pref + _prefix_dot(wg, incl)  # incl. prefix + carry
            S = A - pref
            dalpha = Tk * g - S / (1.0 - alpha)
            dalpha_raw = jnp.where(ok & (alpha_raw < ALPHA_MAX), dalpha, 0.0)
            dpower = dalpha_raw * alpha_raw

            # d color/depth (+ unused alpha column): sum_p w * g -> (5, CHUNK).
            dprops = jax.lax.dot_general(
                gvec, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                 # (5, CHUNK)

            # Moments of dpower against the pixel quadratic basis -> (6, CK):
            # rows [xx, xy, yy, x, y, 1].
            m = jax.lax.dot_general(
                basis, dpower, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            Rxx, Rxy, Ryy = m[0:1], m[1:2], m[2:3]
            Rx, Ry, R0 = m[3:4], m[4:5], m[5:6]
            # d_opa = sum_p(dalpha_raw * expp) = sum_p(dpower) / opa, and
            # sum_p(dpower) is exactly the basis ones-row moment R0 — no
            # separate (P, CHUNK) reduction.
            d_opa = R0 / jnp.maximum(opa, 1e-12)               # (1,CK)
            # power = -0.5(a dx^2 + 2b dx dy + c dy^2), dx = x - u (tile-local)
            du = a * (Rx - u * R0) + bb * (Ry - v * R0)
            dv = bb * (Rx - u * R0) + c * (Ry - v * R0)
            da = -0.5 * (Rxx - 2.0 * u * Rx + u * u * R0)
            db = -(Rxy - u * Ry - v * Rx + u * v * R0)
            dc = -0.5 * (Ryy - 2.0 * v * Ry + v * v * R0)

            d16 = jnp.concatenate(
                [du, dv, da, db, dc, d_opa, dprops[0:4],
                 jnp.zeros((6, CHUNK), jnp.float32)],
                axis=0,
            )                                 # (16, CHUNK)
            dfeats_ref[0, :, pl.ds(j * CHUNK, CHUNK)] = d16

            logT = logT + jnp.sum(log1m, axis=1, keepdims=True)
            wg_pref = wg_pref + jnp.sum(wg, axis=1, keepdims=True)
            return logT, wg_pref

        # A saturated tile skips the remaining compute.
        return jax.lax.cond(
            jnp.max(logT) > LOG_SKIP, live, lambda c: c, carry
        )

    logT, wg_pref = jax.lax.fori_loop(0, nc, body, (logT_ref[...], wg_ref[...]))
    logT_ref[...] = logT
    wg_ref[...] = wg_pref


def _pad_tile_scalars(pstart_blk, counts):
    """Append the sentinel tile row (pstart 0, count 0) so owner==T_total
    reads resolve to zero live chunks."""
    z = jnp.zeros((1,), jnp.int32)
    return (jnp.concatenate([pstart_blk.astype(jnp.int32), z]),
            jnp.concatenate([counts.astype(jnp.int32), z]))


def _fwd_slab(feats_cm, owner_blk, seg_first, pstart_blk, counts,
              cfg: RasterConfig, K: int, emit_touched: bool = True):
    Tt = pstart_blk.shape[0]
    P = cfg.pixels
    n_img, _, E_cap = feats_cm.shape
    eb_img = E_cap // SLAB
    EB = n_img * eb_img
    pstart_p, counts_p = _pad_tile_scalars(pstart_blk, counts)
    kern = functools.partial(_slab_fwd_kernel, cfg=cfg, K=K,
                             emit_touched=emit_touched)
    out_specs = [
        pl.BlockSpec((1, 8, P), lambda b, owner, *_: (owner[b], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((Tt + 1, 8, P), jnp.float32)]
    if emit_touched:
        out_specs.append(
            pl.BlockSpec((1, 8, K), lambda b, owner, *_: (owner[b], 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((Tt + 1, 8, K), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(EB,),
        in_specs=[
            pl.BlockSpec((1, FEAT_ROWS, SLAB),
                         lambda b, *_: (b // eb_img, 0, b % eb_img),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((P, 1), jnp.float32)],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret_mode(),
    )(owner_blk, seg_first, pstart_p, counts_p, feats_cm)
    # Rows of empty tiles were never visited: mask them to zero (jnp.where,
    # not multiply, so uninitialized NaN patterns cannot leak through).
    nonempty = counts > 0
    out = jnp.where(nonempty[:, None, None], outs[0][:Tt], 0.0)
    out = out.transpose(0, 2, 1)              # (Tt, P, 8)
    if emit_touched:
        touched = jnp.where(nonempty[:, None], outs[1][:Tt, 0, :], 0)
    else:
        touched = jnp.zeros((Tt, K), jnp.int32)
    return out, touched


def _bwd_slab(feats_cm, owner_blk, seg_first, pstart_blk, counts, baux,
              cfg: RasterConfig, K: int):
    Tt = pstart_blk.shape[0]
    P = cfg.pixels
    n_img, _, E_cap = feats_cm.shape
    eb_img = E_cap // SLAB
    EB = n_img * eb_img
    pstart_p, counts_p = _pad_tile_scalars(pstart_blk, counts)
    kern = functools.partial(_slab_bwd_kernel, cfg=cfg, K=K)

    def baux_index_map(b, owner, *_):
        return (jnp.minimum(owner[b], Tt - 1), 0, 0)

    def slab_index_map(b, *_):
        return (b // eb_img, 0, b % eb_img)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(EB,),
        in_specs=[
            pl.BlockSpec((1, FEAT_ROWS, SLAB), slab_index_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P), baux_index_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FEAT_ROWS, SLAB), slab_index_map,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
        ],
    )
    dfeats_cm = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(feats_cm.shape, jnp.float32),
        interpret=_interpret_mode(),
    )(owner_blk, seg_first, pstart_p, counts_p, feats_cm, baux)
    return dfeats_cm


def _interpret_mode() -> bool:
    """Pallas TPU kernels run interpreted on CPU (tests use an 8-device CPU
    mesh; there is no Mosaic CPU backend)."""
    if os.environ.get("MONOGS_PALLAS_INTERPRET", "") == "1":
        return True
    return jax.default_backend() != "tpu"


# --- custom_vjp wrapper -----------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def composite_slab(feats_cm: jnp.ndarray, owner_blk: jnp.ndarray,
                   seg_first: jnp.ndarray, pstart_blk: jnp.ndarray,
                   counts: jnp.ndarray, cfg: RasterConfig,
                   tile_capacity: int, emit_touched: bool = True):
    """Differentiable slab compositing.

    feats_cm: (n_img, 16, entry_capacity) channel-major slab features
    owner_blk / seg_first: (total_blocks,) per-SLAB-block owner (GLOBAL tile
        id, sentinel T_total) and owner-boundary flags
    pstart_blk / counts: (T_total,) per-tile block start / entry count
    emit_touched=False skips the n_touched compute + output in the kernel
        (the hot SLAM loops discard it); `touched` is then all-zero.
    -> (out (T_total, P, 8), touched (T_total, K) int32)
    """
    return _fwd_slab(feats_cm, owner_blk, seg_first, pstart_blk, counts,
                     cfg, tile_capacity, emit_touched)


def _composite_fwd(feats_cm, owner_blk, seg_first, pstart_blk, counts,
                   cfg, K, emit_touched):
    out, touched = _fwd_slab(feats_cm, owner_blk, seg_first, pstart_blk,
                             counts, cfg, K, emit_touched)
    return (out, touched), (feats_cm, owner_blk, seg_first, pstart_blk,
                            counts, out)


def _composite_bwd(cfg, K, emit_touched, res, cotangents):
    feats_cm, owner_blk, seg_first, pstart_blk, counts, out = res
    g_out, _ = cotangents  # touched is non-differentiable
    g5 = g_out[:, :, 0:5]
    # Per-pixel total A = sum_j w_j g_j, recoverable from forward outputs:
    # out[...,0:5] = sum_j w_j [r, g, b, d, 1]_j.
    A = jnp.sum(out[:, :, 0:5] * g5, axis=-1, keepdims=True)
    baux = jnp.concatenate(
        [g5, A, jnp.zeros_like(g_out[:, :, 0:2])], axis=-1
    ).transpose(0, 2, 1)                      # (T, 8, P) channel-major
    dfeats = _bwd_slab(feats_cm, owner_blk, seg_first, pstart_blk, counts,
                       baux, cfg, K)
    z = lambda a: jnp.zeros(a.shape, jax.dtypes.float0)
    return (dfeats, z(owner_blk), z(seg_first), z(pstart_blk), z(counts))


composite_slab.defvjp(_composite_fwd, _composite_bwd)


# --- slab feature gather -----------------------------------------------------


def _relayout_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].T


def rows_to_channels(x: jnp.ndarray, block: int = 8192) -> jnp.ndarray:
    """(N, 16) row-major -> (16, N) channel-major via a Pallas transpose.

    XLA cannot be *forced* to materialize a layout change: a transpose +
    optimization_barrier gets a free-bitcast layout and the lane-strided
    access reappears in the consumers (measured: channel slices of the
    (Wn, N, 16) pack backward cost ~7.4 ms/iter at window 8 as XLA loop
    fusions that vectorize on the 16-wide minor axis). A Pallas call pins
    its operand/result layouts, so this runs as (block, 16) -> (16, block)
    VMEM transposes at memory bandwidth.

    N need not divide `block`: the ragged final grid step relies on Pallas
    block masking (OOB input lanes are don't-care, OOB output lanes are
    dropped) — a transpose maps garbage lanes only to dropped lanes. The
    previous jnp.pad materialized a full (N, 16) copy before the call
    (ADVICE r1)."""
    N, C = x.shape
    out = pl.pallas_call(
        _relayout_kernel,
        grid=(-(-N // block),),
        in_specs=[pl.BlockSpec((block, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N), x.dtype),
        interpret=_interpret_mode(),
    )(x)
    return out


def _segsum_last(dpos, gsort_pos, gseg_start, g_last, max_dup):
    """Occupancy-proportional per-Gaussian gradient reduction.

    dpos: (E_cap, C) per-slab-position gradients (padding rows are zero by
    the kernel's contract). Gather rows into gaussian-sorted order, run a
    segmented Hillis-Steele inclusive scan (ceil(log2(max_dup)) shift-add
    steps — each real segment is one gaussian's <= max_dup duplicates, so
    the scan saturates; the oversized padding segment is never read), then
    read each gaussian's segment total at its last entry. Exact fp32 tree
    sums — no prefix-difference cancellation. Cost ~E_cap + N rows, vs the
    N*max_dup-row inverse-permutation gather it replaces (9x real occupancy
    at 80k live / max_dup 8)."""
    Ecap, C = dpos.shape
    rows = jnp.take(dpos, gsort_pos, axis=0)             # (E_cap, C)
    flag = gseg_start.astype(bool)
    k = 1
    while k < max_dup:
        prev = jnp.concatenate(
            [jnp.zeros((k, C), rows.dtype), rows[:-k]], axis=0
        )
        pflag = jnp.concatenate([jnp.ones((k,), bool), flag[:-k]])
        rows = rows + jnp.where(flag[:, None], 0.0, prev)
        flag = flag | pflag
        k *= 2
    ok = g_last < Ecap                                   # sentinel == Ecap
    g = jnp.take(rows, jnp.minimum(g_last, Ecap - 1), axis=0)  # (N, C)
    return jnp.where(ok[:, None], g, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gather_pos(feats_full: jnp.ndarray, gauss_of_pos: jnp.ndarray,
               gsort_pos: jnp.ndarray, gseg_start: jnp.ndarray,
               g_last: jnp.ndarray, max_dup: int) -> jnp.ndarray:
    """(N+1, 16) features + (E_cap,) slab gaussian ids -> (16, E_cap).

    The gathers move contiguous 64-byte ROWS (XLA's TPU gather of strided
    columns and its scatter-add transpose both serialize badly — measured
    10-20ms each at N=100k; 16 per-channel 1-D gathers measured 2-5x slower
    than one row gather + transpose). One transpose each way converts to the
    kernels' channel-major layout. The backward reduces per-position
    gradients to per-Gaussian sums via the binning's gaussian-sorted slab
    view (_segsum_last) — occupancy-proportional, no scatter.
    """
    rows = jnp.take(feats_full, gauss_of_pos, axis=0)    # (E_cap, 16)
    # Barrier: without it XLA (under vmap) fuses the transpose INTO the
    # gather, turning it into a strided column gather — measured 22x slower
    # per row in the mapper's batched window backward.
    rows = jax.lax.optimization_barrier(rows)
    return rows.T                                        # (16, E_cap)


def _gather_pos_fwd(feats_full, gauss_of_pos, gsort_pos, gseg_start,
                    g_last, max_dup):
    # (custom_vjp fwd receives nondiff args in position; bwd gets them first)
    out = gather_pos(feats_full, gauss_of_pos, gsort_pos, gseg_start,
                     g_last, max_dup)
    return out, (feats_full.shape, gsort_pos, gseg_start, g_last)


def _gather_pos_bwd(max_dup, res, dpos_cm):
    (Np1, C), gsort_pos, gseg_start, g_last = res
    Ecap = dpos_cm.shape[1]
    # Same barrier as the forward: keep the row gather row-major instead of
    # letting XLA fuse the transpose into it (strided-gather pathology).
    dpos = jax.lax.optimization_barrier(dpos_cm.T)       # (E_cap, 16)
    g = _segsum_last(dpos, gsort_pos, gseg_start, g_last, max_dup)
    d_full = jnp.concatenate(
        [g, jnp.zeros((1, C), g.dtype)], axis=0
    )                                                    # (N+1, 16)
    zi = lambda a: jnp.zeros(a.shape, jax.dtypes.float0)
    return d_full, zi(gsort_pos), zi(gsort_pos), zi(gseg_start), zi(g_last)


gather_pos.defvjp(_gather_pos_fwd, _gather_pos_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14,))
def pack_features_window(u, v, ca, cb, cc, opacity, depth, r, g, b,
                         gauss_of_pos_w, gsort_pos_w, gseg_start_w,
                         g_last_w, max_dup):
    """Batched-window pack + slab gather: per-kf (Wn, N) channels (plus
    UNBATCHED shared (N,) rgb channels) -> (Wn, 16, E_cap) kernel layout.

    Everything stays (N,)-channel shaped end to end — no (N,2)/(N,3)
    mean2d/conic stacks feeding this op, so their backward split/restack
    pairs (~5 ms/iter at window 8, HLO-profiled) disappear; the shared rgb
    channels broadcast across keyframes here (never materialized batched)
    and their gradients sum over the window in the backward.

    One custom-VJP boundary spanning stack+gather: the backward emits the
    per-channel gradients directly (slices of the per-Gaussian reduction),
    avoiding the sentinel-row concat and stack/unstack round-trips an inner
    gather boundary would pay (measured ~9 ms/iter at window 8). The row
    gathers are UNROLLED per keyframe: both a vmapped gather and one flat
    gather over the concatenated window fall off a table-size cliff in
    XLA's TPU gather (measured 207-270 ms/iter vs 19 ms as small takes).
    The backward reduces per-position gradients through the gaussian-sorted
    slab view (_segsum_last) — occupancy-proportional, ~E_cap + N rows per
    keyframe instead of N*max_dup.

    The per-kf tables are built INSIDE the per-kf unrolled loop (not as one
    vmapped (Wn, N+1, 16) stack): building the batched table and slicing it
    per keyframe measured +20 ms/iter at window 8 vs fusing each table build
    into its own gather (scripts/bench_pack.py, TPU v5e)."""
    Wn = gauss_of_pos_w.shape[0]
    rows = jnp.stack(
        [jnp.take(
            _stack_features_ch(u[w], v[w], ca[w], cb[w], cc[w], opacity[w],
                               r, g, b, depth[w]),
            gauss_of_pos_w[w], axis=0)
         for w in range(Wn)]
    )                                                    # (Wn, E_cap, 16)
    rows = jax.lax.optimization_barrier(rows)
    return rows.transpose(0, 2, 1)


def _pfw_fwd(u, v, ca, cb, cc, opacity, depth, r, g, b, gop_w,
             gsort_pos_w, gseg_start_w, g_last_w, max_dup):
    out = pack_features_window(u, v, ca, cb, cc, opacity, depth, r, g, b,
                               gop_w, gsort_pos_w, gseg_start_w, g_last_w,
                               max_dup)
    return out, (gop_w, gsort_pos_w, gseg_start_w, g_last_w)


def _pfw_bwd(max_dup, res, dcm):
    gop_w, gsort_pos_w, gseg_start_w, g_last_w = res
    Wn = gop_w.shape[0]
    dpos = jax.lax.optimization_barrier(dcm.transpose(0, 2, 1))
    gr = jnp.stack(
        [_segsum_last(dpos[w], gsort_pos_w[w], gseg_start_w[w],
                      g_last_w[w], max_dup)
         for w in range(Wn)]                             # unrolled: small
    )                                                    # (Wn, N, 16)
    # Channel extraction from the row-major (Wn, N, 16) reduction result:
    # ONE Pallas relayout to channel-major, then contiguous slices. Slicing
    # gr[..., c] directly makes XLA emit lane-strided loop fusions that
    # re-read the whole 64 MB array (measured ~7.4 ms/iter at window 8 /
    # N 131072); a jnp transpose + optimization_barrier does NOT fix it
    # (XLA assigns the barrier a free-bitcast layout and the strided access
    # reappears downstream) — rows_to_channels pins the layout.
    grT = jax.vmap(rows_to_channels)(gr)                 # (Wn, 16, N)
    zi = lambda a: jnp.zeros(a.shape, jax.dtypes.float0)
    return (grT[:, 0], grT[:, 1], grT[:, 2], grT[:, 3], grT[:, 4],
            grT[:, 5], grT[:, 9],
            jnp.sum(grT[:, 6], axis=0), jnp.sum(grT[:, 7], axis=0),
            jnp.sum(grT[:, 8], axis=0),
            zi(gop_w), zi(gsort_pos_w), zi(gseg_start_w), zi(g_last_w))


pack_features_window.defvjp(_pfw_fwd, _pfw_bwd)


def _stack_features_ch(u, v, ca, cb, cc, opacity, r, g, b, depth):
    """(N,) channels -> per-Gaussian (N+1, 16) feature rows; row N is the
    all-zero sentinel. opacity must already be masked by validity."""
    N = u.shape[0]
    feats_full = jnp.stack(
        [u, v, ca, cb, cc, opacity, r, g, b, depth], axis=1
    )                                               # (N, 10)
    feats_full = jnp.concatenate(
        [
            feats_full,
            jnp.zeros((N, FEAT_ROWS - feats_full.shape[1]), feats_full.dtype),
        ],
        axis=1,
    )                                               # (N, 16)
    return jnp.concatenate(
        [feats_full, jnp.zeros((1, FEAT_ROWS), feats_full.dtype)], axis=0
    )                                               # sentinel row N


def _stack_features(
    mean2d: jnp.ndarray,   # (N, 2)
    conic: jnp.ndarray,    # (N, 3)
    opacity: jnp.ndarray,  # (N,) already masked by validity
    rgb: jnp.ndarray,      # (N, 3)
    depth: jnp.ndarray,    # (N,)
) -> jnp.ndarray:
    """Matrix-shaped wrapper over _stack_features_ch (oracle path)."""
    return _stack_features_ch(
        mean2d[:, 0], mean2d[:, 1], conic[:, 0], conic[:, 1], conic[:, 2],
        opacity, rgb[:, 0], rgb[:, 1], rgb[:, 2], depth,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(12,))
def pack_features_slab(u, v, ca, cb, cc, opacity, rgb, depth,
                       gauss_of_pos, gsort_pos, gseg_start, g_last,
                       max_dup) -> jnp.ndarray:
    """Gather per-Gaussian channel features into the (16, entry_capacity)
    channel-major slab layout with the occupancy-proportional segmented-scan
    backward.

    Custom VJP spans stack+gather (like pack_features_window): the backward
    transposes the (N, 16) per-Gaussian reduction ONCE to channel-major and
    returns contiguous slices — autodiff of the channel stack would emit
    lane-strided slice fusions re-reading the whole array instead."""
    feats_full = _stack_features_ch(
        u, v, ca, cb, cc, opacity, rgb[:, 0], rgb[:, 1], rgb[:, 2], depth
    )
    return gather_pos(feats_full, gauss_of_pos, gsort_pos, gseg_start,
                      g_last, max_dup)


def _pfs_fwd(u, v, ca, cb, cc, opacity, rgb, depth, gauss_of_pos,
             gsort_pos, gseg_start, g_last, max_dup):
    out = pack_features_slab(u, v, ca, cb, cc, opacity, rgb, depth,
                             gauss_of_pos, gsort_pos, gseg_start, g_last,
                             max_dup)
    return out, (gauss_of_pos, gsort_pos, gseg_start, g_last)


def _pfs_bwd(max_dup, res, dcm):
    gauss_of_pos, gsort_pos, gseg_start, g_last = res
    dpos = jax.lax.optimization_barrier(dcm.T)           # (E_cap, 16)
    g = _segsum_last(dpos, gsort_pos, gseg_start, g_last, max_dup)  # (N, 16)
    gT = rows_to_channels(g)                             # (16, N)
    zi = lambda a: jnp.zeros(a.shape, jax.dtypes.float0)
    return (gT[0], gT[1], gT[2], gT[3], gT[4], gT[5],
            gT[6:9].T, gT[9],
            zi(gauss_of_pos), zi(gsort_pos), zi(gseg_start), zi(g_last))


pack_features_slab.defvjp(_pfs_fwd, _pfs_bwd)


def pack_features(mean2d, conic, opacity, rgb, depth,
                  index_matrix: jnp.ndarray) -> jnp.ndarray:
    """Gather per-Gaussian features into the dense (T, K, 16) layout (used
    by the pure-JAX oracle path; plain autodiff scatter-add backward)."""
    feats_full = _stack_features(mean2d, conic, opacity, rgb, depth)
    return jnp.take(feats_full, index_matrix, axis=0)    # (T, K, 16)
