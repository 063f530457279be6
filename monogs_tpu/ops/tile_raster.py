"""Tile-based alpha compositing: the Pallas rasterizer core.

TPU-native replacement for the CUDA `diff-gaussian-rasterization-w-pose`
render/backward kernels (contract documented at reference
gaussian_splatting/gaussian_renderer/__init__.py:130-168). The differentiable
boundary is `composite_tiles(feats)` where `feats` are per-(tile, slot)
gathered 2D Gaussian features; gradients w.r.t. 3D parameters AND camera pose
flow by JAX autodiff through the projection stage + gather that produce
`feats` (see ops/projection.py, ops/render.py).

Feature layout: `feats` is (T, K, 16) — row-major per slot so the feature
gather (and its transpose) moves contiguous 64-byte rows; kernels transpose
each (CHUNK, 16) slab to (16, CHUNK) in VMEM. Feature channels (last axis;
10 used, 6 spare to meet the TPU divisibility rule):
    0: u (pixel x of 2D mean)   5: opacity (activated, 0 for padding)
    1: v                        6,7,8: r, g, b
    2: conic_a                  9: depth
    3: conic_b
    4: conic_c

Outputs: `out` (T, P, 8) with columns [r, g, b, depth, alpha, 0, 0, 0] per
tile pixel (P = tile_size**2, row-major in tile), and `touched` (T, K) int32
pixel counts per slot (the n_touched visibility signal, reference
slam_tracker.py:414).

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
into closed-form per-slot gradients for (u, v, conic).

Tile indices wrap modulo cfg.num_tiles so several images' tiles can be
concatenated along the grid axis (batched keyframe-window rendering).
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

ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99
TOUCH_T_MIN = 1e-4          # transmittance floor for the n_touched signal
CHUNK = 128                 # slots processed per inner step (lane width)
LOG_SKIP = -16.0            # skip chunks once max log-transmittance < this
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
# Pallas kernels.
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


def _tile_origin(cfg: RasterConfig):
    t = jax.lax.rem(pl.program_id(0), cfg.num_tiles)  # wrap for batched images
    ox = (jax.lax.rem(t, cfg.tiles_x) * cfg.tile_size).astype(jnp.float32)
    oy = (jax.lax.div(t, cfg.tiles_x) * cfg.tile_size).astype(jnp.float32)
    return ox, oy


def _chunk_feats(feats_ref, ck):
    """Load one (CHUNK, 16) slab and transpose to channel-major (16, CHUNK)."""
    sl = pl.ds(ck * CHUNK, CHUNK)
    return feats_ref[0, sl, :].T             # (16, CHUNK)


def _chunk_alpha(tf, ox, oy, x, y):
    """Shared per-chunk alpha computation on a (16, CHUNK) slab. Returns
    tile-local (u, v), conic rows, opacity row, exp(power), alpha."""
    u = tf[0:1, :] - ox                      # (1, CHUNK) tile-local
    v = tf[1:2, :] - oy
    a = tf[2:3, :]
    b = tf[3:4, :]
    c = tf[4:5, :]
    opa = tf[5:6, :]
    dx = x - u                               # (P, CHUNK)
    dy = y - v
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    expp = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = opa * expp
    ok = (power <= 0.0) & (alpha_raw >= ALPHA_EPS)
    alpha = jnp.where(ok, jnp.minimum(alpha_raw, ALPHA_MAX), 0.0)
    return u, v, a, b, c, opa, expp, alpha_raw, ok, alpha


def _fwd_kernel(counts_ref, feats_ref, out_ref, touched_ref, *,
                cfg: RasterConfig, K: int):
    P = cfg.pixels
    ox, oy = _tile_origin(cfg)
    x, y, _ = _pix_basis(cfg)
    strict, _ = _tri_matrices()
    pix_valid = ((ox + x - 0.5) < cfg.img_w) & ((oy + y - 0.5) < cfg.img_h)

    # Only the occupied prefix of the slot axis does work (per-tile counts
    # arrive via scalar prefetch); outputs are zero-initialized first.
    touched_ref[0] = jnp.zeros((8, K), jnp.int32)
    count = counts_ref[pl.program_id(0)]
    n_chunks = jnp.minimum((count + CHUNK - 1) // CHUNK, K // CHUNK)

    def body(ck, carry):
        logT, acc = carry                     # (P,1), (P,8)

        def live(carry):
            logT, acc = carry
            tf = _chunk_feats(feats_ref, ck)
            _, _, _, _, _, _, _, _, ok, alpha = _chunk_alpha(tf, ox, oy, x, y)
            log1m = jnp.log1p(-alpha)
            excl = jax.lax.dot_general(
                log1m, strict, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            Tk = jnp.exp(logT + excl)
            w = alpha * Tk
            sl = pl.ds(ck * CHUNK, CHUNK)
            colors_t = jnp.concatenate(
                [
                    tf[6:10, :],                          # r, g, b, depth
                    jnp.ones((1, CHUNK), jnp.float32),    # alpha accumulator
                    jnp.zeros((3, CHUNK), jnp.float32),
                ],
                axis=0,
            )                                 # (8, CHUNK)
            acc = acc + jax.lax.dot_general(
                w, colors_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cnt = jnp.sum(
                (ok & (Tk > TOUCH_T_MIN) & pix_valid).astype(jnp.int32),
                axis=0, keepdims=True,
            )                                 # (1, CHUNK)
            touched_ref[0, 0:1, sl] = cnt
            logT = logT + jnp.sum(log1m, axis=1, keepdims=True)
            return logT, acc

        # Outputs are pre-zeroed; a saturated tile skips the remaining work.
        return jax.lax.cond(
            jnp.max(logT) > LOG_SKIP, live, lambda c: c, carry
        )

    logT0 = jnp.zeros((P, 1), jnp.float32)
    acc0 = jnp.zeros((P, 8), jnp.float32)
    _, acc = jax.lax.fori_loop(0, n_chunks, body, (logT0, acc0))
    out_ref[0] = acc


def _bwd_kernel(counts_ref, feats_ref, baux_ref, dfeats_ref, *,
                cfg: RasterConfig, K: int):
    """baux: (1, P, 8) columns [g_r, g_g, g_b, g_depth, g_alpha, A, 0, 0]
    where A = per-pixel total sum_j w_j g_j (precomputed outside)."""
    ox, oy = _tile_origin(cfg)
    x, y, basis = _pix_basis(cfg)
    strict, incl = _tri_matrices()

    gvec = baux_ref[0, :, 0:5]                # (P, 5)
    A = baux_ref[0, :, 5:6]                   # (P, 1)

    dfeats_ref[0] = jnp.zeros((K, FEAT_ROWS), jnp.float32)
    count = counts_ref[pl.program_id(0)]
    n_chunks = jnp.minimum((count + CHUNK - 1) // CHUNK, K // CHUNK)

    def body(ck, carry):
        logT, wg_pref = carry                 # (P,1), (P,1)
        sl = pl.ds(ck * CHUNK, CHUNK)

        def live(carry):
            logT, wg_pref = carry
            tf = _chunk_feats(feats_ref, ck)
            u, v, a, b, c, opa, expp, alpha_raw, ok, alpha = _chunk_alpha(
                tf, ox, oy, x, y
            )
            log1m = jnp.log1p(-alpha)
            excl = jax.lax.dot_general(
                log1m, strict, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            Tk = jnp.exp(logT + excl)
            w = alpha * Tk

            # Per-(pixel, slot) cotangent of w: g = c.g_rgb + d*g_d + g_a.
            props = jnp.concatenate(
                [tf[6:10, :], jnp.ones((1, CHUNK), jnp.float32)],
                axis=0,
            )                                 # (5, CHUNK)
            g = jax.lax.dot_general(
                gvec, props, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                 # (P, CHUNK)
            wg = w * g
            pref = wg_pref + jax.lax.dot_general(
                wg, incl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                 # inclusive prefix incl. carry
            S = A - pref
            dalpha = Tk * g - S / (1.0 - alpha)
            dalpha_raw = jnp.where(ok & (alpha_raw < ALPHA_MAX), dalpha, 0.0)
            dpower = dalpha_raw * alpha_raw
            d_opa = jnp.sum(dalpha_raw * expp, axis=0, keepdims=True)  # (1,CK)

            # d color/depth (+ unused alpha column): sum_p w * g -> (5, CHUNK).
            dprops = jax.lax.dot_general(
                gvec, w, (((0,), (0,)), ((), ())),
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
            # power = -0.5(a dx^2 + 2b dx dy + c dy^2), dx = x - u (tile-local)
            du = a * (Rx - u * R0) + b * (Ry - v * R0)
            dv = b * (Rx - u * R0) + c * (Ry - v * R0)
            da = -0.5 * (Rxx - 2.0 * u * Rx + u * u * R0)
            db = -(Rxy - u * Ry - v * Rx + u * v * R0)
            dc = -0.5 * (Ryy - 2.0 * v * Ry + v * v * R0)

            d16 = jnp.concatenate(
                [du, dv, da, db, dc, d_opa, dprops[0:4],
                 jnp.zeros((6, CHUNK), jnp.float32)],
                axis=0,
            )                                 # (16, CHUNK)
            dfeats_ref[0, sl, :] = d16.T      # back to row-major (CHUNK, 16)

            logT = logT + jnp.sum(log1m, axis=1, keepdims=True)
            wg_pref = wg_pref + jnp.sum(wg, axis=1, keepdims=True)
            return logT, wg_pref

        # Outputs are pre-zeroed; a saturated tile skips the remaining work.
        return jax.lax.cond(
            jnp.max(logT) > LOG_SKIP, live, lambda c: c, carry
        )

    logT0 = jnp.zeros((cfg.pixels, 1), jnp.float32)
    wg0 = jnp.zeros((cfg.pixels, 1), jnp.float32)
    jax.lax.fori_loop(0, n_chunks, body, (logT0, wg0))


def _fwd_pallas(feats: jnp.ndarray, counts: jnp.ndarray, cfg: RasterConfig):
    T, K = feats.shape[0], feats.shape[1]
    P = cfg.pixels
    kern = functools.partial(_fwd_kernel, cfg=cfg, K=K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, K, FEAT_ROWS), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, K), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out, touched8 = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, P, 8), jnp.float32),
            jax.ShapeDtypeStruct((T, 8, K), jnp.int32),
        ],
        interpret=_interpret_mode(),
    )(counts, feats)
    return out, touched8[:, 0, :]


def _bwd_pallas(feats: jnp.ndarray, counts: jnp.ndarray, baux: jnp.ndarray,
                cfg: RasterConfig):
    T, K = feats.shape[0], feats.shape[1]
    P = cfg.pixels
    kern = functools.partial(_bwd_kernel, cfg=cfg, K=K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, K, FEAT_ROWS), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, FEAT_ROWS), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    dfeats = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, K, FEAT_ROWS), jnp.float32),
        interpret=_interpret_mode(),
    )(counts, feats, baux)
    return dfeats


def _interpret_mode() -> bool:
    """Pallas TPU kernels run interpreted on CPU (tests use an 8-device CPU
    mesh; there is no Mosaic CPU backend)."""
    if os.environ.get("MONOGS_PALLAS_INTERPRET", "") == "1":
        return True
    return jax.default_backend() != "tpu"


# --- custom_vjp wrapper -----------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def composite_tiles_pallas(feats: jnp.ndarray, counts: jnp.ndarray,
                           cfg: RasterConfig):
    return _fwd_pallas(feats, counts, cfg)


def _composite_fwd(feats, counts, cfg):
    out, touched = _fwd_pallas(feats, counts, cfg)
    return (out, touched), (feats, counts, out)


def _composite_bwd(cfg, res, cotangents):
    feats, counts, out = res
    g_out, _ = cotangents  # touched is non-differentiable
    g5 = g_out[:, :, 0:5]
    # Per-pixel total A = sum_j w_j g_j, recoverable from forward outputs:
    # out[...,0:5] = sum_j w_j [r, g, b, d, 1]_j.
    A = jnp.sum(out[:, :, 0:5] * g5, axis=-1, keepdims=True)
    baux = jnp.concatenate(
        [g5, A, jnp.zeros_like(g_out[:, :, 0:2])], axis=-1
    )
    dfeats = _bwd_pallas(feats, counts, baux, cfg)
    d_counts = jnp.zeros(counts.shape, jax.dtypes.float0)
    return (dfeats, d_counts)


composite_tiles_pallas.defvjp(_composite_fwd, _composite_bwd)


def composite_tiles(
    feats: jnp.ndarray, cfg: RasterConfig, counts: jnp.ndarray | None = None,
    backend: str = "pallas",
):
    """Dispatch: 'pallas' (TPU kernels; interpreted off-TPU) or 'ref'
    (pure-JAX oracle). feats: (T, K, 16); counts: (T,) occupied slots per
    tile (None = assume full; padded slots are zero-opacity either way)."""
    if backend == "ref":
        return composite_tiles_ref(feats, cfg)
    if counts is None:
        counts = jnp.full((feats.shape[0],), feats.shape[1], jnp.int32)
    return composite_tiles_pallas(feats, counts, cfg)


@jax.custom_vjp
def gather_feats(feats_full: jnp.ndarray, index_matrix: jnp.ndarray,
                 slot_of_entry: jnp.ndarray) -> jnp.ndarray:
    """(N+1, 16) features + (T, K) indices -> (T, K, 16) tile layout.

    Row-major everywhere: both the forward gather and the backward move
    contiguous 64-byte rows (XLA's TPU gather of strided columns and its
    scatter-add transpose both serialize badly — measured ~10-20ms each at
    N=100k). The backward uses the binning's precomputed entry->(tile,slot)
    inverse permutation: a dense row gather of per-slot gradients followed
    by a per-Gaussian reduction over the duplicate axis.
    """
    return jnp.take(feats_full, index_matrix, axis=0)    # (T, K, 16)


def _gather_feats_fwd(feats_full, index_matrix, slot_of_entry):
    out = gather_feats(feats_full, index_matrix, slot_of_entry)
    return out, (feats_full.shape, index_matrix.shape, slot_of_entry)


def _gather_feats_bwd(res, dfeats):
    (Np1, C), (T, K), slot_of_entry = res
    N = Np1 - 1
    E = slot_of_entry.shape[0]
    D = E // N
    slot = slot_of_entry                                 # linear t*K + k
    ok = slot < T * K
    rows = jnp.minimum(slot, T * K - 1)
    g_entry = jnp.take(dfeats.reshape(T * K, C), rows, axis=0)  # (E, 16)
    g_entry = jnp.where(ok[:, None], g_entry, 0.0)
    g = jnp.sum(g_entry.reshape(N, D, C), axis=1)        # (N, 16)
    d_full = jnp.concatenate(
        [g, jnp.zeros((1, C), g.dtype)], axis=0
    )                                                    # (N+1, 16)
    zi = jnp.zeros((T, K), jax.dtypes.float0)
    ze = jnp.zeros((E,), jax.dtypes.float0)
    return d_full, zi, ze


gather_feats.defvjp(_gather_feats_fwd, _gather_feats_bwd)


def pack_features(
    mean2d: jnp.ndarray,   # (N, 2)
    conic: jnp.ndarray,    # (N, 3)
    opacity: jnp.ndarray,  # (N,) already masked by validity
    rgb: jnp.ndarray,      # (N, 3)
    depth: jnp.ndarray,    # (N,)
    index_matrix: jnp.ndarray,  # (T, K) with sentinel N
    slot_of_entry: jnp.ndarray | None = None,  # (N*D,) from TileBins
) -> jnp.ndarray:
    """Gather per-Gaussian features into the (T, K, 16) kernel layout.
    With slot_of_entry, the gather uses the fast inverse-permutation
    backward; without it, plain autodiff (scatter-add) applies."""
    N = mean2d.shape[0]
    feats_full = jnp.stack(
        [
            mean2d[:, 0], mean2d[:, 1],
            conic[:, 0], conic[:, 1], conic[:, 2],
            opacity, rgb[:, 0], rgb[:, 1], rgb[:, 2], depth,
        ],
        axis=1,
    )                                               # (N, 10)
    feats_full = jnp.concatenate(
        [
            feats_full,
            jnp.zeros((N, FEAT_ROWS - feats_full.shape[1]), feats_full.dtype),
        ],
        axis=1,
    )                                               # (N, 16)
    feats_full = jnp.concatenate(
        [feats_full, jnp.zeros((1, FEAT_ROWS), feats_full.dtype)], axis=0
    )                                               # sentinel row N
    if slot_of_entry is not None:
        return gather_feats(feats_full, index_matrix, slot_of_entry)
    return jnp.take(feats_full, index_matrix, axis=0)    # (T, K, 16)
