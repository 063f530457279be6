"""Mapper (SLAM backend): keyframe-window Gaussian optimization.

TPU-native counterpart of the reference Mapper
(/root/reference/utils/slam_mapper.py:16-734). Key re-design decisions:

- The per-iteration work — render every window keyframe, sum mapping losses,
  one backward, Adam on Gaussians + keyframe poses, pose retraction — is ONE
  jitted `mapping_step` on a *stacked* window (ops/render.py:render_window
  batches all keyframes into a single rasterizer launch), replacing the
  reference's serial python loop over keyframes (slam_mapper.py:273-322).
- Cadenced topology events (densify/prune every gaussian_update_every=150
  iters at offset 50, non-visible opacity reset every 2001,
  slam_mapper.py:462-479) are separate jitted calls driven by the host loop;
  they mutate the static-capacity map with masked writes.
- Covisibility pruning (slam_mapper.py:408-451) never remaps indices:
  because the map is a static SoA with an `active` mask, per-keyframe
  visibility masks stay aligned across prunes (the reference must filter its
  visibility dict after every prune).
- Map snapshots for the tracker are free: JAX arrays are immutable, so
  "push_to_frontend" (slam_mapper.py:550-564, deepcopy+pickle `clone_obj`)
  becomes sharing an array reference.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import gaussian_map as gm
from ..models.optim import AdamState, adam_step, expon_lr, init_adam
from ..ops import lie
from ..ops.graphics import Intrinsics
from ..ops.losses import get_loss_mapping, l1_loss, ssim
from ..ops.render import render, render_window
from .camera import Frame, Window


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    """Static mapping hyperparameters (reference slam_mapper.py:61-90 and
    configs/*/base_config.yaml Training/opt_params)."""

    # Map init (slam_mapper.py:64-75)
    init_itr_num: int = 1050
    init_gaussian_update: int = 100
    init_gaussian_reset: int = 500
    init_gaussian_th: float = 0.005
    init_gaussian_extent: float = 30.0   # cameras_extent(1.0) * 30
    # Window optimization (slam_mapper.py:76-89, run handler :660-662)
    iters_per_kf: int = 300
    gaussian_update_every: int = 150
    gaussian_update_offset: int = 50
    gaussian_th: float = 0.7
    gaussian_extent: float = 1.0
    gaussian_reset: int = 2001
    size_threshold: float = 20.0
    prune_coviz: int = 3
    window_size: int = 8
    # 3DGS optimizer (configs opt_params, gaussian_model.py:398-449)
    densify_grad_threshold: float = 2e-4
    percent_dense: float = 0.01
    spatial_lr_scale: float = 6.0        # slam.py:87 init_lr(6.0)
    position_lr_init: float = 1.6e-3
    position_lr_final: float = 1.6e-6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30000
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.05
    scaling_lr: float = 1e-3
    rotation_lr: float = 1e-3
    # Keyframe pose optimizer (run handler slam_mapper.py:687-717: lr * 0.5)
    lr_rot: float = 0.003 * 0.5
    lr_trans: float = 0.001 * 0.5
    lr_exposure: float = 0.01
    pose_adam_eps: float = 1e-8
    # Refinement (slam_mapper.py:502-548)
    refine_iters: int = 26000
    lambda_ssim: float = 0.2
    # Refinement renders use EVAL-grade binning caps, not the SLAM loop's
    # perf-tuned ones. Measured (round 3, iso study run
    # 2026-08-21-14-12-28): the final map's demand exceeds the production
    # caps by ~17-19k entries per render (metrics overflow_max), and 3000
    # refine iterations of gradients against those truncated renders
    # trained the map to fill holes that only exist under truncation —
    # post-refine eval 17.79 dB vs 22.85 dB for the SAME pre-refine map.
    # Offline refinement is not latency-critical; correctness wins.
    refine_tile_capacity: int = 4096
    refine_max_dup: int = 32
    # Colors-only refinement (r4 default; measured on the r4 flagship
    # pre-refine map, /tmp refine study 2026-08-21): refining ALL params
    # under a capped rasterizer feeds a widening feedback loop — truncated
    # tiles render black, gradients widen/darken nearby splats, wider
    # splats truncate more (in-run refine(3000): 17.8 -> 16.75 dB with
    # eval-frame drops growing 21k -> 54k). Freezing geometry held the
    # gain (304 iters: +1.3 dB frozen vs +2.0 all-params, but the
    # all-params path degrades past ~1k iters) AND is production-cap
    # tolerant (19.17 dB at dup8/tile2048 vs 19.11 at eval caps), so
    # colors-only refine renders at the FAST production caps and
    # differentiates only rgb/opacity (the projection backward for
    # xyz/quats/scales is DCEd). The reference refines all params
    # (slam_mapper.py:502-548) — but its CUDA rasterizer is uncapped, so
    # the loop this guards against cannot occur there; set False to match
    # reference semantics at eval-grade caps.
    refine_colors_only: bool = True
    # Rendering (tile 32: see TrackerConfig note)
    tile_size: int = 32
    tile_capacity: int = 1024
    # Generate candidates 16 wide, compact cull survivors to 4 slots per
    # gaussian (tile_bin max_dup_gen): mapping 80.6 -> 73.3 ms/iter at
    # window 8 / 640x480 / 80k live, +~80 dropped entries per keyframe.
    max_dup: int = 4
    max_dup_gen: int | None = 16
    entry_capacity: int | None = None  # slab rows; None = safe auto
    # Peak-alpha tile cull threshold (binning._tile_candidates). 1/255 is
    # EXACT reference parity; raising it drops barely-visible tiles to cut
    # compositing pairs (Raster.cull_alpha — the isotropic-protocol
    # throughput knob, r5 study in RESULTS.md).
    cull_alpha: float = 1.0 / 255.0
    backend: str = "pallas"
    isotropic: bool = False
    # Monocular (no sensor depth): upstream-MonoGS seeding semantics.
    monocular: bool = False
    # Seed sensor-depth dropout regions (stereo SGBM holes) with
    # synthesized mono-style depth where the render is transparent
    # (gaussian_map.extend_from_keyframe fill note). OPT-IN
    # (Dataset.fill_depth_dropout): measured catastrophic as a stereo
    # default — invented hole geometry corrupts tracking (r5 A/B: ATE
    # 1.17 on vs 0.0208 off at 100 frames; RESULTS.md stereo note).
    fill_depth_dropout: bool = False
    # Isotropy regularization 10*mean|s - mean(s)| (upstream MonoGS; the
    # fork comments it out at slam_mapper.py:390-393 in favor of the hard
    # isotropic flag). 0 disables (fork behavior).
    isotropic_loss_weight: float = 0.0
    # Convergence early exit for mapping spans (TPU-native deviation: the
    # reference runs fixed iteration counts, slam_mapper.py:258-496).
    # When converged_eps > 0, the DEVICE span loop breaks once the window
    # loss's relative per-iteration improvement stays below converged_eps
    # for converged_patience consecutive iterations (stall counter carries
    # across rebin segments). The host cadence schedule is unchanged —
    # densify/reset events still fire at their virtual iteration points;
    # only the device work between them shrinks. 0 = off (parity).
    converged_eps: float = 0.0
    converged_patience: int = 4
    # L2 anchor on per-keyframe exposure (see TrackerConfig.exposure_reg:
    # the brightness gauge random-walks on long runs). 0 = parity.
    exposure_reg: float = 0.0
    # Mapping-loss rgb/depth mix: lambda * l1_rgb + (1-lambda) * l1_depth
    # (reference slam_utils.py:101-146, lambda_depth=0.9). Exposed for the
    # RGB-D-vs-mono photometric study (VERDICT r4 task 3).
    lambda_depth: float = 0.9
    # Re-run tile binning every k mapping iterations (Gaussian/pose motion
    # per iteration is sub-pixel); topology events always force a refresh.
    rebin_every: int = 8
    # Keyframe seeding (gaussian_model.py:169-175, configs pcd_downsample*)
    pcd_downsample_init: int = 32
    pcd_downsample: int = 64
    point_size: float = 0.01
    max_new_per_kf: int = 16384

    def map_lrs(self, step):
        """Per-leaf learning rates; xyz follows the exponential schedule
        (gaussian_model.py:439-462)."""
        xyz_lr = expon_lr(
            step,
            self.position_lr_init * self.spatial_lr_scale,
            self.position_lr_final * self.spatial_lr_scale,
            0.0, self.position_lr_delay_mult, self.position_lr_max_steps,
        )
        return {
            "xyz": xyz_lr,
            "rgb": self.feature_lr,
            "log_scales": self.scaling_lr * self.spatial_lr_scale,
            "quats": self.rotation_lr,
            "opacity_logit": self.opacity_lr,
        }


class PoseAdam(NamedTuple):
    """Stacked Adam moments for per-keyframe (rho, theta, exp_a, exp_b)."""

    mu_rho: jnp.ndarray     # (Wc, 3)
    mu_theta: jnp.ndarray   # (Wc, 3)
    mu_ea: jnp.ndarray      # (Wc,)
    mu_eb: jnp.ndarray      # (Wc,)
    nu_rho: jnp.ndarray
    nu_theta: jnp.ndarray
    nu_ea: jnp.ndarray
    nu_eb: jnp.ndarray
    step: jnp.ndarray       # () int32


def init_pose_adam(capacity: int) -> PoseAdam:
    z3 = jnp.zeros((capacity, 3))
    z = jnp.zeros((capacity,))
    return PoseAdam(z3, z3, z, z, z3, z3, z, z, jnp.zeros((), jnp.int32))


class MapperState(NamedTuple):
    gmap: gm.GaussianMap
    adam: AdamState
    window: Window
    pose_adam: PoseAdam
    nr_iters: jnp.ndarray   # () int32, global (init + mapping) iteration count
    rng: jax.Array


def init_mapper_state(capacity: int, nr_objects: int, window: Window,
                      seed: int = 0) -> MapperState:
    gmap = gm.init_map(capacity, nr_objects)
    return MapperState(
        gmap=gmap,
        adam=init_adam(gmap.params),
        window=window,
        pose_adam=init_pose_adam(window.capacity),
        nr_iters=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(seed),
    )


class MappingAux(NamedTuple):
    # NOTE: per-iteration n_touched visibility is deliberately NOT computed
    # in the hot loop (the reference refreshes occ_aware_visibility every
    # iteration, slam_mapper.py:400-404); the host gets it from
    # visibility_pass at cadence boundaries instead. Equivalence of the two
    # accountings for prune decisions is asserted by
    # tests/test_slam_e2e.py::test_visibility_cadence_matches_per_iteration.
    loss: jnp.ndarray
    vis_filter: jnp.ndarray   # (Wc, C) bool — radii > 0 (visibility_filter)
    overflow: jnp.ndarray
    overflow_parts: jnp.ndarray  # (4,) int32 (see binning.TileBins)


# ---------------------------------------------------------------------------
# The jitted mapping iteration.
# ---------------------------------------------------------------------------


def _window_bins_traced(state: MapperState, intr: Intrinsics,
                        cfg: MapperConfig):
    """Tile binning for every window keyframe at the current state (reused
    across mapping iterations; refreshed on cadence / topology events)."""
    from ..ops.binning import tile_bin
    from ..ops.projection import project_gaussians_ch

    gmap, f = state.gmap, state.window.frames
    scales = gm.get_scales(gmap.params, cfg.isotropic)
    opac = gm.get_opacity(gmap.params)

    def per_kf(R, t):
        proj = project_gaussians_ch(
            gmap.params["xyz"], scales, gmap.params["quats"], opac,
            R, t, jnp.zeros(3), jnp.zeros(3), intr,
            active=gmap.active,
        )
        return tile_bin(
            None, proj.radius, proj.depth, proj.valid,
            img_w=intr.width, img_h=intr.height, tile_size=cfg.tile_size,
            tile_capacity=cfg.tile_capacity, max_dup=cfg.max_dup,
            entry_capacity=cfg.entry_capacity,
            opacity=jnp.where(proj.valid, proj.opacity, 0.0),
            conic=(proj.ca, proj.cb, proj.cc), uv=(proj.u, proj.v),
            max_dup_gen=cfg.max_dup_gen, cull_alpha=cfg.cull_alpha,
        )

    return jax.vmap(per_kf)(f.R, f.t)


window_bins = jax.jit(_window_bins_traced, static_argnames=("intr", "cfg"))


def _tile_window_gt(window, intr: Intrinsics, cfg: MapperConfig):
    """Pre-tile the window's ground-truth images into the rasterizer's
    (T, P) tile layout (render.tile_image), computed ONCE per chunk so the
    per-iteration loss runs in tile space — no per-iteration tile->image
    assemble + backward (~3.5 ms/iter at window 8, HLO-profiled). The mask
    absorbs tile padding (False there), keeping masked_mean values
    identical to image-space losses."""
    from ..ops.render import make_raster_config, tile_image

    rcfg = make_raster_config(intr.width, intr.height, cfg.tile_size)
    f = window.frames
    rgb_t = jax.vmap(lambda x: tile_image(x, rcfg))(f.rgb)
    depth_t = jax.vmap(lambda x: tile_image(x, rcfg))(f.depth)
    ones = jnp.ones(f.rgb.shape[1:3], bool)
    pad_valid = tile_image(ones, rcfg)
    mask_t = jax.vmap(lambda x: tile_image(x, rcfg))(f.mask) & pad_valid
    return rgb_t, depth_t, mask_t


def _mapping_iter(
    state: MapperState, intr: Intrinsics, cfg: MapperConfig, init: bool,
    bins, gt_tiles,
):
    """One mapping iteration over the whole window (slam_mapper.py:258-496;
    init=True reproduces initialize_map's single-frame loss without exposure,
    slam_mapper.py:169-238). Traced body — see mapping_step / mapping_chunk
    for the jitted entry points."""
    gmap, window = state.gmap, state.window
    Wc = window.capacity
    C = gmap.capacity
    f: Frame = window.frames
    scales_fn = lambda p: gm.get_scales(p, cfg.isotropic)
    gt_rgb_t, gt_depth_t, gt_mask_t = gt_tiles

    valid_f = window.valid.astype(jnp.float32)
    not_frame0 = (f.frame_idx != 0) & window.valid

    def loss_fn(params, rhos, thetas, eas, ebs, dummy):
        out = render_window(
            params["xyz"], scales_fn(params), params["quats"],
            gm.get_opacity(params), params["rgb"],
            f.R, f.t, intr, rhos=rhos, thetas=thetas, active=gmap.active,
            tile_size=cfg.tile_size,
            tile_capacity=cfg.tile_capacity, max_dup=cfg.max_dup,
            max_dup_gen=cfg.max_dup_gen, entry_capacity=cfg.entry_capacity,
            backend=cfg.backend, mean2d_dummy=dummy, bins=bins,
            with_n_touched=False, assemble=False,
        )
        losses = jax.vmap(
            functools.partial(get_loss_mapping, init=init,
                              lambda_depth=cfg.lambda_depth)
        )(out.rgb, out.depth, gt_rgb_t, gt_depth_t, gt_mask_t, eas, ebs)
        loss = jnp.sum(losses * valid_f)
        if cfg.isotropic_loss_weight > 0.0:
            scal = scales_fn(params)
            dev = jnp.abs(scal - jnp.mean(scal, axis=1, keepdims=True))
            iso = jnp.sum(
                jnp.where(gmap.active[:, None], dev, 0.0)
            ) / (3.0 * jnp.maximum(jnp.sum(gmap.active), 1))
            loss = loss + cfg.isotropic_loss_weight * iso
        if cfg.exposure_reg > 0.0:
            loss = loss + cfg.exposure_reg * jnp.sum(
                (eas * eas + ebs * ebs) * valid_f
            )
        return loss, out

    z3 = jnp.zeros((Wc, 3))
    dummy = (jnp.zeros((Wc, C)), jnp.zeros((Wc, C)))
    (loss, out), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
    )(gmap.params, z3, z3, f.exposure_a, f.exposure_b, dummy)
    g_params, g_rho, g_theta, g_ea, g_eb, (g_du, g_dv) = grads

    # Densification statistics (slam_mapper.py:453-460): per-keyframe
    # screen-space gradient norms accumulated over visible Gaussians.
    # (Wc, C) channel math — no (Wc, C, 2) lane-wasting stack.
    vis_filter = out.radii > 0                         # (Wc, C)
    norms = jnp.sqrt(
        (g_du * (intr.width * 0.5)) ** 2 + (g_dv * (intr.height * 0.5)) ** 2
    )                                                   # (Wc, C)
    upd = vis_filter & window.valid[:, None] & gmap.active[None, :]
    gmap = gmap._replace(
        xyz_grad_accum=gmap.xyz_grad_accum + jnp.sum(
            jnp.where(upd, norms, 0.0), axis=0
        ),
        denom=gmap.denom + jnp.sum(upd, axis=0).astype(jnp.float32),
        max_radii2d=jnp.maximum(
            gmap.max_radii2d,
            jnp.max(jnp.where(upd, out.radii, 0.0), axis=0),
        ),
    )

    # Gaussian Adam step (masked to active rows).
    def mask_g(g):
        m = gmap.active
        while m.ndim < g.ndim:
            m = m[..., None]
        return jnp.where(m, g, 0.0)

    g_params = {k: mask_g(v) for k, v in g_params.items()}
    new_params, new_adam = adam_step(
        gmap.params, g_params, state.adam, cfg.map_lrs(state.nr_iters)
    )
    gmap = gmap._replace(params=new_params)

    # Keyframe pose Adam + retraction (skipped entirely during init).
    pa = state.pose_adam
    if init:
        new_window = window
        pa_new = pa
    else:
        step = pa.step + 1
        t_f = step.astype(jnp.float32)
        bc1 = 1.0 - 0.9 ** t_f
        bc2 = 1.0 - 0.999 ** t_f

        def upd1(mu, nu, g, lr, opt_mask):
            mu = 0.9 * mu + 0.1 * g
            nu = 0.999 * nu + 0.001 * g * g
            d = -lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + cfg.pose_adam_eps)
            m = opt_mask
            while m.ndim < d.ndim:
                m = m[..., None]
            return mu, nu, jnp.where(m, d, 0.0)

        mu_r, nu_r, d_rho = upd1(pa.mu_rho, pa.nu_rho, g_rho,
                                 cfg.lr_trans, not_frame0)
        mu_t, nu_t, d_theta = upd1(pa.mu_theta, pa.nu_theta, g_theta,
                                   cfg.lr_rot, not_frame0)
        mu_a, nu_a, d_ea = upd1(pa.mu_ea, pa.nu_ea, g_ea,
                                cfg.lr_exposure, not_frame0)
        mu_b, nu_b, d_eb = upd1(pa.mu_eb, pa.nu_eb, g_eb,
                                cfg.lr_exposure, not_frame0)
        pa_new = PoseAdam(mu_r, mu_t, mu_a, mu_b, nu_r, nu_t, nu_a, nu_b, step)

        R_new, t_new = jax.vmap(lie.apply_pose_delta)(f.R, f.t, d_rho, d_theta)
        new_frames = f._replace(
            R=R_new, t=t_new,
            exposure_a=f.exposure_a + d_ea, exposure_b=f.exposure_b + d_eb,
        )
        new_window = Window(frames=new_frames, valid=window.valid)

    new_state = MapperState(
        gmap=gmap, adam=new_adam, window=new_window, pose_adam=pa_new,
        nr_iters=state.nr_iters + 1, rng=state.rng,
    )
    aux = MappingAux(
        loss=loss,
        vis_filter=vis_filter & window.valid[:, None],
        overflow=out.overflow,
        overflow_parts=out.overflow_parts,
    )
    return new_state, aux


@functools.partial(jax.jit, static_argnames=("intr", "cfg", "init"))
def mapping_step(
    state: MapperState, intr: Intrinsics, cfg: MapperConfig, init: bool = False,
    bins=None,
):
    """Single jitted mapping iteration (kept for tests/simple callers)."""
    if bins is None:
        bins = _window_bins_traced(state, intr, cfg)
    gt_tiles = _tile_window_gt(state.window, intr, cfg)
    return _mapping_iter(state, intr, cfg, init, bins, gt_tiles)


# The loop carry holds ONLY what an iteration mutates; the window's
# images (rgb/depth/segmentation/masks, ~50 MB at window 8 / 640x480)
# stay closure constants. Measured perf-neutral on v5e (81.5 vs 80.8
# ms/iter — XLA already forwarded the invariant carry buffers without
# copies), kept for the smaller carry and explicit mutation set.


def _state_to_mut(state: MapperState):
    f = state.window.frames
    return (state.gmap, state.adam, state.pose_adam, state.nr_iters,
            state.rng, f.R, f.t, f.exposure_a, f.exposure_b)


def _mut_to_state(mut, template: MapperState) -> MapperState:
    gmap, adam, pose_adam, nr_iters, rng, R, t, ea, eb = mut
    frames = template.window.frames._replace(
        R=R, t=t, exposure_a=ea, exposure_b=eb
    )
    return template._replace(
        gmap=gmap, adam=adam, pose_adam=pose_adam, nr_iters=nr_iters,
        rng=rng, window=template.window._replace(frames=frames),
    )


def _zero_aux(Wc: int, C: int) -> MappingAux:
    return MappingAux(
        loss=jnp.zeros(()),
        vis_filter=jnp.zeros((Wc, C), bool),
        overflow=jnp.zeros((), jnp.int32),
        overflow_parts=jnp.zeros((4,), jnp.int32),
    )


@functools.partial(
    jax.jit, static_argnames=("intr", "cfg", "init", "n_steps")
)
def mapping_chunk(
    state: MapperState, intr: Intrinsics, cfg: MapperConfig, init: bool,
    n_steps: int,
):
    """n_steps mapping iterations in ONE device program: tile binning once
    at chunk start, then a fori_loop of iterations on frozen bins. Collapses
    per-iteration host dispatch (measured ~50ms/call through the axon
    tunnel) into one launch; the host only intervenes at cadence events.
    Static n_steps — kept for benches/tests; the SLAM drivers use
    mapping_span (dynamic trip counts, one compile covers every gap)."""
    bins = _window_bins_traced(state, intr, cfg)
    # Ground-truth tiling + binning live OUTSIDE the fori body (closure
    # capture, not loop carry): computed once per chunk.
    gt_tiles = _tile_window_gt(state.window, intr, cfg)
    aux0 = _zero_aux(state.window.capacity, state.gmap.capacity)

    def body(i, carry):
        st = _mut_to_state(carry[0], state)
        st, aux = _mapping_iter(st, intr, cfg, init, bins, gt_tiles)
        return _state_to_mut(st), aux

    mut, aux = jax.lax.fori_loop(0, n_steps, body, (_state_to_mut(state), aux0))
    return _mut_to_state(mut, state), aux


@functools.partial(jax.jit, static_argnames=("intr", "cfg", "init"))
def mapping_span(
    state: MapperState, intr: Intrinsics, cfg: MapperConfig, init: bool,
    n_segments, tail_len,
):
    """n_segments * rebin_every + tail_len mapping iterations in ONE device
    program, re-binning every rebin_every iterations (unconditional segment
    structure — a lax.cond-gated rebin measured +22 ms/iter, CLAUDE.md).

    The trip counts are TRACED scalars, so one compiled program covers every
    cadence gap — this removes the round-2 single-step chunk walk (VERDICT
    weak #7: chunk sizes were restricted to {rebin_every, 1} because every
    static n_steps is a separate multi-minute remote compile, and a <8-iter
    gap paid the ~50 ms dispatch floor per iteration, up to 7x per event
    window). A whole inter-event gap is now one dispatch. Callers must keep
    tail_len in [1, rebin_every] (the tail segment always rebins once).

    Convergence early exit (cfg.converged_eps > 0; documented deviation —
    the reference runs fixed iteration counts): the loop breaks once the
    window loss's relative per-iteration improvement stays below
    converged_eps for converged_patience consecutive iterations; the stall
    counter carries across rebin segments (a rebin at a plateau rarely
    unlocks improvement — bins only change under large moves). Entirely
    device-side: no extra host readbacks, and the host cadence schedule is
    untouched.
    """
    gt_tiles = _tile_window_gt(state.window, intr, cfg)
    aux0 = _zero_aux(state.window.capacity, state.gmap.capacity)
    eps = float(cfg.converged_eps)
    patience = jnp.int32(cfg.converged_patience)

    def not_stalled(stall):
        return stall < patience

    def segment(carry, m):
        """Rebin at segment start, then up to m iterations on frozen
        bins. carry = (mut, aux, prev_loss, stall)."""
        mut0, aux_in, prev0, stall0 = carry
        st0 = _mut_to_state(mut0, state)
        bins = _window_bins_traced(st0, intr, cfg)

        def cond(c):
            i, _mut, _aux, _prev, stall = c
            ok = i < m
            if eps > 0.0:
                ok = ok & not_stalled(stall)
            return ok

        def body(c):
            i, mut, _aux, prev, stall = c
            st = _mut_to_state(mut, state)
            st, aux = _mapping_iter(st, intr, cfg, init, bins, gt_tiles)
            rel = (prev - aux.loss) / jnp.maximum(jnp.abs(prev), 1e-12)
            stall = jnp.where(rel < eps, stall + 1, jnp.int32(0))
            return i + 1, _state_to_mut(st), aux, aux.loss, stall

        _, mut, aux, prev, stall = jax.lax.while_loop(
            cond, body, (jnp.int32(0), mut0, aux_in, prev0, stall0)
        )
        return mut, aux, prev, stall

    def outer_cond(c):
        s, _mut, _aux, _prev, stall = c
        ok = s < n_segments
        if eps > 0.0:
            ok = ok & not_stalled(stall)
        return ok

    def outer_body(c):
        s, mut, aux, prev, stall = c
        mut, aux, prev, stall = segment(
            (mut, aux, prev, stall), cfg.rebin_every
        )
        return s + 1, mut, aux, prev, stall

    carry0 = (jnp.int32(0), _state_to_mut(state), aux0,
              jnp.float32(jnp.inf), jnp.int32(0))
    _, mut, aux, prev, stall = jax.lax.while_loop(
        outer_cond, outer_body, carry0
    )
    mut, aux, _, _ = segment((mut, aux, prev, stall), tail_len)
    return _mut_to_state(mut, state), aux


@jax.jit
def window_host_pack(state: MapperState) -> jnp.ndarray:
    """Everything the host bookkeeping reads after a keyframe event, packed
    into ONE f32 buffer (each per-slot slice/readback is a separate
    ~30 ms axon-tunnel roundtrip): [R.ravel (Wc*9), t.ravel (Wc*3),
    exposure_a (Wc), exposure_b (Wc)] — see unpack_window_host."""
    f = state.window.frames
    return jnp.concatenate([
        f.R.reshape(-1), f.t.reshape(-1), f.exposure_a, f.exposure_b
    ])


def unpack_window_host(pack, Wc: int) -> dict:
    """Decode window_host_pack (a single host read)."""
    import numpy as np

    s = np.asarray(pack)
    return {
        "R": s[: Wc * 9].reshape(Wc, 3, 3),
        "t": s[Wc * 9: Wc * 12].reshape(Wc, 3),
        "exposure_a": s[Wc * 12: Wc * 13],
        "exposure_b": s[Wc * 13: Wc * 14],
    }


# ---------------------------------------------------------------------------
# Cadenced topology events (jitted, called by the host driver).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "init_phase"))
def densify_event(state: MapperState, cfg: MapperConfig, init_phase: bool):
    """densify_and_prune cadence call (slam_mapper.py:462-473 /
    initialize_map:223-229)."""
    rng, sub = jax.random.split(state.rng)
    if init_phase:
        th, extent, max_screen = (
            cfg.init_gaussian_th, cfg.init_gaussian_extent, None
        )
    else:
        th, extent, max_screen = (
            cfg.gaussian_th, cfg.gaussian_extent, cfg.size_threshold
        )
    gmap, adam, n_cloned, n_split, n_pruned, n_dropped = gm.densify_and_prune(
        state.gmap, state.adam, sub,
        max_grad=cfg.densify_grad_threshold, min_opacity=th, extent=extent,
        max_screen_size=max_screen, percent_dense=cfg.percent_dense,
        isotropic=cfg.isotropic,
    )
    return (
        state._replace(gmap=gmap, adam=adam, rng=rng),
        (n_cloned, n_split, n_pruned, n_dropped),
    )


@jax.jit
def reset_opacity_event(state: MapperState):
    gmap, adam = gm.reset_opacity(state.gmap, state.adam)
    return state._replace(gmap=gmap, adam=adam)


@jax.jit
def reset_nonvisible_event(state: MapperState, visible: jnp.ndarray):
    gmap, adam = gm.reset_opacity_nonvisible(state.gmap, state.adam, visible)
    return state._replace(gmap=gmap, adam=adam)


@functools.partial(jax.jit, static_argnames=("intr", "cfg"))
def visibility_pass(state: MapperState, intr: Intrinsics, cfg: MapperConfig):
    """No-grad window render for visibility only (the prune=True iteration,
    slam_mapper.py:394-404)."""
    gmap, window = state.gmap, state.window
    f = window.frames
    Wc = window.capacity
    out = render_window(
        gmap.params["xyz"], gm.get_scales(gmap.params, cfg.isotropic),
        gmap.params["quats"], gm.get_opacity(gmap.params),
        gmap.params["rgb"], f.R, f.t, intr,
        rhos=jnp.zeros((Wc, 3)), thetas=jnp.zeros((Wc, 3)),
        active=gmap.active, tile_size=cfg.tile_size,
        tile_capacity=cfg.tile_capacity,
        max_dup=cfg.max_dup, max_dup_gen=cfg.max_dup_gen,
        entry_capacity=cfg.entry_capacity,
        backend=cfg.backend,
    )
    return (out.n_touched > 0) & window.valid[:, None]


@functools.partial(jax.jit, static_argnames=("cfg",))
def covisibility_prune(
    state: MapperState, visibility: jnp.ndarray, kf_idx_floor: jnp.ndarray,
    cfg: MapperConfig,
):
    """Covisibility pruning (slam_mapper.py:408-451): Gaussians created at
    keyframes >= kf_idx_floor (the 3rd-newest window keyframe; or all on the
    first prune) observed <= prune_coviz times are pruned. Returns the new
    state and the prune mask (for host-side visibility-dict bookkeeping —
    identity here, masks stay index-aligned)."""
    gmap = state.gmap
    nr_obs = jnp.sum(visibility.astype(jnp.int32), axis=0)  # (C,)
    gmap = gmap._replace(nr_obs=nr_obs)
    kf_mask = gmap.kf_idx >= kf_idx_floor
    to_prune = (nr_obs <= cfg.prune_coviz) & kf_mask & gmap.active
    gmap, adam = gm.prune_points(gmap, state.adam, to_prune)
    return state._replace(gmap=gmap, adam=adam), to_prune


@functools.partial(jax.jit, static_argnames=("intr", "cfg", "init"))
def extend_event(
    state: MapperState, frame: Frame, kf_idx, intr: Intrinsics,
    cfg: MapperConfig, init: bool,
):
    """add_next_kf (slam_mapper.py:92-166): render the current map from the
    new keyframe (no-grad) for the densification mask, then seed Gaussians."""
    gmap = state.gmap
    if init:
        render_depth = None
        render_opacity = None
    else:
        out = render(
            gmap.params["xyz"], gm.get_scales(gmap.params, cfg.isotropic),
            gmap.params["quats"], gm.get_opacity(gmap.params),
            gmap.params["rgb"], frame.R, frame.t, intr, active=gmap.active,
            tile_capacity=cfg.tile_capacity, max_dup=cfg.max_dup,
            max_dup_gen=cfg.max_dup_gen, entry_capacity=cfg.entry_capacity,
            backend=cfg.backend,
        )
        render_depth, render_opacity = out.depth, out.opacity
    rng, sub = jax.random.split(state.rng)
    res = gm.extend_from_keyframe(
        gmap, state.adam, sub,
        rgb=frame.rgb, depth=frame.depth, segmentation=frame.segmentation,
        R_w2c=frame.R, t_w2c=frame.t, intr=intr, kf_idx=kf_idx,
        exposure_a=frame.exposure_a, exposure_b=frame.exposure_b,
        render_depth=render_depth, render_opacity=render_opacity,
        init=init, isotropic=cfg.isotropic, monocular=cfg.monocular,
        fill_depth_dropout=cfg.fill_depth_dropout,
        downsample_init=cfg.pcd_downsample_init,
        downsample=cfg.pcd_downsample, point_size=cfg.point_size,
        max_new=cfg.max_new_per_kf,
    )
    return (
        state._replace(gmap=res.map, adam=res.adam, rng=rng),
        (res.n_added, res.n_dropped),
    )


def _refine_iter(state: MapperState, frame: Frame, intr: Intrinsics,
                 cfg: MapperConfig, bins=None):
    """One color-refinement iteration (slam_mapper.py:502-548):
    (1-lambda)*L1 + lambda*(1-SSIM) on a random keyframe, Gaussian params
    only. The keyframe's tracked exposure affine is applied to the render
    (the mapping loss optimized map colors in exposure-free space,
    losses.get_loss_mapping; comparing a raw render against the
    exposure-distorted gt would fight that — round-2 VERDICT #9).

    refine_colors_only (default): differentiate rgb/opacity only and
    render at the FAST production caps (quality-equivalent, measured —
    MapperConfig.refine_colors_only note); the geometry backward and the
    slow eval-grade binning exist only for the all-params mode."""
    gmap = state.gmap

    def render_loss(params):
        if cfg.refine_colors_only:
            caps = dict(
                tile_capacity=cfg.tile_capacity, max_dup=cfg.max_dup,
                max_dup_gen=cfg.max_dup_gen,
                entry_capacity=cfg.entry_capacity,
            )
        else:
            # Eval-grade caps (see MapperConfig.refine_* note): refining
            # GEOMETRY against production-cap truncated renders damages
            # the map.
            caps = dict(
                tile_capacity=max(cfg.tile_capacity,
                                  cfg.refine_tile_capacity),
                max_dup=max(cfg.max_dup, cfg.refine_max_dup),
                max_dup_gen=None, entry_capacity=None,
            )
        out = render(
            params["xyz"], gm.get_scales(params, cfg.isotropic),
            params["quats"], gm.get_opacity(params), params["rgb"],
            frame.R, frame.t, intr, active=gmap.active,
            tile_size=cfg.tile_size, backend=cfg.backend, bins=bins,
            **caps,
        )
        rgb = jnp.exp(frame.exposure_a) * out.rgb + frame.exposure_b
        l1 = l1_loss(rgb, frame.rgb)
        s = ssim(rgb, frame.rgb)
        loss = (1.0 - cfg.lambda_ssim) * l1 + cfg.lambda_ssim * (1.0 - s)
        # Surface binning overflow (advisor r3): silent truncated-gradient
        # damage must be observable from the host driver.
        return loss, out.overflow

    if cfg.refine_colors_only:
        OPT = ("rgb", "opacity_logit")

        def loss_fn(opt_params):
            return render_loss({**gmap.params, **opt_params})

        (_, overflow), g_opt = jax.value_and_grad(loss_fn, has_aux=True)(
            {k: gmap.params[k] for k in OPT})
        grads = {k: (g_opt[k] if k in g_opt else jnp.zeros_like(v))
                 for k, v in gmap.params.items()}
    else:
        (_, overflow), grads = jax.value_and_grad(
            render_loss, has_aux=True)(gmap.params)
    active = gmap.active

    def mask_g(g):
        m = active
        while m.ndim < g.ndim:
            m = m[..., None]
        return jnp.where(m, g, 0.0)

    grads = {k: mask_g(v) for k, v in grads.items()}
    lrs = cfg.map_lrs(state.nr_iters)
    if cfg.refine_colors_only:
        # lr 0 (not just zero grads) for frozen leaves: warm Adam momentum
        # from the SLAM loop would otherwise keep moving geometry.
        lrs = {k: (v if k in OPT else 0.0) for k, v in lrs.items()}
    new_params, new_adam = adam_step(gmap.params, grads, state.adam, lrs)
    return state._replace(
        gmap=gmap._replace(params=new_params), adam=new_adam,
        nr_iters=state.nr_iters + 1,
    ), overflow


refine_step = jax.jit(_refine_iter, static_argnames=("intr", "cfg"))


@functools.partial(jax.jit, static_argnames=("intr", "cfg"))
def refine_chunk(state: MapperState, frames, intr: Intrinsics,
                 cfg: MapperConfig):
    """A batch of refinement iterations in one device program (frames is a
    stacked Frame pytree with a leading batch axis); amortizes per-call
    dispatch like mapping_chunk. Returns (state, max overflow over the
    batch) — overflow telemetry mirrors the mapping loop's."""
    B = frames.frame_idx.shape[0]

    def body(i, carry):
        st, ov_max = carry
        frame = jax.tree.map(lambda x: x[i], frames)
        st, ov = _refine_iter(st, frame, intr, cfg)
        return st, jnp.maximum(ov_max, ov)

    return jax.lax.fori_loop(0, B, body, (state, jnp.int32(0)))


@functools.partial(jax.jit, static_argnames=("intr", "cfg"))
def refine_span(state: MapperState, frame: Frame, intr: Intrinsics,
                cfg: MapperConfig, n_iters):
    """n_iters colors-only refinement iterations on ONE keyframe in one
    device program, tile-binning ONCE (colors-only refine freezes
    geometry, so the bins are EXACT for the whole span — unlike the
    mapping loop's deliberately-stale rebin_every reuse; only the
    opacity-based cull drifts, bounded by one span).

    This is the fast refine path: the 578 ms/iter measured on the r4
    flagship recovery decomposed into per-iteration binning (+ per-chunk
    host image staging, fixed in SLAM.refine by a device-resident
    keyframe stack). n_iters is a traced scalar — one compile covers all
    span lengths. Protocol note vs the reference (slam_mapper.py:507):
    the reference samples a random viewpoint EVERY iteration; this path
    samples a random keyframe every span (8 iters) — at 26k iterations
    that is ~3.2k samples over a 40-keyframe run, the same coverage at an
    8x coarser shuffle granularity."""
    from ..ops.binning import tile_bin
    from ..ops.projection import project_gaussians_ch

    gmap = state.gmap
    scales = gm.get_scales(gmap.params, cfg.isotropic)
    opac = gm.get_opacity(gmap.params)
    proj = project_gaussians_ch(
        gmap.params["xyz"], scales, gmap.params["quats"], opac,
        frame.R, frame.t, jnp.zeros(3), jnp.zeros(3), intr,
        active=gmap.active,
    )
    bins = tile_bin(
        None, proj.radius, proj.depth, proj.valid,
        img_w=intr.width, img_h=intr.height, tile_size=cfg.tile_size,
        tile_capacity=cfg.tile_capacity, max_dup=cfg.max_dup,
        entry_capacity=cfg.entry_capacity,
        opacity=jnp.where(proj.valid, proj.opacity, 0.0),
        conic=(proj.ca, proj.cb, proj.cc), uv=(proj.u, proj.v),
        max_dup_gen=cfg.max_dup_gen,
    )

    def body(i, carry):
        st, ov_max = carry
        st, ov = _refine_iter(st, frame, intr, cfg, bins=bins)
        return st, jnp.maximum(ov_max, ov)

    return jax.lax.fori_loop(0, n_iters, body, (state, jnp.int32(0)))


# ---------------------------------------------------------------------------
# Host drivers (cadence logic; python loops over jitted steps).
# ---------------------------------------------------------------------------


def _next_event(cur: int, moduli_offsets) -> int:
    """Smallest it > cur with it % m == o for some (m, o)."""
    best = 1 << 30
    for m, o in moduli_offsets:
        if m <= 0:
            continue
        r = (o - (cur + 1)) % m
        best = min(best, cur + 1 + r)
    return best


def _span_args(n: int, rebin_every: int) -> tuple[int, int]:
    """Decompose n >= 1 iterations into (n_segments, tail) with
    tail in [1, rebin_every] for mapping_span."""
    n_seg = (n - 1) // rebin_every
    return n_seg, n - n_seg * rebin_every


def run_initialize_map(state: MapperState, intr: Intrinsics, cfg: MapperConfig,
                       log=None):
    """initialize_map (slam_mapper.py:169-241): init_itr_num iterations on
    the init keyframe with densify every init_gaussian_update and an opacity
    reset at init_gaussian_reset. Runs device-side spans between cadence
    events — one dispatch per gap; the iteration count is tracked host-side
    (no per-chunk nr_iters readback). Returns (state, visibility (Wc,C))."""
    cur = int(state.nr_iters)
    end = cur + cfg.init_itr_num
    while cur < end:
        # Events fire after iterations where (it-1) % update == 0 or
        # it == init_gaussian_reset.
        stop = min(
            _next_event(cur, [(cfg.init_gaussian_update, 1)]),
            cfg.init_gaussian_reset if cfg.init_gaussian_reset > cur
            else 1 << 30,
            end,
        )
        n_seg, tail = _span_args(stop - cur, cfg.rebin_every)
        state, aux = mapping_span(state, intr, cfg, True, n_seg, tail)
        cur = stop
        if cfg.converged_eps > 0.0:
            # An early-exited span executed fewer iterations than the
            # virtual schedule; pin the device counter to the virtual
            # point so densify/reset cadence and the xyz LR schedule stay
            # aligned across keyframes (ADVICE r4).
            state = state._replace(nr_iters=jnp.asarray(cur, jnp.int32))
        if (cur - 1) % cfg.init_gaussian_update == 0:
            state, _ = densify_event(state, cfg, init_phase=True)
        if cur == cfg.init_gaussian_reset:
            state = reset_opacity_event(state)
    return state, visibility_pass(state, intr, cfg)


def run_optimize_map(
    state: MapperState, intr: Intrinsics, cfg: MapperConfig, iters: int,
    defer_overflow_read: bool = True,
):
    """The iters_per_kf mapping loop with its cadences
    (slam_mapper.py:244-496), run in jitted chunks between cadence events.
    Returns (state, last visibility).

    defer_overflow_read=True batches the overflow-telemetry readback to the
    event end (no mid-event pipeline drains — right for SYNC mode, where
    the mapper owns the device). In ASYNC mode the caller passes False:
    the per-span drain bounds how much mapper work the single device queue
    holds, so tracker dispatches are not stalled behind a whole event's
    spans (measured r5: deferring in async read 0.25 fps vs 0.27 committed
    on the flagship protocol)."""
    cur = int(state.nr_iters)
    end = cur + iters
    span_ovs = []  # deferred (overflow, overflow_parts) device handles
    while cur < end:
        stop = min(
            _next_event(cur, [
                (cfg.gaussian_update_every, cfg.gaussian_update_offset),
                (cfg.gaussian_reset, 0),
            ]),
            end,
        )
        n_seg, tail = _span_args(stop - cur, cfg.rebin_every)
        state, aux = mapping_span(state, intr, cfg, False, n_seg, tail)
        cur = it = stop
        if cfg.converged_eps > 0.0:
            # Early exit runs fewer real iterations than the virtual
            # schedule; keep the device counter on the virtual cadence
            # (densify/reset points, xyz LR decay) across calls (ADVICE r4).
            state = state._replace(nr_iters=jnp.asarray(cur, jnp.int32))
        # Overflow telemetry: deferred (one batched read at event end,
        # same log lines) or per-span (drains the pipeline — the async
        # fairness valve). See the docstring.
        if defer_overflow_read:
            span_ovs.append((aux.overflow, aux.overflow_parts))
        else:
            overflow = int(aux.overflow)
            if overflow > 1000:
                from ..utils.logging import Log

                p = [int(x) for x in aux.overflow_parts]
                Log(f"binning overflow {overflow} entries/iter "
                    f"(gen-width {p[0]} / dup-cap {p[1]} / tile-cap {p[2]} "
                    f"/ slab-cap {p[3]}) — raise max_dup_gen / max_dup / "
                    f"tile_capacity / entry_capacity respectively",
                    tag="Mapper")
        update_gaussian = (
            it % cfg.gaussian_update_every == cfg.gaussian_update_offset
        )
        if update_gaussian:
            state, _ = densify_event(state, cfg, init_phase=False)
        elif it % cfg.gaussian_reset == 0:
            # Reference uses the radii>0 visibility_filter list here
            # (slam_mapper.py:476-479), not the n_touched signal.
            any_visible = jnp.any(aux.vis_filter, axis=0)
            state = reset_nonvisible_event(state, any_visible)
    vis = visibility_pass(state, intr, cfg)
    # One batched readback for the whole event's overflow telemetry (the
    # per-span blocking read this replaces is the log's only consumer).
    if span_ovs:
        import numpy as np

        packed = np.asarray(jnp.concatenate(
            [jnp.concatenate([o[None], p]) for o, p in span_ovs]
        )).reshape(len(span_ovs), 5).astype(np.int64)
        worst = packed[packed[:, 0].argmax()]
        if worst[0] > 1000:
            from ..utils.logging import Log

            Log(f"binning overflow {int(worst[0])} entries/iter "
                f"(gen-width {int(worst[1])} / dup-cap {int(worst[2])} / "
                f"tile-cap {int(worst[3])} / slab-cap {int(worst[4])}) — "
                f"raise max_dup_gen / max_dup / tile_capacity / "
                f"entry_capacity respectively", tag="Mapper")
    # Visibility for the caller's covisibility bookkeeping (the hot loop
    # skips the per-iteration n_touched scatter).
    return state, vis
