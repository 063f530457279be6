"""GaussianMap: the SLAM map as a static-capacity struct-of-arrays pytree.

TPU-native counterpart of the reference `GaussianModel`
(/root/reference/gaussian_splatting/scene/gaussian_model.py:34-892). Design
stance (SURVEY.md §7): one pytree, not an nn.Module — parameters are dict
leaves with a fixed capacity C and an `active` row mask, so every map-topology
operation (extend / clone / split / prune) is a masked write under jit with
*no* optimizer-state tensor surgery (the Adam moments are masked identically,
see models/optim.py). Capacity growth is the only host-side event (grow()).

Conventions matching the reference:
  - rgb stores plain RGB (features_dc with RGB2SH disabled,
    gaussian_model.py:280-284), rendered as precomputed colors
    (gaussian_renderer/__init__.py:134-150);
  - opacity is a logit (sigmoid activation), scales are log (exp activation),
    quats are unnormalized wxyz (gaussian_model.py:59-68);
  - isotropic mode ties the three log-scales to channel 0
    (gaussian_model.py:74,304-305);
  - obj_prob holds per-Gaussian object one-hot/probability vectors (this
    fork's semantic extension, gaussian_model.py:373-382), not optimized;
  - kf_idx / nr_obs bookkeeping for covisibility pruning
    (gaussian_model.py:49-52).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie
from ..ops.graphics import Intrinsics, unproject
from ..ops.knn import knn_mean_sq_dist
from .optim import AdamState, mask_rows

PARAM_KEYS = ("xyz", "rgb", "log_scales", "quats", "opacity_logit")


class GaussianMap(NamedTuple):
    # Learned parameters (dict so the optimizer can tree_map them).
    params: dict
    # Non-learned per-Gaussian state.
    obj_prob: jnp.ndarray       # (C, K)
    kf_idx: jnp.ndarray         # (C,) int32 creating keyframe
    nr_obs: jnp.ndarray         # (C,) int32 observation count
    active: jnp.ndarray         # (C,) bool
    # Densification statistics (reference gaussian_model.py:44-47).
    max_radii2d: jnp.ndarray    # (C,)
    xyz_grad_accum: jnp.ndarray  # (C,)
    denom: jnp.ndarray          # (C,)

    @property
    def capacity(self) -> int:
        return self.active.shape[0]

    @property
    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.active.astype(jnp.int32))


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def init_map(capacity: int, nr_objects: int = 1) -> GaussianMap:
    C = capacity
    params = {
        "xyz": jnp.zeros((C, 3), jnp.float32),
        "rgb": jnp.zeros((C, 3), jnp.float32),
        "log_scales": jnp.full((C, 3), -10.0, jnp.float32),
        "quats": jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (C, 1)),
        "opacity_logit": jnp.full((C,), -10.0, jnp.float32),
    }
    return GaussianMap(
        params=params,
        obj_prob=jnp.zeros((C, nr_objects), jnp.float32),
        kf_idx=jnp.zeros((C,), jnp.int32),
        nr_obs=jnp.zeros((C,), jnp.int32),
        active=jnp.zeros((C,), bool),
        max_radii2d=jnp.zeros((C,), jnp.float32),
        xyz_grad_accum=jnp.zeros((C,), jnp.float32),
        denom=jnp.zeros((C,), jnp.float32),
    )


def get_scales(params: dict, isotropic: bool) -> jnp.ndarray:
    """Activated (C, 3) scales; isotropic ties all axes to channel 0."""
    ls = params["log_scales"]
    if isotropic:
        ls = jnp.broadcast_to(ls[:, 0:1], ls.shape)
    return jnp.exp(ls)


def get_opacity(params: dict) -> jnp.ndarray:
    return jax.nn.sigmoid(params["opacity_logit"])


# ---------------------------------------------------------------------------
# Slot allocation (static-shape replacement for tensor concatenation).
# ---------------------------------------------------------------------------


def _alloc_slots(active: jnp.ndarray, want: jnp.ndarray):
    """For each row i with want[i], assign a distinct free slot index.

    Returns (dest (C,) int32 — free-slot index or C when unassignable,
             ok (C,) bool — want rows that received a slot,
             dropped () int32 — want rows that could not be placed).
    """
    C = active.shape[0]
    free_pos = jnp.argsort(active, stable=True)        # inactive rows first
    n_free = C - jnp.sum(active.astype(jnp.int32))
    want_rank = jnp.cumsum(want.astype(jnp.int32)) - 1  # rank among wanters
    ok = want & (want_rank < n_free)
    dest = jnp.where(ok, free_pos[jnp.clip(want_rank, 0, C - 1)], C)
    dropped = jnp.sum(want.astype(jnp.int32)) - jnp.sum(ok.astype(jnp.int32))
    return dest.astype(jnp.int32), ok, dropped


def _scatter_rows(arr: jnp.ndarray, dest: jnp.ndarray, values: jnp.ndarray):
    """arr[dest[i]] = values[i] for assigned rows (dest==C rows are dropped)."""
    return arr.at[dest].set(values, mode="drop")


# ---------------------------------------------------------------------------
# Extend from keyframe (create_viewpoint_pcd + extend_from_pcd_seq).
# ---------------------------------------------------------------------------


class ExtendResult(NamedTuple):
    map: GaussianMap
    adam: AdamState
    n_added: jnp.ndarray   # () int32
    n_dropped: jnp.ndarray  # () int32 candidates without capacity


def extend_from_keyframe(
    gmap: GaussianMap,
    adam: AdamState,
    rng: jax.Array,
    *,
    rgb: jnp.ndarray,          # (H, W, 3) gt image
    depth: jnp.ndarray,        # (H, W) gt depth (0 invalid)
    segmentation: jnp.ndarray,  # (H, W) int32 object ids
    R_w2c: jnp.ndarray,
    t_w2c: jnp.ndarray,
    intr: Intrinsics,
    kf_idx,
    exposure_a: jnp.ndarray,
    exposure_b: jnp.ndarray,
    render_depth: jnp.ndarray | None = None,    # (H, W) current-map render
    render_opacity: jnp.ndarray | None = None,  # (H, W)
    init: bool = False,
    downsample_init: int = 32,
    downsample: int = 64,
    point_size: float = 0.01,
    max_new: int = 16384,
    isotropic: bool = False,
    monocular: bool = False,
    mono_init_depth: float = 2.0,
    mono_depth_noise: float = 0.3,
    fill_depth_dropout: bool = False,
) -> ExtendResult:
    """Seed new Gaussians from a keyframe (gaussian_model.py:121-392).

    Densification mask (gaussian_model.py:189-223): valid depth AND
    (rendered opacity < 0.5 OR (gt_depth < rendered depth AND
    |err| > 50 * median err)). A random subset of 1/downsample of the masked
    pixels is unprojected; scales init from 3-NN mean distance * point_size.

    Monocular mode (no sensor depth — upstream-MonoGS semantics; this fork's
    depth-free path is broken mid-refactor, camera_utils.py:143-145 would
    multiply None): seed depth is synthesized as a noisy constant at init and
    a noisy rendered-depth median afterwards, with the densification mask
    reduced to the low-opacity condition.

    Static shapes: up to `max_new` candidates are drawn by weighted top-k;
    the number actually activated equals the reference's
    floor(num_masked / downsample) (capped by max_new and free capacity).
    """
    H, W = depth.shape
    if init:
        img = rgb
        factor = downsample_init
    else:
        img = jnp.clip(jnp.exp(exposure_a) * rgb + exposure_b, 0.0, 1.0)
        factor = downsample

    rng, rng_depth = jax.random.split(rng)
    if monocular:
        if init or render_depth is None:
            base = jnp.asarray(mono_init_depth, depth.dtype)
        else:
            med = jnp.nanmedian(
                jnp.where(render_depth > 1e-3, render_depth, jnp.nan)
            )
            base = jnp.nan_to_num(med, nan=mono_init_depth)
        noise = jax.random.normal(rng_depth, depth.shape)
        depth = base * (1.0 + mono_depth_noise * noise)
        depth = jnp.maximum(depth, 0.1 * base)
        valid = jnp.ones((H, W), bool)
        if not init and render_opacity is not None:
            valid = render_opacity < 0.5
    else:
        valid_sensor = depth >= 1e-3
        valid = valid_sensor
        if not init and render_depth is not None:
            opa_mask = render_opacity < 0.5
            err = jnp.abs(depth - render_depth)
            median_err = jnp.nan_to_num(
                jnp.nanmedian(jnp.where(valid, err, jnp.nan)), nan=0.0
            )
            cond = (depth < render_depth) & (err > 50.0 * median_err)
            valid = valid & (opa_mask | cond)
        if fill_depth_dropout:
            # Sensor-depth dropout fill (stereo SGBM holes; VERDICT r4
            # task 4): pixels the matcher failed on never satisfy
            # `depth >= 1e-3`, so whole image regions are never seeded
            # and render black forever (r4 stereo run: 93k splats, PSNR
            # 16.15). Borrow the monocular path's synthesized depth for
            # those pixels — a noisy frame-median prior — and seed them
            # only where the current render is transparent (the same
            # opacity < 0.5 gate the monocular mode uses). Statistics
            # (densify error median, point-size median) stay on sensor
            # pixels. Deviation from the reference, which inherits the
            # hole (dataset.py:606-616 leaves disparity dropouts at 0).
            med = jnp.nanmedian(jnp.where(valid_sensor, depth, jnp.nan))
            med = jnp.nan_to_num(med, nan=mono_init_depth)
            noise = jax.random.normal(rng_depth, depth.shape)
            synth = med * (1.0 + mono_depth_noise * noise)
            synth = jnp.maximum(synth, 0.1 * med)
            depth = jnp.where(valid_sensor, depth, synth)
            hole_ok = ~valid_sensor
            if not init and render_opacity is not None:
                hole_ok = hole_ok & (render_opacity < 0.5)
            valid = valid | hole_ok

    max_new = min(max_new, H * W)
    flat_valid = valid.reshape(-1)
    n_valid = jnp.sum(flat_valid.astype(jnp.int32))
    n_keep = jnp.minimum(n_valid // factor, max_new)

    # Weighted random top-k: valid pixels get score 1+U, invalid U.
    scores = jax.random.uniform(rng, (H * W,)) + flat_valid.astype(jnp.float32)
    _, pick = jax.lax.top_k(scores, max_new)            # (max_new,) pixel ids
    keep = jnp.arange(max_new) < n_keep                 # (max_new,)

    pts_cam = unproject(depth, intr).reshape(-1, 3)[pick]       # (M, 3)
    pts_world = (pts_cam - t_w2c) @ R_w2c                        # c2w
    cols = img.reshape(-1, 3)[pick]
    seg = segmentation.reshape(-1)[pick]

    p_size = jnp.minimum(
        0.05, point_size * jnp.nanmedian(jnp.where(valid, depth, jnp.nan))
    )
    dist2 = jnp.clip(knn_mean_sq_dist(pts_world, mask=keep), 1e-7) * p_size
    log_scale = 0.5 * jnp.log(dist2)                     # log(sqrt(dist2))

    dest, ok, dropped = _alloc_slots(gmap.active, keep)

    new_active = _scatter_rows(gmap.active, dest, ok)
    p = gmap.params
    params = {
        "xyz": _scatter_rows(p["xyz"], dest, pts_world),
        "rgb": _scatter_rows(p["rgb"], dest, cols),
        "log_scales": _scatter_rows(
            p["log_scales"], dest, jnp.tile(log_scale[:, None], (1, 3))
        ),
        "quats": _scatter_rows(
            p["quats"], dest,
            jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (max_new, 1)),
        ),
        "opacity_logit": _scatter_rows(
            p["opacity_logit"], dest,
            jnp.full((max_new,), inverse_sigmoid(0.5), jnp.float32),
        ),
    }
    nr_objects = gmap.obj_prob.shape[1]
    obj_onehot = jax.nn.one_hot(jnp.clip(seg, 0, nr_objects - 1), nr_objects)
    new_map = GaussianMap(
        params=params,
        obj_prob=_scatter_rows(gmap.obj_prob, dest, obj_onehot),
        kf_idx=_scatter_rows(
            gmap.kf_idx, dest, jnp.full((max_new,), kf_idx, jnp.int32)
        ),
        nr_obs=_scatter_rows(gmap.nr_obs, dest, jnp.zeros((max_new,), jnp.int32)),
        active=new_active,
        # densification_postfix resets stats for ALL rows
        # (gaussian_model.py:765-770).
        max_radii2d=jnp.zeros_like(gmap.max_radii2d),
        xyz_grad_accum=jnp.zeros_like(gmap.xyz_grad_accum),
        denom=jnp.zeros_like(gmap.denom),
    )
    changed = new_active != gmap.active
    return ExtendResult(
        map=new_map, adam=mask_rows(adam, changed),
        n_added=jnp.sum(ok.astype(jnp.int32)), n_dropped=dropped,
    )


# ---------------------------------------------------------------------------
# Densify / prune (gaussian_model.py:778-892).
# ---------------------------------------------------------------------------


def prune_points(gmap: GaussianMap, adam: AdamState, prune_mask: jnp.ndarray):
    """Deactivate rows (prune_points, gaussian_model.py:679-700). Moments of
    pruned rows are zeroed so reallocated slots start clean."""
    prune_mask = prune_mask & gmap.active
    new_active = gmap.active & ~prune_mask
    # Also park pruned rows' opacity at -inf-ish so stale rows can't render
    # even if an `active` mask is forgotten somewhere.
    params = dict(gmap.params)
    params["opacity_logit"] = jnp.where(
        prune_mask, -10.0, params["opacity_logit"]
    )
    gmap = gmap._replace(params=params, active=new_active)
    return gmap, mask_rows(adam, prune_mask)


def densify_and_prune(
    gmap: GaussianMap,
    adam: AdamState,
    rng: jax.Array,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float | None,
    percent_dense: float = 0.01,
    isotropic: bool = False,
):
    """Clone + split + prune (gaussian_model.py:871-886). Returns
    (map, adam, n_cloned, n_split, n_pruned, n_dropped)."""
    grads = jnp.where(
        gmap.denom > 0, gmap.xyz_grad_accum / jnp.maximum(gmap.denom, 1.0), 0.0
    )
    scales = get_scales(gmap.params, isotropic)
    max_scale = jnp.max(scales, axis=1)

    # --- clone (densify_and_clone, gaussian_model.py:836-871): small
    # under-reconstructed Gaussians are duplicated into free slots.
    clone_mask = (
        gmap.active & (grads >= max_grad) & (max_scale <= percent_dense * extent)
    )
    dest, ok_c, drop_c = _alloc_slots(gmap.active, clone_mask)
    params = {
        k: _scatter_rows(v, dest, v) for k, v in gmap.params.items()
    }
    active = _scatter_rows(gmap.active, dest, ok_c)
    obj_prob = _scatter_rows(gmap.obj_prob, dest, gmap.obj_prob)
    kf_idx = _scatter_rows(gmap.kf_idx, dest, gmap.kf_idx)
    nr_obs = _scatter_rows(gmap.nr_obs, dest, gmap.nr_obs)
    new_rows = active != gmap.active
    adam = mask_rows(adam, new_rows)

    # --- split (densify_and_split, gaussian_model.py:778-836): large
    # over-reconstructed Gaussians are replaced by N=2 samples at scale/1.6.
    # Sample 1 overwrites the original row; sample 2 goes to a free slot.
    # Cloned rows can't split in the same round (their grad stats are fresh,
    # matching the reference's zero-padded grads at 781-783).
    split_mask = (
        gmap.active & (grads >= max_grad) & (max_scale > percent_dense * extent)
    )
    C = gmap.active.shape[0]
    R = lie.quat_to_rotmat(params["quats"])              # (C,3,3)
    eps1, eps2 = jax.random.normal(rng, (2, C, 3))
    s1 = params["xyz"] + jnp.einsum("nij,nj->ni", R, eps1 * scales)
    s2 = params["xyz"] + jnp.einsum("nij,nj->ni", R, eps2 * scales)
    new_log_scales = params["log_scales"] - jnp.log(1.6)  # scale / (0.8 * N)

    dest2, ok_s, drop_s = _alloc_slots(active, split_mask)
    # In-place replacement for sample 1 (only when the sibling found a slot).
    repl = split_mask & ok_s
    params["xyz"] = jnp.where(repl[:, None], s1, params["xyz"])
    params["log_scales"] = jnp.where(
        repl[:, None], new_log_scales, params["log_scales"]
    )
    # Sibling rows (sample 2).
    params = {
        k: _scatter_rows(
            v,
            dest2,
            {
                "xyz": s2,
                "log_scales": new_log_scales,
            }.get(k, v),
        )
        for k, v in params.items()
    }
    active2 = _scatter_rows(active, dest2, ok_s)
    obj_prob = _scatter_rows(obj_prob, dest2, obj_prob)
    kf_idx = _scatter_rows(kf_idx, dest2, kf_idx)
    nr_obs = _scatter_rows(nr_obs, dest2, nr_obs)
    changed = repl | (active2 != active)
    adam = mask_rows(adam, changed)
    active = active2

    # Screen-radius accumulator for the size prune below: rows rewritten by
    # clone/split restart at 0; surviving rows KEEP their accumulated
    # max radius. DELIBERATE deviation from the reference: its
    # densification_postfix zeroes max_radii_2d (gaussian_model.py:771)
    # before densify_and_prune reads it (:881), so `size_threshold` — a
    # documented config key — can never fire there. The reference's CUDA
    # binning has no per-Gaussian duplicate cap, so dead size-pruning only
    # costs it speed; this rebuild's static-shape binning caps duplicates
    # (max_dup), and un-pruned wide splats starve whole tiles of binning
    # entries (measured: dup-cap drops grew to 80k entries/iter on the
    # persistent-map room run). The accumulate-then-prune order matches
    # upstream-3DGS train.py semantics, which this key was copied from.
    radii_carried = jnp.where(new_rows | changed, 0.0, gmap.max_radii2d)

    gmap = GaussianMap(
        params=params, obj_prob=obj_prob, kf_idx=kf_idx, nr_obs=nr_obs,
        active=active,
        max_radii2d=radii_carried,
        xyz_grad_accum=jnp.zeros_like(gmap.xyz_grad_accum),
        denom=jnp.zeros_like(gmap.denom),
    )

    # --- prune (gaussian_model.py:878-886).
    prune_mask = get_opacity(gmap.params) < min_opacity
    if max_screen_size is not None:
        big_vs = gmap.max_radii2d > max_screen_size
        big_ws = jnp.max(get_scales(gmap.params, isotropic), axis=1) > 0.1 * extent
        prune_mask = prune_mask | big_vs | big_ws
    n_pruned = jnp.sum((prune_mask & gmap.active).astype(jnp.int32))
    gmap, adam = prune_points(gmap, adam, prune_mask)
    # Accumulation window restarts after the event (reference postfix).
    gmap = gmap._replace(max_radii2d=jnp.zeros_like(gmap.max_radii2d))

    return (
        gmap, adam,
        jnp.sum(ok_c.astype(jnp.int32)), jnp.sum(ok_s.astype(jnp.int32)),
        n_pruned, drop_c + drop_s,
    )


def add_densification_stats(
    gmap: GaussianMap, mean2d_grad_px: jnp.ndarray, update_filter: jnp.ndarray,
    img_w: int, img_h: int,
) -> GaussianMap:
    """Accumulate screen-space gradient norms (gaussian_model.py:888-892).

    mean2d_grad_px is dL/dmean2d in *pixel* units (from the mean2d_dummy
    hook); converted to the CUDA rasterizer's NDC units (x grad * W/2) so the
    densify_grad_threshold config value (0.0002) keeps its meaning.
    """
    g = mean2d_grad_px * jnp.array([[img_w * 0.5, img_h * 0.5]])
    norm = jnp.linalg.norm(g, axis=-1)
    upd = update_filter & gmap.active
    return gmap._replace(
        xyz_grad_accum=gmap.xyz_grad_accum + jnp.where(upd, norm, 0.0),
        denom=gmap.denom + upd.astype(jnp.float32),
    )


def update_max_radii(
    gmap: GaussianMap, radii: jnp.ndarray, visibility: jnp.ndarray
) -> GaussianMap:
    """max_radii_2d tracking (reference slam_mapper.py:453-460)."""
    return gmap._replace(
        max_radii2d=jnp.where(
            visibility & gmap.active,
            jnp.maximum(gmap.max_radii2d, radii), gmap.max_radii2d,
        )
    )


def reset_opacity(gmap: GaussianMap, adam: AdamState):
    """All opacities -> 0.01 (gaussian_model.py:522-526); opacity moments
    zeroed (replace_tensor_to_optimizer policy)."""
    params = dict(gmap.params)
    params["opacity_logit"] = jnp.full_like(
        params["opacity_logit"], inverse_sigmoid(0.01)
    )
    from .optim import zero_leaf

    return gmap._replace(params=params), zero_leaf(adam, "opacity_logit")


def reset_opacity_nonvisible(
    gmap: GaussianMap, adam: AdamState, visible: jnp.ndarray
):
    """Non-visible opacities -> 0.4 (gaussian_model.py:527-535)."""
    params = dict(gmap.params)
    params["opacity_logit"] = jnp.where(
        visible | ~gmap.active,
        params["opacity_logit"],
        inverse_sigmoid(0.4),
    )
    from .optim import zero_leaf

    return gmap._replace(params=params), zero_leaf(adam, "opacity_logit")


def increment_nr_obs(gmap: GaussianMap, observed: jnp.ndarray) -> GaussianMap:
    return gmap._replace(
        nr_obs=gmap.nr_obs + (observed & gmap.active).astype(jnp.int32)
    )


# ---------------------------------------------------------------------------
# Capacity growth (host-side; the only re-jit event).
# ---------------------------------------------------------------------------


def grow(gmap: GaussianMap, adam: AdamState, new_capacity: int):
    """Pad every row-array to a larger capacity bucket."""
    C = gmap.capacity
    assert new_capacity >= C
    pad = new_capacity - C

    def pad_rows(x):
        if x.ndim == 0:
            return x
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    fresh = init_map(new_capacity, gmap.obj_prob.shape[1])

    def merge(old, template):
        return jax.lax.dynamic_update_slice_in_dim(template, old, 0, axis=0)

    params = {k: merge(gmap.params[k], fresh.params[k]) for k in gmap.params}
    new_map = GaussianMap(
        params=params,
        obj_prob=merge(gmap.obj_prob, fresh.obj_prob),
        kf_idx=pad_rows(gmap.kf_idx),
        nr_obs=pad_rows(gmap.nr_obs),
        active=pad_rows(gmap.active),
        max_radii2d=pad_rows(gmap.max_radii2d),
        xyz_grad_accum=pad_rows(gmap.xyz_grad_accum),
        denom=pad_rows(gmap.denom),
    )
    new_adam = AdamState(
        mu=jax.tree.map(pad_rows, adam.mu),
        nu=jax.tree.map(pad_rows, adam.nu),
        step=adam.step,
    )
    return new_map, new_adam
