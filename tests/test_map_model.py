"""GaussianMap topology operations: extend / clone / split / prune under
static capacity with masked Adam state."""

import jax
import jax.numpy as jnp
import numpy as np

from monogs_tpu.models import gaussian_map as gm
from monogs_tpu.models.optim import adam_step, init_adam
from monogs_tpu.ops.graphics import Intrinsics
from monogs_tpu.ops.knn import knn_mean_sq_dist

CAP = 256


def _seeded_map(n_active=32, seed=0):
    gmap = gm.init_map(CAP, nr_objects=2)
    key = jax.random.PRNGKey(seed)
    xyz = jax.random.normal(key, (CAP, 3))
    params = dict(gmap.params)
    params["xyz"] = xyz
    params["opacity_logit"] = jnp.zeros((CAP,))
    params["log_scales"] = jnp.full((CAP, 3), -3.0)
    active = jnp.arange(CAP) < n_active
    gmap = gmap._replace(params=params, active=active)
    return gmap, init_adam(params)


def test_knn_matches_bruteforce():
    pts = jax.random.normal(jax.random.PRNGKey(0), (50, 3))
    d = knn_mean_sq_dist(pts, k=3, block=16)
    D = np.array(
        jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    )
    np.fill_diagonal(D, np.inf)
    expected = np.sort(D, axis=1)[:, :3].mean(axis=1)
    np.testing.assert_allclose(d, expected, rtol=1e-4)


def test_extend_allocates_free_slots():
    gmap, adam = _seeded_map(n_active=8)
    H, W = 24, 32
    intr = Intrinsics(30.0, 30.0, W / 2, H / 2, W, H)
    depth = jnp.full((H, W), 2.0)
    rgb = jnp.ones((H, W, 3)) * 0.5
    res = gm.extend_from_keyframe(
        gmap, adam, jax.random.PRNGKey(1),
        rgb=rgb, depth=depth, segmentation=jnp.zeros((H, W), jnp.int32),
        R_w2c=jnp.eye(3), t_w2c=jnp.zeros(3), intr=intr, kf_idx=3,
        exposure_a=jnp.zeros(()), exposure_b=jnp.zeros(()),
        init=True, downsample_init=8, max_new=64,
    )
    n_added = int(res.n_added)
    assert n_added == min((H * W) // 8, 64)  # floor(valid/downsample) ^ max_new
    assert int(res.map.num_active) == 8 + n_added
    # new rows tagged with the keyframe id
    new_rows = np.asarray(res.map.active) & ~np.asarray(gmap.active)
    assert np.all(np.asarray(res.map.kf_idx)[new_rows] == 3)
    # unprojection places points at depth 2 in front of the camera
    new_xyz = np.asarray(res.map.params["xyz"])[new_rows]
    np.testing.assert_allclose(new_xyz[:, 2], 2.0, atol=1e-5)


def test_extend_fills_depth_dropout():
    """Stereo SGBM holes (depth == 0) are seeded with synthesized depth
    when fill_depth_dropout is on, and skipped when off (reference
    behavior: dataset.py:606-616 leaves dropouts at 0, never seeded)."""
    H, W = 24, 32
    intr = Intrinsics(30.0, 30.0, W / 2, H / 2, W, H)
    depth = jnp.full((H, W), 2.0)
    # a dropout hole over the left half of the image
    depth = depth.at[:, : W // 2].set(0.0)
    common = dict(
        rgb=jnp.ones((H, W, 3)) * 0.5, depth=depth,
        segmentation=jnp.zeros((H, W), jnp.int32),
        R_w2c=jnp.eye(3), t_w2c=jnp.zeros(3), intr=intr, kf_idx=0,
        exposure_a=jnp.zeros(()), exposure_b=jnp.zeros(()),
        init=True, downsample_init=4, max_new=512,
    )
    gmap, adam = _seeded_map(n_active=0)
    off = gm.extend_from_keyframe(
        gmap, adam, jax.random.PRNGKey(1), **common)
    on = gm.extend_from_keyframe(
        gmap, adam, jax.random.PRNGKey(1), **common, fill_depth_dropout=True)
    # off: only the valid half seeds; on: the whole frame seeds
    assert int(off.n_added) == (H * W // 2) // 4
    assert int(on.n_added) == (H * W) // 4
    # hole seeds sit at the synthesized noisy-median depth, not at 0
    rows = np.asarray(on.map.active)
    xyz = np.asarray(on.map.params["xyz"])[rows]
    left = xyz[xyz[:, 0] < -1e-6]          # unprojected from u < cx
    assert left.shape[0] > 0
    assert np.all(left[:, 2] > 0.2)        # >= 0.1 * median(2.0)
    assert abs(np.median(left[:, 2]) - 2.0) < 0.5


def test_extend_respects_capacity():
    gmap, adam = _seeded_map(n_active=CAP - 4)
    H, W = 24, 32
    intr = Intrinsics(30.0, 30.0, W / 2, H / 2, W, H)
    res = gm.extend_from_keyframe(
        gmap, adam, jax.random.PRNGKey(1),
        rgb=jnp.ones((H, W, 3)), depth=jnp.full((H, W), 2.0),
        segmentation=jnp.zeros((H, W), jnp.int32),
        R_w2c=jnp.eye(3), t_w2c=jnp.zeros(3), intr=intr, kf_idx=1,
        exposure_a=jnp.zeros(()), exposure_b=jnp.zeros(()),
        init=True, downsample_init=8, max_new=64,
    )
    assert int(res.map.num_active) == CAP
    assert int(res.n_dropped) > 0


def test_prune_zeroes_moments():
    gmap, adam = _seeded_map(n_active=16)
    grads = {k: jnp.ones_like(v) for k, v in gmap.params.items()}
    _, adam = adam_step(gmap.params, grads, adam, {k: 0.01 for k in grads})
    prune_mask = jnp.arange(CAP) < 4
    gmap2, adam2 = gm.prune_points(gmap, adam, prune_mask)
    assert int(gmap2.num_active) == 12
    assert float(jnp.sum(jnp.abs(adam2.mu["xyz"][:4]))) == 0.0
    assert float(jnp.sum(jnp.abs(adam2.mu["xyz"][4:16]))) > 0.0


def test_densify_clone_and_split():
    gmap, adam = _seeded_map(n_active=16)
    # Small scales for rows 0-7 (clone candidates), big for 8-15 (split).
    ls = gmap.params["log_scales"]
    ls = ls.at[:8].set(-6.0).at[8:16].set(1.0)
    params = dict(gmap.params)
    params["log_scales"] = ls
    gmap = gmap._replace(
        params=params,
        xyz_grad_accum=jnp.where(jnp.arange(CAP) < 16, 10.0, 0.0),
        denom=jnp.where(jnp.arange(CAP) < 16, 1.0, 0.0),
    )
    gmap2, adam2, n_cloned, n_split, n_pruned, n_dropped = gm.densify_and_prune(
        gmap, adam, jax.random.PRNGKey(0),
        max_grad=1.0, min_opacity=0.005, extent=1.0, max_screen_size=None,
    )
    assert int(n_cloned) == 8
    assert int(n_split) == 8
    assert int(n_dropped) == 0
    # split halves (per reference /1.6) the log scale of replaced rows
    np.testing.assert_allclose(
        np.asarray(gmap2.params["log_scales"][8:16]),
        1.0 - np.log(1.6), atol=1e-5,
    )
    # 16 original + 8 clones + 8 split-siblings
    assert int(gmap2.num_active) == 32 - int(n_pruned)


def test_opacity_resets():
    gmap, adam = _seeded_map(n_active=16)
    gmap2, _ = gm.reset_opacity(gmap, adam)
    np.testing.assert_allclose(
        jax.nn.sigmoid(gmap2.params["opacity_logit"][:16]), 0.01, rtol=1e-5
    )
    visible = jnp.arange(CAP) < 8
    gmap3, _ = gm.reset_opacity_nonvisible(gmap, adam, visible)
    op = jax.nn.sigmoid(gmap3.params["opacity_logit"])
    np.testing.assert_allclose(op[:8], 0.5, rtol=1e-5)      # visible kept
    np.testing.assert_allclose(op[8:16], 0.4, rtol=1e-5)    # reset


def test_grow_preserves_rows():
    gmap, adam = _seeded_map(n_active=16)
    gmap2, adam2 = gm.grow(gmap, adam, CAP * 2)
    assert gmap2.capacity == CAP * 2
    assert int(gmap2.num_active) == 16
    np.testing.assert_array_equal(
        gmap2.params["xyz"][:CAP], gmap.params["xyz"]
    )
