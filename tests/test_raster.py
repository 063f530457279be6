"""Rasterizer correctness: oracle vs brute force, Pallas vs oracle, gradients
vs finite differences (SURVEY.md §4 test-strategy implication)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monogs_tpu.ops import lie
from monogs_tpu.ops.binning import tile_bin
from monogs_tpu.ops.graphics import Intrinsics
from monogs_tpu.ops.projection import ALPHA_EPS, project_gaussians
from monogs_tpu.ops.render import render
from monogs_tpu.ops.tile_raster import (
    ALPHA_MAX,
    composite_tiles_ref,
    make_raster_config,
)

W, H = 64, 48
TILE = 16
CAP = 256  # tile capacity (one CHUNK)


def _intr():
    return Intrinsics(fx=60.0, fy=60.0, cx=W / 2, cy=H / 2, width=W, height=H)


def _scene(n=40, seed=0, spread=0.5):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    means = jnp.concatenate(
        [
            jax.random.uniform(ks[0], (n, 2), minval=-spread, maxval=spread),
            jax.random.uniform(ks[1], (n, 1), minval=1.0, maxval=3.0),
        ],
        axis=1,
    )
    scales = jnp.exp(jax.random.uniform(ks[2], (n, 3), minval=-3.5, maxval=-2.5))
    quats = jax.random.normal(ks[3], (n, 4)) + jnp.array([2.0, 0, 0, 0])
    opac = jax.nn.sigmoid(jax.random.normal(ks[4], (n,)))
    rgb = jax.random.uniform(ks[5], (n, 3))
    return means, scales, quats, opac, rgb


def _pose():
    return jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32)


def _brute_force(means, scales, quats, opac, rgb, R, t, intr):
    """Independent per-pixel renderer with the same box-cull as binning."""
    proj = project_gaussians(
        means, scales, quats, opac, rgb, R, t,
        jnp.zeros(3), jnp.zeros(3), intr,
    )
    mean2d = np.asarray(proj.mean2d)
    conic = np.asarray(proj.conic)
    depth = np.asarray(proj.depth)
    radius = np.asarray(proj.radius)
    valid = np.asarray(proj.valid)
    opacity = np.where(valid, np.asarray(proj.opacity), 0.0)
    colors = np.asarray(proj.rgb)

    order = np.argsort(depth, kind="stable")
    img = np.zeros((H, W, 3))
    dep = np.zeros((H, W))
    acc = np.zeros((H, W))
    for py in range(H):
        for px in range(W):
            x, y = px + 0.5, py + 0.5
            T = 1.0
            for i in order:
                if not valid[i]:
                    continue
                # binning box cull at tile granularity
                tx, ty = px // TILE, py // TILE
                x0 = np.clip(np.floor((mean2d[i, 0] - radius[i]) / TILE), 0, None)
                x1 = np.ceil((mean2d[i, 0] + radius[i] + 1) / TILE)
                y0 = np.clip(np.floor((mean2d[i, 1] - radius[i]) / TILE), 0, None)
                y1 = np.ceil((mean2d[i, 1] + radius[i] + 1) / TILE)
                if not (x0 <= tx < x1 and y0 <= ty < y1):
                    continue
                dx, dy = x - mean2d[i, 0], y - mean2d[i, 1]
                a, b, c = conic[i]
                power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                if power > 0:
                    continue
                alpha = opacity[i] * np.exp(power)
                if alpha < ALPHA_EPS:
                    continue
                alpha = min(alpha, ALPHA_MAX)
                w = alpha * T
                img[py, px] += w * colors[i]
                dep[py, px] += w * depth[i]
                acc[py, px] += w
                T *= 1.0 - alpha
    return img, dep, acc


@functools.lru_cache(maxsize=1)
def _rendered():
    intr = _intr()
    means, scales, quats, opac, rgb = _scene()
    R, t = _pose()
    out = render(
        means, scales, quats, opac, rgb, R, t, intr,
        tile_capacity=CAP, backend="ref",
    )
    bf = _brute_force(means, scales, quats, opac, rgb, R, t, intr)
    return out, bf


def test_tiled_matches_brute_force():
    out, (img, dep, acc) = _rendered()
    assert float(out.overflow) == 0
    np.testing.assert_allclose(out.rgb, img, atol=2e-5)
    np.testing.assert_allclose(out.depth, dep, atol=1e-4)
    np.testing.assert_allclose(out.opacity, acc, atol=2e-5)


def test_image_nontrivial():
    out, _ = _rendered()
    assert float(jnp.max(out.opacity)) > 0.3
    assert int(jnp.sum(out.n_touched > 0)) > 10


def test_tile_image_roundtrip():
    """tile_image is _assemble_image's exact inverse (incl. non-tile-multiple
    sizes via zero padding)."""
    from monogs_tpu.ops.render import _assemble_image, tile_image
    from monogs_tpu.ops.tile_raster import make_raster_config

    for (h, w, ts) in [(48, 64, 16), (30, 50, 16), (48, 64, 32)]:
        cfg = make_raster_config(w, h, ts)
        img = jax.random.uniform(jax.random.PRNGKey(0), (h, w, 3))
        tiles = tile_image(img, cfg)
        assert tiles.shape == (cfg.num_tiles, cfg.pixels, 3)
        np.testing.assert_array_equal(_assemble_image(tiles, cfg), img)
        # 2-D (depth/mask) variant
        dep = jax.random.uniform(jax.random.PRNGKey(1), (h, w))
        np.testing.assert_array_equal(
            _assemble_image(tile_image(dep, cfg)[..., None], cfg)[..., 0], dep
        )


def test_tile_space_mapping_loss_matches_image_space():
    """get_loss_mapping on tile-layout render+GT (padding masked) equals the
    image-space value — the mapping hot loop's loss path."""
    from monogs_tpu.ops.losses import get_loss_mapping
    from monogs_tpu.ops.render import tile_image
    from monogs_tpu.ops.tile_raster import make_raster_config

    h, w, ts = 30, 50, 16  # deliberately NOT tile-multiples
    cfg = make_raster_config(w, h, ts)
    k = jax.random.split(jax.random.PRNGKey(2), 5)
    r_rgb = jax.random.uniform(k[0], (h, w, 3))
    r_dep = jax.random.uniform(k[1], (h, w), minval=0.5, maxval=3.0)
    g_rgb = jax.random.uniform(k[2], (h, w, 3))
    g_dep = jnp.where(jax.random.uniform(k[3], (h, w)) > 0.2,
                      jax.random.uniform(k[3], (h, w), minval=0.5), 0.0)
    mask = jax.random.uniform(k[4], (h, w)) > 0.3
    ea, eb = jnp.asarray(0.1), jnp.asarray(-0.05)

    ref = get_loss_mapping(r_rgb, r_dep, g_rgb, g_dep, mask, ea, eb)
    t = lambda x: tile_image(x, cfg)
    pad_valid = t(jnp.ones((h, w), bool))
    got = get_loss_mapping(t(r_rgb), t(r_dep), t(g_rgb), t(g_dep),
                           t(mask) & pad_valid, ea, eb)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_tile_space_tracking_loss_matches_image_space():
    """get_loss_tracking on tile-layout render+GT (padding masked, explicit
    rgb_npix) equals the image-space value — the tracking hot loop's path."""
    from monogs_tpu.ops.losses import get_loss_tracking
    from monogs_tpu.ops.render import tile_image
    from monogs_tpu.ops.tile_raster import make_raster_config

    h, w, ts = 30, 50, 16  # deliberately NOT tile-multiples
    cfg = make_raster_config(w, h, ts)
    k = jax.random.split(jax.random.PRNGKey(7), 7)
    r_rgb = jax.random.uniform(k[0], (h, w, 3))
    r_dep = jax.random.uniform(k[1], (h, w), minval=0.5, maxval=3.0)
    r_opa = jax.random.uniform(k[2], (h, w))
    g_rgb = jax.random.uniform(k[3], (h, w, 3))
    g_dep = jnp.where(jax.random.uniform(k[4], (h, w)) > 0.2,
                      jax.random.uniform(k[4], (h, w), minval=0.5), 0.0)
    mask = jax.random.uniform(k[5], (h, w)) > 0.3
    gmask = jax.random.uniform(k[6], (h, w)) > 0.4
    ea, eb = jnp.asarray(0.1), jnp.asarray(-0.05)

    ref = get_loss_tracking(r_rgb, r_dep, r_opa, g_rgb, g_dep, mask, gmask,
                            ea, eb, opacity_threshold=0.5)
    t = lambda x: tile_image(x, cfg)
    pad_valid = t(jnp.ones((h, w), bool))
    got = get_loss_tracking(t(r_rgb), t(r_dep), t(r_opa), t(g_rgb), t(g_dep),
                            t(mask) & pad_valid, t(gmask) & pad_valid,
                            ea, eb, opacity_threshold=0.5, rgb_npix=h * w)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_pallas_without_n_touched_matches():
    """with_n_touched=False (hot-loop kernel variant): identical images,
    zero n_touched."""
    intr = _intr()
    means, scales, quats, opac, rgb = _scene(seed=1)
    R, t = _pose()
    o_full = render(means, scales, quats, opac, rgb, R, t, intr,
                    tile_capacity=CAP, backend="pallas")
    o_nt = render(means, scales, quats, opac, rgb, R, t, intr,
                  tile_capacity=CAP, backend="pallas", with_n_touched=False)
    np.testing.assert_array_equal(o_nt.rgb, o_full.rgb)
    np.testing.assert_array_equal(o_nt.depth, o_full.depth)
    np.testing.assert_array_equal(o_nt.opacity, o_full.opacity)
    assert int(jnp.sum(o_nt.n_touched)) == 0


def test_pallas_interpret_matches_ref():
    intr = _intr()
    means, scales, quats, opac, rgb = _scene(seed=1)
    R, t = _pose()
    o_ref = render(means, scales, quats, opac, rgb, R, t, intr,
                   tile_capacity=CAP, backend="ref")
    o_pal = render(means, scales, quats, opac, rgb, R, t, intr,
                   tile_capacity=CAP, backend="pallas")
    np.testing.assert_allclose(o_pal.rgb, o_ref.rgb, atol=1e-5)
    np.testing.assert_allclose(o_pal.depth, o_ref.depth, atol=1e-4)
    np.testing.assert_allclose(o_pal.opacity, o_ref.opacity, atol=1e-5)
    np.testing.assert_array_equal(o_pal.n_touched, o_ref.n_touched)


def _loss_fn(backend, freeze_bins=False):
    intr = _intr()
    # Keep Gaussians strictly interior when bins are frozen, so no
    # culling-mask step function fires inside the FD stencil.
    means, scales, quats, opac, rgb = _scene(
        seed=2, spread=0.25 if freeze_bins else 0.5
    )
    R, t = _pose()
    target = jnp.zeros((H, W, 3))

    fixed_bins = None
    if freeze_bins:
        # Binning (tile assignment / culling / sort) is intentionally
        # non-differentiable (stop_gradient, same as the CUDA rasterizer);
        # freezing it at the base point makes the loss smooth so finite
        # differences measure the same function autodiff does.
        from monogs_tpu.ops.projection import project_gaussians as _pg

        proj0 = _pg(means, scales, quats, opac, rgb, R, t,
                    jnp.zeros(3), jnp.zeros(3), intr)
        fixed_bins = tile_bin(
            proj0.mean2d, proj0.radius, proj0.depth, proj0.valid,
            img_w=W, img_h=H, tile_size=TILE, tile_capacity=CAP,
        )

    def loss(means, scales, quats, opac, rgb, rho, theta):
        out = render(
            means, scales, quats, opac, rgb, R, t, intr,
            rho=rho, theta=theta, tile_capacity=CAP, backend=backend,
            bins=fixed_bins,
        )
        return (
            jnp.mean((out.rgb - target) ** 2)
            + 0.1 * jnp.mean(out.depth)
            + 0.05 * jnp.mean(out.opacity)
        )

    args = (means, scales, quats, opac, rgb, jnp.zeros(3), jnp.zeros(3))
    return loss, args


def test_pallas_gradients_match_ref_gradients():
    loss_r, args = _loss_fn("ref")
    loss_p, _ = _loss_fn("pallas")
    g_ref = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(loss_p, argnums=tuple(range(7)))(*args)
    names = ["means", "scales", "quats", "opac", "rgb", "rho", "theta"]
    for n, gr, gp in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(gp, gr, rtol=2e-3, atol=1e-6, err_msg=n)


@pytest.mark.parametrize("argnum,name", [(5, "rho"), (6, "theta"), (0, "means")])
def test_gradients_finite_difference(argnum, name):
    """Float64 central differences against autodiff, with binning frozen
    (binning is non-differentiable by design, like the CUDA rasterizer)."""
    with jax.enable_x64(True):
        loss, args = _loss_fn("ref", freeze_bins=True)
        args = tuple(jnp.asarray(a, jnp.float64) for a in args)
        g = jax.grad(loss, argnums=argnum)(*args)
        x0 = args[argnum]
        rng = np.random.RandomState(0)
        flat = np.asarray(x0).reshape(-1)
        idxs = rng.choice(flat.size, size=min(6, flat.size), replace=False)
        eps = 1e-6
        for i in idxs:
            e = jnp.zeros_like(x0).reshape(-1).at[i].set(eps).reshape(x0.shape)
            lp = loss(*args[:argnum], x0 + e, *args[argnum + 1:])
            lm = loss(*args[:argnum], x0 - e, *args[argnum + 1:])
            fd = (lp - lm) / (2 * eps)
            gi = np.asarray(g).reshape(-1)[i]
            np.testing.assert_allclose(gi, fd, rtol=1e-4, atol=1e-8,
                                       err_msg=f"{name}[{i}]")


def test_pose_gradient_direction():
    """Moving the camera toward a known-better pose must reduce the loss."""
    intr = _intr()
    means, scales, quats, opac, rgb = _scene(seed=3)
    R_gt, t_gt = _pose()
    target = render(means, scales, quats, opac, rgb, R_gt, t_gt, intr,
                    tile_capacity=CAP, backend="ref").rgb
    # Perturbed start pose.
    R0, t0 = lie.apply_pose_delta(
        R_gt, t_gt, jnp.array([0.02, -0.01, 0.015]), jnp.array([0.01, 0.005, -0.01])
    )

    def loss(delta):
        out = render(
            means, scales, quats, opac, rgb, R0, t0, intr,
            rho=delta[:3], theta=delta[3:], tile_capacity=CAP, backend="ref",
        )
        return jnp.mean(jnp.abs(out.rgb - target))

    d0 = jnp.zeros(6)
    l0 = loss(d0)
    g = jax.grad(loss)(d0)
    assert float(jnp.linalg.norm(g)) > 0
    l1 = loss(d0 - 1e-2 * g / jnp.linalg.norm(g))
    assert float(l1) < float(l0)


def test_binning_overflow_reported():
    intr = _intr()
    means, scales, quats, opac, rgb = _scene(n=40)
    # Giant gaussians covering many tiles with tiny max_dup -> overflow.
    proj = project_gaussians(
        means, jnp.exp(jnp.zeros((40, 3))), quats, opac, rgb,
        jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), _intr(),
    )
    bins = tile_bin(
        proj.mean2d, proj.radius, proj.depth, proj.valid,
        img_w=W, img_h=H, tile_size=TILE, tile_capacity=CAP, max_dup=2,
    )
    assert int(bins.overflow) > 0
    # The decomposition sums to the total and attributes these drops to the
    # duplicate-generation width (max_dup_gen defaults to max_dup=2, so wide
    # coverage is dropped at generation), not to tile/slab capacity.
    parts = [int(x) for x in bins.overflow_parts]
    assert sum(parts) == int(bins.overflow)
    assert parts[0] > 0


def test_binning_survivor_compaction_matches_wide():
    """max_dup_gen > max_dup must reproduce the wide-run tile contents
    exactly when per-gaussian cull survivors fit in max_dup."""
    intr = _intr()
    means, scales, quats, opac, rgb = _scene(n=80, seed=7)
    proj = project_gaussians(
        means, scales, quats, opac, rgb, jnp.eye(3), jnp.zeros(3),
        jnp.zeros(3), jnp.zeros(3), intr,
    )
    kw = dict(
        img_w=W, img_h=H, tile_size=TILE, tile_capacity=CAP,
        opacity=jnp.where(proj.valid, proj.opacity, 0.0),
        conic=proj.conic,
    )
    wide = tile_bin(proj.mean2d, proj.radius, proj.depth, proj.valid,
                    max_dup=32, **kw)
    im, cn = np.asarray(wide.index_matrix), np.asarray(wide.counts)
    surv = np.bincount(im[im < means.shape[0]], minlength=means.shape[0])
    D = max(int(surv.max()), 1)
    comp = tile_bin(proj.mean2d, proj.radius, proj.depth, proj.valid,
                    max_dup=D, max_dup_gen=32, **kw)
    assert int(comp.overflow) == 0
    imc, cnc = np.asarray(comp.index_matrix), np.asarray(comp.counts)
    assert (cn == cnc).all()
    for t in range(im.shape[0]):
        assert (im[t, :cn[t]] == imc[t, :cn[t]]).all()  # same order too


def test_slab_layout_invariants():
    """gauss_of_pos / pos_of_entry / index_matrix must agree: the slab is a
    re-layout of the same sorted (tile, depth) entry list."""
    from monogs_tpu.ops.binning import SLAB

    intr = _intr()
    means, scales, quats, opac, rgb = _scene(n=60, seed=4)
    proj = project_gaussians(
        means, scales, quats, opac, rgb, jnp.eye(3), jnp.zeros(3),
        jnp.zeros(3), jnp.zeros(3), intr,
    )
    D = 16
    bins = tile_bin(
        proj.mean2d, proj.radius, proj.depth, proj.valid,
        img_w=W, img_h=H, tile_size=TILE, tile_capacity=CAP, max_dup=D,
    )
    n = means.shape[0]
    gop = np.asarray(bins.gauss_of_pos)
    gsp = np.asarray(bins.gsort_pos)
    gsf = np.asarray(bins.gseg_start)
    glast = np.asarray(bins.g_last)
    idx = np.asarray(bins.index_matrix)
    pstart = np.asarray(bins.pstart_blk)
    counts = np.asarray(bins.counts)
    owner = np.asarray(bins.owner_blk)
    first = np.asarray(bins.seg_first)
    ecap = gop.shape[0]
    T = idx.shape[0]
    # The gaussian-sorted view compacts each gaussian's slab positions into
    # one contiguous segment (boundary-flagged, ending at g_last); segments
    # are consecutive and the padding tail is sentinel-flagged.
    assert gsf[0] == 1
    seg_end_prev = -1
    for g in range(n):
        pos_set = set(np.nonzero(gop == g)[0].tolist())
        if not pos_set:
            assert glast[g] == ecap
            continue
        c = len(pos_set)
        assert c <= D  # segments bounded by max_dup
        last = int(glast[g])
        start = last - c + 1
        assert start == seg_end_prev + 1  # segments are consecutive
        seg_end_prev = last
        assert set(gsp[start:last + 1].tolist()) == pos_set
        assert gsf[start] == 1
        assert (gsf[start + 1:last + 1] == 0).all()
    # index_matrix rows coincide with the slab segments; padding rows are
    # the sentinel gaussian.
    for t in range(T):
        nblk = -(-int(counts[t]) // SLAB)
        for k in range(counts[t]):
            assert idx[t, k] == gop[pstart[t] * SLAB + k]
        for k in range(counts[t], nblk * SLAB):
            assert gop[pstart[t] * SLAB + k] == n
        # owner map covers exactly the tile's blocks
        for b in range(pstart[t], pstart[t] + nblk):
            assert owner[b] == t
    # seg_first marks owner transitions; the dead tail is sentinel-owned.
    assert first[0] == 1
    for b in range(1, owner.shape[0]):
        assert first[b] == int(owner[b] != owner[b - 1])
        assert owner[b] >= owner[b - 1]
    total_blocks = int(np.sum([-(-int(c) // SLAB) for c in counts]))
    assert (owner[total_blocks:] == T).all()
    assert (gop[total_blocks * SLAB:] == n).all()


def test_slab_entry_capacity_truncation():
    """A too-small entry_capacity drops tail tiles' entries, reports
    overflow, and still renders finite images with matching prefix tiles."""
    intr = _intr()
    means, scales, quats, opac, rgb = _scene(n=80, seed=5)
    R, t = _pose()
    full = render(means, scales, quats, opac, rgb, R, t, intr,
                  tile_capacity=CAP, backend="pallas")
    small = render(means, scales, quats, opac, rgb, R, t, intr,
                   tile_capacity=CAP, entry_capacity=4 * 128,
                   backend="pallas")
    assert int(full.overflow) == 0
    assert int(small.overflow) > 0
    assert bool(jnp.all(jnp.isfinite(small.rgb)))
    # grads must stay finite through the truncated slab
    g = jax.grad(
        lambda m: jnp.sum(
            render(m, scales, quats, opac, rgb, R, t, intr,
                   tile_capacity=CAP, entry_capacity=4 * 128,
                   backend="pallas").rgb
        )
    )(means)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_empty_scene_renders_background():
    intr = _intr()
    n = 8
    out = render(
        jnp.zeros((n, 3)) + jnp.array([0.0, 0.0, -5.0]),  # behind camera
        jnp.full((n, 3), 0.01), jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        jnp.full((n,), 0.9), jnp.zeros((n, 3)),
        jnp.eye(3), jnp.zeros(3), intr,
        bg=jnp.array([0.2, 0.3, 0.4]), tile_capacity=CAP, backend="ref",
    )
    np.testing.assert_allclose(out.rgb[0, 0], jnp.array([0.2, 0.3, 0.4]), atol=1e-6)
    assert float(jnp.max(out.opacity)) == 0.0


def test_render_window_gradients_match_ref():
    """pallas-vs-ref gradient parity for the batched WINDOW path (ADVICE r1:
    pack_features_window's backward — Pallas channel-relayout + sum-over-
    window — previously had only indirect e2e coverage). Window of 2 views
    sharing the rgb table; linear probe loss over rgb/depth/opacity."""
    from monogs_tpu.ops.render import render_window

    intr = _intr()
    means, scales, quats, opac, rgb = _scene(n=50, seed=2)
    R, t = _pose()
    R2, t2 = lie.apply_pose_delta(
        R, t, jnp.array([0.01, -0.005, 0.002]), jnp.array([0.004, 0.002, -0.003])
    )
    Rs = jnp.stack([R, R2])
    ts = jnp.stack([t, t2])
    key = jax.random.PRNGKey(9)
    w_rgb = jax.random.normal(key, (2, H, W, 3))
    w_d = jax.random.normal(jax.random.fold_in(key, 1), (2, H, W))
    w_o = jax.random.normal(jax.random.fold_in(key, 2), (2, H, W))

    def make_loss(backend):
        def f(means, scales, quats, opac, rgb, rhos, thetas):
            out = render_window(
                means, scales, quats, opac, rgb, Rs, ts, intr,
                rhos=rhos, thetas=thetas, tile_size=TILE,
                tile_capacity=CAP, max_dup=16, backend=backend,
            )
            return (
                jnp.sum(out.rgb * w_rgb)
                + jnp.sum(out.depth * w_d)
                + jnp.sum(out.opacity * w_o)
            )
        return f

    z = jnp.zeros((2, 3))
    args = (means, scales, quats, opac, rgb, z, z)
    g_ref = jax.grad(make_loss("ref"), argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(make_loss("pallas"), argnums=tuple(range(7)))(*args)
    names = ["means", "scales", "quats", "opac", "rgb", "rhos", "thetas"]
    for n, gr, gp in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(gp, gr, rtol=2e-3, atol=1e-6, err_msg=n)


def test_measure_entry_demand_matches_tile_bin():
    """The occupancy probe (binning.measure_entry_demand) must agree with
    the padded slab demand tile_bin actually realizes when capacity is
    unconstrained (VERDICT r1 #7: derived entry_capacity correctness)."""
    from monogs_tpu.ops.binning import SLAB, measure_entry_demand
    from monogs_tpu.ops.projection import project_gaussians

    intr = _intr()
    means, scales, quats, opac, rgb = _scene(n=120, seed=3, spread=0.9)
    R, t = _pose()
    proj = project_gaussians(
        means, scales, quats, opac, rgb, R, t, jnp.zeros(3), jnp.zeros(3),
        intr,
    )
    opacity = jnp.where(proj.valid, proj.opacity, 0.0)
    for max_dup, max_dup_gen in ((16, None), (4, 16)):
        bins = tile_bin(
            proj.mean2d, proj.radius, proj.depth, proj.valid,
            img_w=W, img_h=H, tile_size=TILE, tile_capacity=CAP,
            max_dup=max_dup, max_dup_gen=max_dup_gen,
            opacity=opacity, conic=proj.conic,
            entry_capacity=64 * SLAB,  # ample: no truncation
        )
        padded, entries = measure_entry_demand(
            proj.mean2d[:, 0], proj.mean2d[:, 1], proj.radius, proj.valid,
            opacity, proj.conic,
            img_w=W, img_h=H, tile_size=TILE, tile_capacity=CAP,
            max_dup=max_dup, max_dup_gen=max_dup_gen,
        )
        counts = np.asarray(bins.counts)
        assert int(entries) == counts.sum(), (max_dup, max_dup_gen)
        want_padded = int((-(-counts // SLAB) * SLAB).sum())
        assert int(padded) == want_padded, (max_dup, max_dup_gen)
        assert int(bins.overflow) == 0
