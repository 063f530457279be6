"""Convergence early exit of mapping spans (slam/mapper.py:mapping_span,
MapperConfig.converged_eps — TPU-native deviation from the reference's
fixed iteration counts, documented there)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from monogs_tpu.ops.graphics import Intrinsics
from monogs_tpu.slam.camera import make_frame, window_from_list
from monogs_tpu.slam.mapper import (
    MapperConfig,
    init_mapper_state,
    mapping_span,
)


def _make_state(n_kf=3, W=64, H=48, C=2048):
    rng = np.random.RandomState(0)
    frames = []
    for i in range(n_kf):
        rgb = jnp.asarray(rng.rand(H, W, 3), jnp.float32)
        depth = jnp.asarray(rng.uniform(1.0, 3.0, (H, W)), jnp.float32)
        T = np.eye(4)
        T[:3, 3] = [0.01 * i, 0, 0]
        frames.append(make_frame(i, rgb, depth, jnp.asarray(T)))
    window = window_from_list(frames, n_kf)
    state = init_mapper_state(C, 1, window, seed=0)
    params = dict(state.gmap.params)
    params["xyz"] = jnp.asarray(
        rng.uniform(-1, 1, (C, 3)) + np.array([0, 0, 2.0]), jnp.float32)
    params["rgb"] = jnp.asarray(rng.rand(C, 3), jnp.float32)
    params["log_scales"] = jnp.full((C, 3), -3.0, jnp.float32)
    gmap = state.gmap._replace(params=params,
                               active=jnp.ones((C,), bool))
    intr = Intrinsics(fx=50.0, fy=50.0, cx=W / 2, cy=H / 2,
                      width=W, height=H)
    return state._replace(gmap=gmap), intr


def _cfg(**kw):
    return MapperConfig(tile_size=16, tile_capacity=256, max_dup=8,
                        backend="ref", **kw)


def test_disabled_runs_full_schedule():
    state, intr = _make_state()
    cfg = _cfg()  # converged_eps = 0 -> parity: exact trip counts
    st, aux = mapping_span(state, intr, cfg, False, 1, 4)
    assert int(st.nr_iters) - int(state.nr_iters) == cfg.rebin_every + 4
    assert float(aux.loss) > 0.0


def test_early_exit_cuts_iterations():
    state, intr = _make_state()
    # eps so large every iteration counts as a stall: the span must stop
    # after ~patience iterations instead of the scheduled 2*8+8.
    cfg = _cfg(converged_eps=10.0, converged_patience=3)
    st, aux = mapping_span(state, intr, cfg, False, 2, 8)
    done = int(st.nr_iters) - int(state.nr_iters)
    scheduled = 2 * cfg.rebin_every + 8
    assert done < scheduled, "early exit never fired"
    # First iteration can't stall (prev=inf -> NaN-compare False), so the
    # minimum is patience, the maximum patience+1.
    assert cfg.converged_patience <= done <= cfg.converged_patience + 1


def test_tiny_eps_matches_parity_trajectory():
    """With a realistically tiny eps the early exit must not fire on a
    still-improving loss, and the optimized state must match the
    parity path bit-for-bit (same program modulo the stall bookkeeping)."""
    state, intr = _make_state()
    st0, aux0 = mapping_span(state, intr, _cfg(), False, 1, 2)
    st1, aux1 = mapping_span(
        state, intr, _cfg(converged_eps=1e-9, converged_patience=8),
        False, 1, 2)
    assert int(st1.nr_iters) == int(st0.nr_iters)
    np.testing.assert_allclose(
        np.asarray(st1.gmap.params["xyz"]),
        np.asarray(st0.gmap.params["xyz"]), atol=0, rtol=0)
    np.testing.assert_allclose(float(aux1.loss), float(aux0.loss),
                               rtol=1e-6)


def test_refine_colors_only_freezes_geometry():
    """refine_colors_only (MapperConfig note): geometry must not move —
    including under WARM Adam momentum from the SLAM loop, which is why
    the freeze is lr=0, not just zero gradients."""
    import jax

    from monogs_tpu.slam.mapper import refine_step

    state, intr = _make_state()
    # Warm, nonzero moments on every leaf (as after a long mapping run).
    warm = jax.tree.map(lambda x: jnp.full_like(x, 0.01), state.adam.mu)
    state = state._replace(
        adam=state.adam._replace(mu=warm, nu=jax.tree.map(
            lambda x: jnp.full_like(x, 0.001), state.adam.nu)))
    frame = jax.tree.map(lambda x: x[0], state.window.frames)

    cfg = _cfg()  # refine_colors_only defaults True
    st, overflow = refine_step(state, frame, intr, cfg)
    for k in ("xyz", "log_scales", "quats"):
        np.testing.assert_array_equal(
            np.asarray(st.gmap.params[k]), np.asarray(state.gmap.params[k]),
            err_msg=f"{k} moved in colors-only refine")
    assert not np.allclose(np.asarray(st.gmap.params["rgb"]),
                           np.asarray(state.gmap.params["rgb"])), (
        "rgb did not move — refine did nothing")

    cfg_all = _cfg(refine_colors_only=False)
    st2, _ = refine_step(state, frame, intr, cfg_all)
    assert not np.allclose(np.asarray(st2.gmap.params["xyz"]),
                           np.asarray(state.gmap.params["xyz"])), (
        "all-params refine should move geometry"
    )
