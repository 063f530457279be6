"""Keyframe selection and covisibility window management (host-side logic).

Counterpart of reference slam_tracker.py:195-284. These decisions operate on
scalars and small per-keyframe visibility reductions; they run on host
between jitted steps (device work is only the boolean-mask reductions).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class KeyframeConfig:
    """slam_tracker.py:200-203 + base_config.yaml Training."""

    kf_translation: float = 0.08
    kf_min_translation: float = 0.05
    kf_overlap: float = 0.9
    kf_cutoff: float = 0.3
    window_size: int = 8
    n_dont_touch: int = 2
    kf_interval: int = 1          # slam_tracker.py:70 (hard-coded 1)
    check_viewpoints_overlap: bool = False  # slam_tracker.py:71 fork default


def _rel_translation(R_a, t_a, R_b, t_b) -> float:
    """||(T_a @ inv(T_b))[:3,3]|| for w2c poses (slam_tracker.py:207-211)."""
    # T_a @ T_b^-1: rotation R_a R_b^T, translation t_a - R_a R_b^T t_b.
    Rrel = np.asarray(R_a) @ np.asarray(R_b).T
    trel = np.asarray(t_a) - Rrel @ np.asarray(t_b)
    return float(np.linalg.norm(trel))


def _pad_common(vis_a, vis_b):
    """Zero-pad two visibility masks to a common capacity. Map growth
    (gaussian_map.grow) appends slots and keeps indices stable, so a mask
    captured before a grow is exactly the grown mask with trailing False —
    in async mode the tracker can hold masks from both sides of a grow."""
    na, nb = vis_a.shape[0], vis_b.shape[0]
    if na == nb:
        return vis_a, vis_b
    n = max(na, nb)
    if na < n:
        vis_a = jnp.pad(vis_a, (0, n - na))
    if nb < n:
        vis_b = jnp.pad(vis_b, (0, n - nb))
    return vis_a, vis_b


def overlap_ratio_union(vis_a, vis_b) -> float:
    """Intersection-over-union of visibility masks (slam_tracker.py:214-221)."""
    vis_a, vis_b = _pad_common(vis_a, vis_b)
    inter = int(jnp.sum(vis_a & vis_b))
    union = int(jnp.sum(vis_a | vis_b))
    return inter / max(union, 1)


def overlap_ratio_min(vis_a, vis_b) -> float:
    """Szymkiewicz–Simpson coefficient (slam_tracker.py:233-243)."""
    vis_a, vis_b = _pad_common(vis_a, vis_b)
    inter = int(jnp.sum(vis_a & vis_b))
    denom = min(int(jnp.sum(vis_a)), int(jnp.sum(vis_b)))
    return inter / max(denom, 1)


import jax


@jax.jit
def _overlap_stats(cur, stack):
    """[intersections (n,), member counts (n,), |cur| (1,)] as one buffer."""
    return jnp.concatenate([
        jnp.sum(stack & cur[None, :], axis=1),
        jnp.sum(stack, axis=1),
        jnp.sum(cur)[None],
    ])


def should_add_as_keyframe(
    cur_pose, last_kf_pose, cur_vis, last_kf_vis, median_depth: float,
    cfg: KeyframeConfig,
) -> bool:
    """slam_tracker.py:195-222. cur_pose/last_kf_pose: (R, t) tuples."""
    dist = _rel_translation(*cur_pose, *last_kf_pose)
    dist_check = dist > cfg.kf_translation * median_depth
    dist_check2 = dist > cfg.kf_min_translation * median_depth
    ratio = overlap_ratio_union(cur_vis, last_kf_vis)
    return (ratio < cfg.kf_overlap and dist_check2) or dist_check


def add_to_window(
    cur_frame_idx: int,
    cur_vis,
    kf_list: list,
    vis_dict: dict,
    poses: dict,              # idx -> (R, t) numpy
    cfg: KeyframeConfig,
    is_window_full: bool,
):
    """slam_tracker.py:223-284: prepend the new keyframe; evict either one
    low-overlap keyframe (Szymkiewicz–Simpson <= cutoff) or, if the window
    exceeds capacity, the keyframe maximizing the inverse-distance
    redundancy heuristic. Returns (new_kf_list, removed_idx or None)."""
    N = cfg.n_dont_touch
    kf_list = [cur_frame_idx] + list(kf_list)
    removed = None

    # All Szymkiewicz-Simpson ratios in ONE device program + ONE readback:
    # the per-member loop was 2-3 tunnel roundtrips (~30 ms each) per
    # window keyframe, ~0.6 s per keyframe event on the axon backend. The
    # member list is padded to window_size so every event reuses ONE
    # compiled executable (eager/jit shapes compile remotely, minutes each,
    # and the window length changes every early event).
    tail = kf_list[N:]
    ratios = {}
    if tail:
        vs = [cur_vis] + [vis_dict[k] for k in tail]
        cap = max(v.shape[0] for v in vs)
        vs = [jnp.pad(v, (0, cap - v.shape[0])) if v.shape[0] < cap else v
              for v in vs]
        n_pad = max(cfg.window_size, len(tail))
        stack = jnp.stack(
            vs[1:] + [vs[0]] * (n_pad - len(tail))  # self-overlap padding
        )
        stats = np.asarray(_overlap_stats(vs[0], stack))
        inter, counts, ccur = (
            stats[:n_pad], stats[n_pad:2 * n_pad], int(stats[2 * n_pad])
        )
        ratios = {
            k: float(inter[i]) / max(min(int(counts[i]), ccur), 1)
            for i, k in enumerate(tail)
        }

    to_remove = []
    for kf_idx in tail:
        cutoff = cfg.kf_cutoff if is_window_full else 0.4
        if ratios[kf_idx] <= cutoff:
            to_remove.append(kf_idx)
    if to_remove:
        removed = to_remove[-1]
        kf_list.remove(removed)

    if len(kf_list) > cfg.window_size:
        R0, t0 = poses[cur_frame_idx]
        inv_dist = []
        for i in range(N, len(kf_list)):
            Ri, ti = poses[kf_list[i]]
            inv_dists = []
            for j in range(N, len(kf_list)):
                if i == j:
                    continue
                Rj, tj = poses[kf_list[j]]
                inv_dists.append(1.0 / (_rel_translation(Ri, ti, Rj, tj) + 1e-6))
            k = float(np.sqrt(_rel_translation(Ri, ti, R0, t0)))
            inv_dist.append(k * sum(inv_dists))
        idx = int(np.argmax(inv_dist))
        removed = kf_list[N + idx]
        kf_list.remove(removed)

    return kf_list, removed
