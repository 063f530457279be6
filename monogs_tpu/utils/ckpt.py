"""Checkpoint / resume of the full SLAM state.

The reference persists only the final PLY map with no mid-run resume
(SURVEY.md §5 checkpoint note, gaussian_model.py:481-640). TPU-native
upgrade: the complete mapper state — Gaussian map, Adam moments, stacked
keyframe window (poses, exposures, images), pose-optimizer moments,
iteration counter, PRNG key — is one pytree, checkpointed with orbax and
restorable mid-run. Host-side bookkeeping (trajectories, keyframe list)
rides along as JSON metadata.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_checkpoint(path: str, slam) -> None:
    """Write <path>/state (orbax) + <path>/host.json."""
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    state = jax.tree.map(np.asarray, slam.state)
    ckptr.save(os.path.join(os.path.abspath(path), "state"), state, force=True)
    ckptr.wait_until_finished()

    host = {
        "kf_list": list(slam.kf_list),
        "kf_history": sorted(slam.kf_history),
        # State-template metadata for cold (fresh-process) restores.
        "map_capacity": int(slam.state.gmap.capacity),
        "nr_objects": int(slam.state.gmap.obj_prob.shape[1]),
        "is_window_full": slam.is_window_full,
        "first_time_pruned": slam.first_time_pruned,
        "median_depth": slam.median_depth,
        "est_poses": {
            str(k): [np.asarray(R).tolist(), np.asarray(t).tolist()]
            for k, (R, t) in slam.est_poses.items()
        },
        "gt_poses": {
            str(k): [np.asarray(R).tolist(), np.asarray(t).tolist()]
            for k, (R, t) in slam.gt_poses.items()
        },
        "vis_keys": [int(k) for k in slam.vis_dict],
    }
    with open(os.path.join(path, "host.json"), "w") as f:
        json.dump(host, f)
    np.savez(
        os.path.join(path, "visibility.npz"),
        **{str(k): np.asarray(v) for k, v in slam.vis_dict.items()},
    )


def load_checkpoint(path: str, slam) -> None:
    """Restore into an existing SLAM instance (dataset/configs already
    constructed). Mirrors save_checkpoint. Works both warm (slam.state
    exists, e.g. in-session restore) and cold (fresh process via
    `slam.py --resume`): a cold restore builds the state template from the
    checkpoint's structure metadata + dataset frame 0."""
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "host.json")) as f:
        host = json.load(f)

    if slam.state is None:
        from ..slam.camera import make_frame
        from ..slam.camera import window_from_list
        from ..slam.mapper import init_mapper_state

        import jax.numpy as jnp

        d = slam.dataset[0]
        frame = make_frame(
            0, jnp.asarray(d["rgb"]),
            None if d.get("depth") is None else jnp.asarray(d["depth"]),
            jnp.asarray(d["pose"]),
            mask=None if d.get("mask") is None else jnp.asarray(d["mask"]),
            segmentation=None if d.get("segmentation") is None
            else jnp.asarray(d["segmentation"]),
        )
        window = window_from_list([frame], slam._window_capacity())
        slam.state = init_mapper_state(
            host.get("map_capacity", slam.scfg.map_capacity),
            host.get("nr_objects", 1),
            window, seed=slam.scfg.seed,
        )

    ckptr = ocp.StandardCheckpointer()
    template = jax.tree.map(np.asarray, slam.state)
    state = ckptr.restore(
        os.path.join(os.path.abspath(path), "state"), template
    )
    import jax.numpy as jnp

    slam.state = jax.tree.map(jnp.asarray, state)

    slam.kf_list = list(host["kf_list"])
    slam.kf_history = set(host.get("kf_history", host["kf_list"]))
    slam.is_window_full = host["is_window_full"]
    slam.first_time_pruned = host["first_time_pruned"]
    slam.median_depth = host["median_depth"]
    slam.est_poses = {
        int(k): (np.array(v[0]), np.array(v[1]))
        for k, v in host["est_poses"].items()
    }
    slam.gt_poses = {
        int(k): (np.array(v[0]), np.array(v[1]))
        for k, v in host["gt_poses"].items()
    }
    vis = np.load(os.path.join(path, "visibility.npz"))
    slam.vis_dict = {int(k): jnp.asarray(vis[k]) for k in vis.files}
    # Window frames for the keyframe list come from the restored state.
    from ..slam.camera import window_get

    for slot, idx in enumerate(slam.kf_list):
        slam.frames[idx] = window_get(slam.state.window, slot)
    # The restored window is in kf_list slot order (it was checkpointed
    # that way) — keyframe events can keep updating it by permutation.
    slam._window_slots = list(slam.kf_list)
