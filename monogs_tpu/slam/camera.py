"""Per-frame camera state as a functional pytree.

TPU-native counterpart of the reference `CameraExtrinsics` nn.Module
(/root/reference/utils/camera_utils.py:82-222): a frame is immutable data —
pose estimate (R, t world-to-camera), ground truth, image buffers, learned
exposure — and the keyframe window is a *stacked* Frame (leading window axis)
so the mapper renders/optimizes every keyframe in one batched jitted step
instead of a serial python loop (reference slam_mapper.py:273-322).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.losses import compute_grad_mask


class Frame(NamedTuple):
    frame_idx: jnp.ndarray      # () int32
    R: jnp.ndarray              # (3,3) w2c estimate
    t: jnp.ndarray              # (3,)
    R_gt: jnp.ndarray           # (3,3) ground truth (dataset pose)
    t_gt: jnp.ndarray           # (3,)
    rgb: jnp.ndarray            # (H,W,3) float32 [0,1]
    depth: jnp.ndarray          # (H,W) float32, 0 = invalid
    mask: jnp.ndarray           # (H,W) bool (dynamic-object mask applied)
    segmentation: jnp.ndarray   # (H,W) int32 object ids
    grad_mask: jnp.ndarray      # (H,W) bool Scharr edge mask
    exposure_a: jnp.ndarray     # () learned log-gain
    exposure_b: jnp.ndarray     # () learned bias


def make_frame(
    frame_idx: int,
    rgb: jnp.ndarray,
    depth: jnp.ndarray | None,
    pose_w2c: jnp.ndarray,        # (4,4) gt pose
    mask: jnp.ndarray | None = None,
    segmentation: jnp.ndarray | None = None,
    edge_threshold: float = 1.1,
) -> Frame:
    """Build a Frame from dataset output (camera_utils.py:128-158 semantics:
    the gt mask multiplies rgb/depth; grad_mask from the Scharr magnitude)."""
    H, W = rgb.shape[:2]
    if depth is None:
        depth = jnp.zeros((H, W), jnp.float32)
    if mask is None:
        mask = jnp.ones((H, W), bool)
    if segmentation is None:
        segmentation = jnp.zeros((H, W), jnp.int32)
    rgb = rgb * mask[..., None]
    depth = depth * mask
    R_gt = pose_w2c[:3, :3]
    t_gt = pose_w2c[:3, 3]
    return Frame(
        frame_idx=jnp.asarray(frame_idx, jnp.int32),
        R=R_gt, t=t_gt,       # estimate initialized at gt; tracker overwrites
        R_gt=R_gt, t_gt=t_gt,
        rgb=jnp.asarray(rgb, jnp.float32),
        depth=jnp.asarray(depth, jnp.float32),
        mask=mask,
        segmentation=jnp.asarray(segmentation, jnp.int32),
        grad_mask=compute_grad_mask(rgb, edge_threshold),
        exposure_a=jnp.zeros((), jnp.float32),
        exposure_b=jnp.zeros((), jnp.float32),
    )


def with_pose(frame: Frame, R: jnp.ndarray, t: jnp.ndarray) -> Frame:
    return frame._replace(R=R, t=t)


# ---------------------------------------------------------------------------
# Stacked keyframe window.
# ---------------------------------------------------------------------------


class Window(NamedTuple):
    """Fixed-capacity stacked keyframe window (the mapper's working set).

    frames: a Frame whose leaves carry a leading (Wmax,) axis.
    valid:  (Wmax,) bool — slot occupancy.
    Slot order matches the tracker's kf list (newest first,
    slam_tracker.py:225).
    """

    frames: Frame
    valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.valid.shape[0]


def empty_window(capacity: int, template: Frame) -> Window:
    frames = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + x.shape, x.dtype), template
    )
    return Window(frames=frames, valid=jnp.zeros((capacity,), bool))


def window_set(window: Window, slot, frame: Frame, valid=True) -> Window:
    frames = jax.tree.map(
        lambda buf, x: buf.at[slot].set(x), window.frames, frame
    )
    return Window(frames=frames, valid=window.valid.at[slot].set(valid))


def window_get(window: Window, slot) -> Frame:
    return jax.tree.map(lambda buf: buf[slot], window.frames)


@jax.jit
def window_update(window: Window, frame: Frame, perm: jnp.ndarray,
                  valid: jnp.ndarray) -> Window:
    """Assemble the next keyframe window from the previous DEVICE-RESIDENT
    window in one dispatch: slot s takes old slot perm[s]; slot 0 is then
    overwritten with the new keyframe `frame`. Keyframe events only ever
    prepend one frame and permute/evict survivors (slam_tracker.py:223-284),
    so the ~50 MB of window images never leave the device — the per-event
    host restack (window_from_list: ~36 eager tunnel dispatches, measured
    7.8 s/keyframe on the axon backend) becomes one jitted gather."""
    frames = jax.tree.map(lambda buf: jnp.take(buf, perm, axis=0),
                          window.frames)
    frames = jax.tree.map(lambda buf, x: buf.at[0].set(x), frames, frame)
    return Window(frames=frames, valid=valid)


def window_from_list(frames: list, capacity: int) -> Window:
    """Stack a python list of Frames into a padded Window."""
    assert len(frames) <= capacity and frames
    template = frames[0]
    w = empty_window(capacity, template)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    w = Window(
        frames=jax.tree.map(
            lambda buf, x: jax.lax.dynamic_update_slice_in_dim(buf, x, 0, 0),
            w.frames, stacked,
        ),
        valid=w.valid.at[: len(frames)].set(True),
    )
    return w
