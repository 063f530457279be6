"""Camera models and projective geometry (pure JAX, jittable).

The TPU rasterizer works directly with pinhole intrinsics (fx, fy, cx, cy) —
no OpenGL-style NDC matrices on the hot path — but the OpenGL-convention
projection matrix is provided for parity with the reference
(/root/reference/gaussian_splatting/utils/graphics_utils.py:68-89) and for
PLY/camera-export interop.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """Pinhole intrinsics — all plain Python numbers, so the whole tuple is
    hashable and passes through jit as a *static* argument (width/height
    define array shapes; fx/fy are frozen in the reference too,
    utils/camera_utils.py:26-28 "requires_grad=False").
    """

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    @property
    def fovx(self) -> float:
        return 2.0 * math.atan(self.width / (2.0 * float(self.fx)))

    @property
    def fovy(self) -> float:
        return 2.0 * math.atan(self.height / (2.0 * float(self.fy)))


def fov2focal(fov: float, pixels: int) -> float:
    """graphics_utils.py:92-93."""
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: int) -> float:
    """graphics_utils.py:96-97."""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R,t) world-to-camera -> (4,4) homogeneous W2C matrix
    (graphics_utils.py:33-42; NOT transposed — row-vector transposition is a
    torch-ism we drop)."""
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def camera_center(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Camera origin in world coordinates: -R^T t
    (parity: camera_utils.py:176-178 via matrix inverse)."""
    return -R.T @ t


def get_projection_matrix(
    znear, zfar, cx, cy, fx, fy, W, H
) -> jnp.ndarray:
    """Principal-point-aware OpenGL-convention projection
    (graphics_utils.py:68-89). Provided for parity/export only."""
    left = ((2 * cx - W) / W - 1.0) * W / 2.0
    right = ((2 * cx - W) / W + 1.0) * W / 2.0
    top = ((2 * cy - H) / H + 1.0) * H / 2.0
    bottom = ((2 * cy - H) / H - 1.0) * H / 2.0
    left = znear / fx * left
    right = znear / fx * right
    top = znear / fy * top
    bottom = znear / fy * bottom

    P = jnp.zeros((4, 4), dtype=jnp.result_type(fx, jnp.float32))
    P = P.at[0, 0].set(2.0 * znear / (right - left))
    P = P.at[1, 1].set(2.0 * znear / (top - bottom))
    P = P.at[0, 2].set((right + left) / (right - left))
    P = P.at[1, 2].set((top + bottom) / (top - bottom))
    P = P.at[3, 2].set(1.0)
    P = P.at[2, 2].set(zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    return P


def unproject(depth: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    """Backproject a (H,W) depth map to (H,W,3) camera-space points at pixel
    centers (parity: gaussian_model.py:225-274 pixel-center unprojection)."""
    H, W = depth.shape
    u = jnp.arange(W, dtype=depth.dtype)[None, :] + 0.5
    v = jnp.arange(H, dtype=depth.dtype)[:, None] + 0.5
    x = (u - intr.cx) / intr.fx * depth
    y = (v - intr.cy) / intr.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def transform_points(R: jnp.ndarray, t: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply rigid transform to (...,3) points."""
    return pts @ R.T + t


def cam_to_world(R: jnp.ndarray, t: jnp.ndarray, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Inverse rigid transform: camera-space (...,3) -> world."""
    return (pts_cam - t) @ R
