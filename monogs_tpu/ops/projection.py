"""Differentiable Gaussian projection ("preprocess" stage), pure JAX.

TPU-native counterpart of the CUDA rasterizer's preprocess kernel
(diff-gaussian-rasterization-w-pose, see /root/reference/SURVEY refs and call
site gaussian_splatting/gaussian_renderer/__init__.py:130-156):
  - transform means to camera space through the *pose delta* (rho, theta) so
    that dL/drho, dL/dtheta come from JAX autodiff — replacing the CUDA
    extension's hand-written analytic pose gradients,
  - EWA splatting: cov2D = J W Sigma W^T J^T + 0.3 I,
  - conic (inverse cov2D), screen radius, frustum culling mask.

Everything is vectorized over N (static capacity); culled/padded Gaussians
are handled by masks, never by dynamic shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import lie
from .graphics import Intrinsics

# Near-plane cull distance, matching the CUDA preprocess convention (0.2).
NEAR_CULL = 0.2
# EWA low-pass dilation added to the 2D covariance diagonal (pixels^2).
COV2D_DILATION = 0.3
# Minimum opacity for a Gaussian to be rasterized at all (CUDA: 1/255).
ALPHA_EPS = 1.0 / 255.0


class ProjectedGaussians(NamedTuple):
    mean2d: jnp.ndarray   # (N, 2) pixel coords
    depth: jnp.ndarray    # (N,) camera-space z
    conic: jnp.ndarray    # (N, 3) inverse cov2D (a, b, c)
    radius: jnp.ndarray   # (N,) float screen radius (3 sigma)
    rgb: jnp.ndarray      # (N, 3)
    opacity: jnp.ndarray  # (N,)
    valid: jnp.ndarray    # (N,) bool — in frustum, invertible, non-culled


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """(N,3) scales (already exp-activated), (N,4) wxyz quats -> (N,3,3).

    Sigma = R S S^T R^T (reference general_utils.py:139-160 semantics).
    """
    R = lie.quat_to_rotmat(quats)  # (N,3,3)
    M = R * scales[:, None, :]     # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def project_gaussians(
    means3d: jnp.ndarray,     # (N,3) world
    scales: jnp.ndarray,      # (N,3) activated (exp) scales
    quats: jnp.ndarray,       # (N,4) unnormalized wxyz
    opacities: jnp.ndarray,   # (N,) activated (sigmoid)
    rgbs: jnp.ndarray,        # (N,3)
    R_w2c: jnp.ndarray,       # (3,3) base world-to-camera rotation
    t_w2c: jnp.ndarray,       # (3,)
    rho: jnp.ndarray,         # (3,) translation delta on se(3)
    theta: jnp.ndarray,       # (3,) rotation delta on se(3)
    intr: Intrinsics,
    active: jnp.ndarray | None = None,  # (N,) bool capacity mask
) -> ProjectedGaussians:
    """Project Gaussians to screen space through the pose retraction.

    The camera used is SE3_exp([rho, theta]) @ (R_w2c|t_w2c) — identical to
    the reference tracker's parameterization (utils/pose_utils.py:76-93,
    gaussian_renderer/__init__.py:154-155), so autodiff w.r.t. (rho, theta)
    reproduces the CUDA rasterizer's theta/rho gradients.
    """
    W, t = lie.apply_pose_delta(R_w2c, t_w2c, rho, theta)

    p_cam = means3d @ W.T + t                     # (N,3)
    x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
    z_safe = jnp.where(z > NEAR_CULL, z, 1.0)

    u = intr.fx * x / z_safe + intr.cx
    v = intr.fy * y / z_safe + intr.cy
    mean2d = jnp.stack([u, v], axis=-1)

    # EWA: clamp the tangent-plane offsets like the CUDA preprocess
    # (limits = 1.3 * tan(fov/2)) to bound the Jacobian off-axis.
    tan_fovx = intr.width / (2.0 * intr.fx)
    tan_fovy = intr.height / (2.0 * intr.fy)
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(x / z_safe, -lim_x, lim_x) * z_safe
    ty = jnp.clip(y / z_safe, -lim_y, lim_y) * z_safe

    # J: Jacobian of pinhole projection at (tx, ty, z). Rows: du/dp, dv/dp.
    zero = jnp.zeros_like(z)
    J = jnp.stack(
        [
            jnp.stack([intr.fx / z_safe, zero, -intr.fx * tx / (z_safe * z_safe)], -1),
            jnp.stack([zero, intr.fy / z_safe, -intr.fy * ty / (z_safe * z_safe)], -1),
        ],
        axis=-2,
    )  # (N,2,3)

    cov3d = build_cov3d(scales, quats)            # (N,3,3)
    JW = J @ W[None]                              # (N,2,3)
    cov2d = JW @ cov3d @ jnp.swapaxes(JW, -1, -2)  # (N,2,2)
    cov2d = cov2d + COV2D_DILATION * jnp.eye(2, dtype=cov2d.dtype)[None]

    c00, c01, c11 = cov2d[:, 0, 0], cov2d[:, 0, 1], cov2d[:, 1, 1]
    det = c00 * c11 - c01 * c01
    det_safe = jnp.where(det > 0, det, 1.0)
    conic = jnp.stack([c11 / det_safe, -c01 / det_safe, c00 / det_safe], axis=-1)

    # Screen radius: 3 * sqrt(max eigenvalue of cov2D) (CUDA convention).
    mid = 0.5 * (c00 + c11)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # Visibility: in front of camera, invertible covariance, rasterizable
    # opacity, and overlapping the image at all.
    valid = (z > NEAR_CULL) & (det > 0) & (opacities > ALPHA_EPS)
    valid = valid & (u + radius > 0) & (u - radius < intr.width)
    valid = valid & (v + radius > 0) & (v - radius < intr.height)
    if active is not None:
        valid = valid & active

    return ProjectedGaussians(
        mean2d=mean2d,
        depth=z,
        conic=conic,
        radius=jnp.where(valid, radius, 0.0),
        rgb=rgbs,
        opacity=opacities,
        valid=valid,
    )
