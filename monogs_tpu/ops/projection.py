"""Differentiable Gaussian projection ("preprocess" stage), pure JAX.

TPU-native counterpart of the CUDA rasterizer's preprocess kernel
(diff-gaussian-rasterization-w-pose, see /root/reference/SURVEY refs and call
site gaussian_splatting/gaussian_renderer/__init__.py:130-156):
  - transform means to camera space through the *pose delta* (rho, theta) so
    that dL/drho, dL/dtheta come from JAX autodiff — replacing the CUDA
    extension's hand-written analytic pose gradients,
  - EWA splatting: cov2D = J W Sigma W^T J^T + 0.3 I,
  - conic (inverse cov2D), screen radius, frustum culling mask.

All per-Gaussian algebra is written as explicit scalar-channel arithmetic on
(N,) vectors (like the CUDA preprocess): a (N,3)-shaped op uses 3 of 128 TPU
lanes, while (N,) channels vectorize fully on the VPU. Everything is
vectorized over N (static capacity); culled/padded Gaussians are handled by
masks, never by dynamic shapes.
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
_EPS = 1e-8


class ProjectedGaussians(NamedTuple):
    mean2d: jnp.ndarray   # (N, 2) pixel coords
    depth: jnp.ndarray    # (N,) camera-space z
    conic: jnp.ndarray    # (N, 3) inverse cov2D (a, b, c)
    radius: jnp.ndarray   # (N,) float screen radius (3 sigma)
    rgb: jnp.ndarray      # (N, 3)
    opacity: jnp.ndarray  # (N,)
    valid: jnp.ndarray    # (N,) bool — in frustum, invertible, non-culled


class ProjectedChannels(NamedTuple):
    """Scalar-channel projection output for the hot rasterization path.

    Same content as ProjectedGaussians but WITHOUT the (N,2)/(N,3) stacks:
    every per-Gaussian quantity stays an (N,) lane-efficient channel. The
    stack (fwd) + split (bwd) pairs around mean2d/conic measured ~5 ms per
    mapping iteration at window 8 (HLO-profiled slice_reduce fusions) —
    downstream consumers (binning, feature pack) want channels anyway."""

    u: jnp.ndarray        # (N,) pixel x
    v: jnp.ndarray        # (N,) pixel y
    ca: jnp.ndarray       # (N,) conic a
    cb: jnp.ndarray       # (N,) conic b
    cc: jnp.ndarray       # (N,) conic c
    depth: jnp.ndarray    # (N,)
    radius: jnp.ndarray   # (N,)
    opacity: jnp.ndarray  # (N,)
    valid: jnp.ndarray    # (N,) bool


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """(N,3) scales (already exp-activated), (N,4) wxyz quats -> (N,3,3).

    Sigma = R S S^T R^T (reference general_utils.py:139-160 semantics).
    Kept in matrix form for tests/PLY tooling; the hot path below uses the
    expanded scalar form.
    """
    R = lie.quat_to_rotmat(quats)  # (N,3,3)
    M = R * scales[:, None, :]     # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def project_gaussians_ch(
    means3d: jnp.ndarray,     # (N,3) world
    scales: jnp.ndarray,      # (N,3) activated (exp) scales
    quats: jnp.ndarray,       # (N,4) unnormalized wxyz
    opacities: jnp.ndarray,   # (N,) activated (sigmoid)
    R_w2c: jnp.ndarray,       # (3,3) base world-to-camera rotation
    t_w2c: jnp.ndarray,       # (3,)
    rho: jnp.ndarray,         # (3,) translation delta on se(3)
    theta: jnp.ndarray,       # (3,) rotation delta on se(3)
    intr: Intrinsics,
    active: jnp.ndarray | None = None,  # (N,) bool capacity mask
) -> ProjectedChannels:
    """Project Gaussians to screen space through the pose retraction.

    The camera used is SE3_exp([rho, theta]) @ (R_w2c|t_w2c) — identical to
    the reference tracker's parameterization (utils/pose_utils.py:76-93,
    gaussian_renderer/__init__.py:154-155), so autodiff w.r.t. (rho, theta)
    reproduces the CUDA rasterizer's theta/rho gradients.
    """
    W, t = lie.apply_pose_delta(R_w2c, t_w2c, rho, theta)
    # Unpack the 3x3 rotation into scalars (broadcast against (N,) channels).
    w00, w01, w02 = W[0, 0], W[0, 1], W[0, 2]
    w10, w11, w12 = W[1, 0], W[1, 1], W[1, 2]
    w20, w21, w22 = W[2, 0], W[2, 1], W[2, 2]

    px, py, pz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    x = w00 * px + w01 * py + w02 * pz + t[0]
    y = w10 * px + w11 * py + w12 * pz + t[1]
    z = w20 * px + w21 * py + w22 * pz + t[2]
    z_safe = jnp.where(z > NEAR_CULL, z, 1.0)
    inv_z = 1.0 / z_safe

    u = intr.fx * x * inv_z + intr.cx
    v = intr.fy * y * inv_z + intr.cy

    # EWA: clamp the tangent-plane offsets like the CUDA preprocess
    # (limits = 1.3 * tan(fov/2)) to bound the Jacobian off-axis.
    lim_x = 1.3 * (intr.width / (2.0 * intr.fx))
    lim_y = 1.3 * (intr.height / (2.0 * intr.fy))
    tx = jnp.clip(x * inv_z, -lim_x, lim_x)
    ty = jnp.clip(y * inv_z, -lim_y, lim_y)

    # Rows of JW where J = [[fx/z, 0, -fx tx/z], [0, fy/z, -fy ty/z]]
    # (tx, ty are the clamped x/z, y/z): a_i = J[0,:] @ W, b_i = J[1,:] @ W.
    fxz = intr.fx * inv_z
    fyz = intr.fy * inv_z
    a0 = fxz * (w00 - tx * w20)
    a1 = fxz * (w01 - tx * w21)
    a2 = fxz * (w02 - tx * w22)
    b0 = fyz * (w10 - ty * w20)
    b1 = fyz * (w11 - ty * w21)
    b2 = fyz * (w12 - ty * w22)

    # Rotation matrix from quaternion, expanded (general_utils.py:113-136).
    qw, qx, qy, qz = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    qn = jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz) + _EPS
    qw, qx, qy, qz = qw / qn, qx / qn, qy / qn, qz / qn
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)

    s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]
    # M = JW @ R_q (2x3), then columns scaled: cov2d = (M*s^2) @ M^T.
    m00 = a0 * r00 + a1 * r10 + a2 * r20
    m01 = a0 * r01 + a1 * r11 + a2 * r21
    m02 = a0 * r02 + a1 * r12 + a2 * r22
    m10 = b0 * r00 + b1 * r10 + b2 * r20
    m11 = b0 * r01 + b1 * r11 + b2 * r21
    m12 = b0 * r02 + b1 * r12 + b2 * r22
    s0_sq, s1_sq, s2_sq = s0 * s0, s1 * s1, s2 * s2
    c00 = m00 * m00 * s0_sq + m01 * m01 * s1_sq + m02 * m02 * s2_sq
    c01 = m00 * m10 * s0_sq + m01 * m11 * s1_sq + m02 * m12 * s2_sq
    c11 = m10 * m10 * s0_sq + m11 * m11 * s1_sq + m12 * m12 * s2_sq
    c00 = c00 + COV2D_DILATION
    c11 = c11 + COV2D_DILATION

    det = c00 * c11 - c01 * c01
    det_safe = jnp.where(det > 0, det, 1.0)
    inv_det = 1.0 / det_safe

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

    return ProjectedChannels(
        u=u, v=v,
        ca=c11 * inv_det, cb=-c01 * inv_det, cc=c00 * inv_det,
        depth=z,
        radius=jnp.where(valid, radius, 0.0),
        opacity=opacities,
        valid=valid,
    )


def project_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    rgbs: jnp.ndarray,        # (N,3) passed through
    R_w2c: jnp.ndarray,
    t_w2c: jnp.ndarray,
    rho: jnp.ndarray,
    theta: jnp.ndarray,
    intr: Intrinsics,
    active: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Matrix-shaped wrapper over project_gaussians_ch (general API; the hot
    rasterization path consumes the channel form directly)."""
    p = project_gaussians_ch(
        means3d, scales, quats, opacities, R_w2c, t_w2c, rho, theta, intr,
        active=active,
    )
    return ProjectedGaussians(
        mean2d=jnp.stack([p.u, p.v], axis=-1),
        depth=p.depth,
        conic=jnp.stack([p.ca, p.cb, p.cc], axis=-1),
        radius=p.radius,
        rgb=rgbs,
        opacity=p.opacity,
        valid=p.valid,
    )
