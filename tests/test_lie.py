"""Property tests for SE(3)/SO(3) (SURVEY.md §4 implication: property-test
exp/retraction, finite-difference-check gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monogs_tpu.ops import lie

jax.config.update("jax_enable_x64", False)


def _random_vec(key, scale=1.0):
    return scale * jax.random.normal(key, (3,))


@pytest.mark.parametrize("scale", [1e-9, 1e-5, 0.1, 1.0, 3.0])
def test_so3_exp_is_rotation(scale):
    theta = _random_vec(jax.random.PRNGKey(0), scale)
    R = lie.so3_exp(theta)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_so3_exp_matches_rodrigues():
    theta = jnp.array([0.3, -0.2, 0.5])
    angle = float(jnp.linalg.norm(theta))
    axis = np.asarray(theta) / angle
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R_expected = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
    np.testing.assert_allclose(lie.so3_exp(theta), R_expected, atol=1e-6)


def test_so3_log_roundtrip():
    for seed in range(5):
        theta = _random_vec(jax.random.PRNGKey(seed), 0.8)
        np.testing.assert_allclose(
            lie.so3_log(lie.so3_exp(theta)), theta, atol=1e-5
        )


def test_se3_exp_zero_is_identity():
    np.testing.assert_allclose(lie.se3_exp(jnp.zeros(6)), np.eye(4), atol=1e-7)


def test_se3_exp_small_angle_continuity():
    """Taylor branch and exact branch agree near the switch point."""
    for eps in [1e-5, 2e-4]:
        tau = jnp.array([0.1, -0.2, 0.3, eps, -eps, eps * 0.5])
        T = lie.se3_exp(tau)
        # Compare against high-precision numpy via scipy-free matrix exp:
        import numpy.linalg as la

        xi = np.zeros((4, 4))
        xi[:3, :3] = np.asarray(lie.skew(tau[3:]))
        xi[:3, 3] = np.asarray(tau[:3])
        # Matrix exponential by scaling and squaring of the series.
        E = np.eye(4)
        term = np.eye(4)
        for k in range(1, 12):
            term = term @ xi / k
            E = E + term
        np.testing.assert_allclose(T, E, atol=1e-6)


def test_apply_pose_delta_composition():
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    R = lie.so3_exp(_random_vec(k1))
    t = _random_vec(k2)
    rho, theta = _random_vec(k3, 0.1), _random_vec(k4, 0.1)
    R2, t2 = lie.apply_pose_delta(R, t, rho, theta)
    T_old = np.eye(4); T_old[:3, :3] = R; T_old[:3, 3] = t
    T_new = np.asarray(lie.se3_exp(jnp.concatenate([rho, theta]))) @ T_old
    np.testing.assert_allclose(R2, T_new[:3, :3], atol=1e-6)
    np.testing.assert_allclose(t2, T_new[:3, 3], atol=1e-6)


def test_pose_delta_gradients_finite_difference():
    """d/d(rho,theta) of a scalar function of the retracted pose."""
    key = jax.random.PRNGKey(7)
    R = lie.so3_exp(_random_vec(key))
    t = jnp.array([0.5, -1.0, 2.0])
    p = jnp.array([0.3, 0.7, 2.5])

    def f(delta):
        rho, theta = delta[:3], delta[3:]
        R2, t2 = lie.apply_pose_delta(R, t, rho, theta)
        q = R2 @ p + t2
        return jnp.sum(jnp.sin(q) * q)

    delta0 = jnp.zeros(6)
    g = jax.grad(f)(delta0)
    eps = 1e-4
    for i in range(6):
        e = jnp.zeros(6).at[i].set(eps)
        fd = (f(e) - f(-e)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-3, atol=1e-5)


def test_quat_to_rotmat_identity_and_norm():
    q = jnp.array([[1.0, 0, 0, 0], [2.0, 0, 0, 0]])
    R = lie.quat_to_rotmat(q)
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(R[1], np.eye(3), atol=1e-6)  # unnormalized ok


def test_quat_to_rotmat_matches_so3_exp():
    theta = jnp.array([0.2, -0.1, 0.4])
    angle = jnp.linalg.norm(theta)
    axis = theta / angle
    q = jnp.concatenate(
        [jnp.cos(angle / 2)[None], jnp.sin(angle / 2) * axis]
    )
    np.testing.assert_allclose(
        lie.quat_to_rotmat(q), lie.so3_exp(theta), atol=1e-5
    )


def test_pose_chain_precision_pin_is_present():
    """Platform-independent guard for the round-2 TPU numerics fix: every
    pose-chain matmul in ops/lie.py must pin Precision.HIGHEST. On the TPU
    MXU a default-precision f32 matmul runs as bf16 and det(R_est)
    random-walked to 1.54 over ~4k composes (tracking collapsed). XLA:CPU
    ignores the precision config entirely, so a behavioral test under
    jax.default_matmul_precision('bfloat16') is vacuous here (ADVICE r2) —
    assert the pin itself instead."""
    assert lie._mm.keywords["precision"] == jax.lax.Precision.HIGHEST


def _chain_det_drift(mm, n=300):
    """|det(R)-1| after n random retractions composed with matmul `mm`."""
    R = jnp.eye(3)
    t = jnp.zeros(3)
    key = jax.random.PRNGKey(1)

    def step(R, t, rho, theta):
        dT = lie.se3_exp(jnp.concatenate([rho, theta]))
        return mm(dT[:3, :3], R), mm(dT[:3, :3], t[:, None])[:, 0] + dT[:3, 3]

    step = jax.jit(step)
    for _ in range(n):
        key, k1, k2 = jax.random.split(key, 3)
        R, t = step(
            R, t,
            1e-3 * jax.random.normal(k1, (3,)),
            3e-3 * jax.random.normal(k2, (3,)),
        )
    return abs(float(jnp.linalg.det(R)) - 1.0)


def test_pose_composition_bf16_drift_reproduces_and_f32_holds():
    """Reproduce the TPU failure mode on any platform by casting the
    compose-chain matmul operands to bf16 explicitly (what the MXU does at
    default precision), and show the pinned-f32 chain holds SO(3). This
    exercises the failure the Precision.HIGHEST pin exists to prevent."""

    def bf16_mm(a, b):
        return jnp.matmul(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
        ).astype(jnp.float32)

    drift_bf16 = _chain_det_drift(bf16_mm)
    drift_f32 = _chain_det_drift(lie._mm)
    assert drift_f32 < 1e-4, drift_f32
    assert drift_bf16 > 10 * max(drift_f32, 1e-6), (drift_bf16, drift_f32)
