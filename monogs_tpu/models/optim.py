"""Masked per-group Adam for the Gaussian map (pure JAX, jittable).

TPU-native replacement for the reference's torch.optim.Adam parameter groups
plus "optimizer-state surgery" (gaussian_model.py:398-777): because the map
is a static-capacity struct-of-arrays pytree, densify/prune do masked writes
on the Adam moments (zeroing new/replaced rows — the reference's policy at
gaussian_model.py:647-648,707-713) instead of tensor concat/slice surgery.

The moments live in a pytree shaped exactly like the parameter pytree, so
row-level surgery is one tree_map away and the whole optimizer state rides
through jit/shard/checkpoint with the map.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ADAM_EPS = 1e-15  # reference gaussian_model.py:438 (Adam eps per group)


class AdamState(NamedTuple):
    mu: dict        # first moments, same structure as params dict
    nu: dict        # second moments
    step: jnp.ndarray  # () int32 shared step count


def init_adam(params: dict) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def adam_step(
    params: dict,
    grads: dict,
    state: AdamState,
    lrs: dict,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = ADAM_EPS,
):
    """One Adam step with per-leaf learning rates (dict matching params)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

    def upd(p, m, v, lr):
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps)

    new_params = jax.tree.map(upd, params, mu, nu, lrs)
    return new_params, AdamState(mu=mu, nu=nu, step=step)


def mask_rows(state: AdamState, row_mask: jnp.ndarray) -> AdamState:
    """Zero the Adam moments of rows where row_mask is True (new/replaced
    Gaussians — reference policy gaussian_model.py:647-648,707-713)."""

    def z(x):
        m = row_mask
        while m.ndim < x.ndim:
            m = m[..., None]
        return jnp.where(m, 0.0, x)

    return AdamState(
        mu=jax.tree.map(z, state.mu), nu=jax.tree.map(z, state.nu),
        step=state.step,
    )


def zero_leaf(state: AdamState, leaf_name: str) -> AdamState:
    """Zero the moments of one parameter leaf (used by opacity reset, the
    replace_tensor_to_optimizer analogue, gaussian_model.py:642-656)."""
    mu = dict(state.mu)
    nu = dict(state.nu)
    mu[leaf_name] = jnp.zeros_like(mu[leaf_name])
    nu[leaf_name] = jnp.zeros_like(nu[leaf_name])
    return AdamState(mu=mu, nu=nu, step=state.step)


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: float,
             lr_delay_mult: float, max_steps: float):
    """Exponential LR schedule (reference general_utils.py:79-94)."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t
    )
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp
