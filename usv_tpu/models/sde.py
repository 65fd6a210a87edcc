"""Generalized state-dependent exploration (gSDE).

Capability match for the reference's ``use_sde: True`` + ``sde_sample_freq: 4``
(train_test/config.py:4-5,18-19; SB3 gSDE, Raffin et al. 2021). Exploration
noise is a linear function of the policy's latent features,

    a = mu(s) + phi(s) @ E,      E_ij ~ N(0, sigma_ij),

with the exploration matrix ``E`` resampled every ``sde_sample_freq`` env
steps instead of per step — smooth exploration suited to control tasks. The
per-state marginal is Gaussian with variance ``phi(s)^2 @ sigma^2``, which is
what log-probs are computed from.

Pure-functional: the exploration matrices are explicit state
(:class:`SdeState`) threaded through collection loops; ``maybe_resample``
implements the every-k-steps schedule branch-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


@struct.dataclass
class SdeState:
    exploration_mat: jnp.ndarray  # (..., latent_dim, action_dim)
    step: jnp.ndarray             # (...,) int32 steps since last resample


def init_sde(key, latent_dim, action_dim, batch_shape=()):
    mat = jax.random.normal(key, (*batch_shape, latent_dim, action_dim))
    return SdeState(
        exploration_mat=mat,
        step=jnp.zeros(batch_shape, jnp.int32),
    )


def maybe_resample(state: SdeState, key, sample_freq: int) -> SdeState:
    """Resample E where the per-env counter hits the schedule."""
    fresh = jax.random.normal(key, state.exploration_mat.shape)
    due = (state.step % sample_freq) == 0
    mat = jnp.where(
        due[..., None, None] if due.ndim else due, fresh, state.exploration_mat
    )
    return SdeState(exploration_mat=mat, step=state.step + 1)


def sde_noise(latent, log_std, state: SdeState):
    """phi(s) @ (sigma * E) -> (..., action_dim) noise."""
    sigma = jnp.exp(jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX))
    weighted = sigma * state.exploration_mat  # (..., L, A)
    return jnp.einsum("...l,...la->...a", latent, weighted)


def sde_std(latent, log_std):
    """Marginal per-state std: sqrt(phi^2 @ sigma^2)."""
    sigma2 = jnp.exp(2.0 * jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX))
    var = jnp.einsum("...l,...la->...a", jnp.square(latent), sigma2)
    return jnp.sqrt(var + 1e-6)


def sde_log_prob(action, mean, latent, log_std):
    std = sde_std(latent, log_std)
    z = (action - mean) / std
    return -0.5 * (
        jnp.square(z) + 2.0 * jnp.log(std) + jnp.log(2.0 * jnp.pi)
    ).sum(-1)


def sde_entropy(latent, log_std):
    std = sde_std(latent, log_std)
    return (jnp.log(std) + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e)).sum(-1)
