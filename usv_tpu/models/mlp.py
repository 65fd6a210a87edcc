"""Policy/value networks (flax.linen).

Architectures sized to the reference's hyperparameters
(``train_test/config.py``): SAC nets 400x300 with log_std_init=-3 (:32-33),
PPO pi/vf 256x256 with log_std_init=-2 (:12-14). The reference's policies are
plain MLPs over (frame-stacked) observations — these are the MXU path of the
framework, so hidden widths stay multiples of common tile sizes where
possible and the matmuls run in bf16 with f32 accumulation when
``compute_dtype`` is set.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LOG_STD_MIN = -20.0
LOG_STD_MAX = 2.0


class MLP(nn.Module):
    features: Sequence[int]
    activation: Callable = nn.relu
    activate_final: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.compute_dtype, name=f"dense_{i}")(x)
            if i < len(self.features) - 1 or self.activate_final:
                x = self.activation(x)
        return x.astype(jnp.float32)


class SquashedGaussianActor(nn.Module):
    """tanh-squashed Gaussian policy (SAC), action scaled to [low, high].

    With ``use_sde`` (the reference's ``use_sde: True``, config.py:18), the
    per-action std is the gSDE marginal ``sqrt(phi(s)^2 @ sigma^2)`` over the
    trunk features phi(s); updates sample with that marginal (exactly the
    distribution induced by ``phi @ (sigma * E)``), while collection may use
    an explicit exploration matrix via :meth:`sample_sde` for temporally
    smooth noise.
    """

    action_dim: int
    hidden: Sequence[int] = (400, 300)  # config.py:33
    log_std_init: float = -3.0          # config.py:32
    action_low: Tuple[float, ...] = (-1.0, -1.0)
    action_high: Tuple[float, ...] = (1.0, 1.0)
    use_sde: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        trunk = MLP(
            self.hidden, activate_final=True, compute_dtype=self.compute_dtype
        )(obs)
        mean = nn.Dense(self.action_dim, name="mean")(trunk)
        if self.use_sde:
            log_std_mat = self.param(
                "log_std_sde",
                nn.initializers.constant(self.log_std_init),
                (self.hidden[-1], self.action_dim),
            )
            from usv_tpu.models.sde import sde_std

            log_std = jnp.log(sde_std(trunk, log_std_mat))
        else:
            log_std = nn.Dense(
                self.action_dim,
                name="log_std",
                bias_init=nn.initializers.constant(self.log_std_init),
            )(trunk)
        log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
        return mean, log_std

    @nn.compact
    def latent(self, obs):
        """Trunk features phi(s) plus mean and the gSDE log-std matrix."""
        trunk = MLP(
            self.hidden, activate_final=True, compute_dtype=self.compute_dtype
        )(obs)
        mean = nn.Dense(self.action_dim, name="mean")(trunk)
        log_std_mat = self.param(
            "log_std_sde",
            nn.initializers.constant(self.log_std_init),
            (self.hidden[-1], self.action_dim),
        )
        return trunk, mean, log_std_mat

    def _scale(self, squashed):
        low = jnp.asarray(self.action_low)
        high = jnp.asarray(self.action_high)
        return low + 0.5 * (squashed + 1.0) * (high - low)

    def sample(self, params, obs, key):
        """Reparameterized sample -> (action, log_prob, mean_action)."""
        mean, log_std = self.apply(params, obs)
        std = jnp.exp(log_std)
        noise = jax.random.normal(key, mean.shape)
        pre_tanh = mean + std * noise
        squashed = jnp.tanh(pre_tanh)

        # log prob with tanh correction
        gauss_logp = -0.5 * (
            jnp.square(noise) + 2.0 * log_std + jnp.log(2.0 * jnp.pi)
        ).sum(-1)
        logp = gauss_logp - jnp.log(1.0 - jnp.square(squashed) + 1e-6).sum(-1)
        return self._scale(squashed), logp, self._scale(jnp.tanh(mean))

    def sample_sde(self, params, obs, sde_state):
        """Collection-time gSDE sample: a = tanh(mean + phi(s) @ (sigma*E))."""
        from usv_tpu.models.sde import sde_noise

        trunk, mean, log_std_mat = self.apply(params, obs, method=self.latent)
        noise = sde_noise(trunk, log_std_mat, sde_state)
        return self._scale(jnp.tanh(mean + noise))

    def deterministic(self, params, obs):
        mean, _ = self.apply(params, obs)
        return self._scale(jnp.tanh(mean))


class DoubleCritic(nn.Module):
    """Twin Q-networks (clipped double Q, SB3 SAC default)."""

    hidden: Sequence[int] = (400, 300)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        q1 = MLP(
            (*self.hidden, 1), compute_dtype=self.compute_dtype, name="q1"
        )(x)
        q2 = MLP(
            (*self.hidden, 1), compute_dtype=self.compute_dtype, name="q2"
        )(x)
        return q1.squeeze(-1), q2.squeeze(-1)


class PpoActorCritic(nn.Module):
    """Gaussian actor + value head with separate trunks (config_ppo:12-14).

    With ``use_sde`` (config_ppo:4-5) the policy std is the gSDE marginal
    over the pi-trunk features; collection can draw temporally smooth noise
    via :meth:`sample_sde` with an exploration-matrix state.
    """

    action_dim: int
    pi_hidden: Sequence[int] = (256, 256)
    vf_hidden: Sequence[int] = (256, 256)
    log_std_init: float = -2.0
    use_sde: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        """Returns (mean, per-state log_std, value, pi_latent)."""
        pi_trunk = MLP(
            self.pi_hidden, activate_final=True,
            compute_dtype=self.compute_dtype, name="pi_trunk",
        )(obs)
        mean = nn.Dense(self.action_dim, name="pi_mean")(pi_trunk)
        if self.use_sde:
            log_std_mat = self.param(
                "log_std",
                nn.initializers.constant(self.log_std_init),
                (self.pi_hidden[-1], self.action_dim),
            )
            from usv_tpu.models.sde import sde_std

            log_std = jnp.log(sde_std(pi_trunk, log_std_mat))
        else:
            log_std = self.param(
                "log_std",
                nn.initializers.constant(self.log_std_init),
                (self.action_dim,),
            )
            log_std = jnp.broadcast_to(log_std, mean.shape)
        vf_trunk = MLP(
            self.vf_hidden, activate_final=True,
            compute_dtype=self.compute_dtype, name="vf_trunk",
        )(obs)
        value = nn.Dense(1, name="vf_out")(vf_trunk).squeeze(-1)
        return mean, log_std, value, pi_trunk

    @nn.compact
    def value_only(self, obs):
        """Value head alone (same vf_trunk/vf_out params as __call__) — for
        truncation bootstraps, where the pi-side forward would be wasted."""
        vf_trunk = MLP(
            self.vf_hidden, activate_final=True,
            compute_dtype=self.compute_dtype, name="vf_trunk",
        )(obs)
        return nn.Dense(1, name="vf_out")(vf_trunk).squeeze(-1)

    def sample(self, params, obs, key):
        mean, log_std, value, _ = self.apply(params, obs)
        std = jnp.exp(log_std)
        noise = jax.random.normal(key, mean.shape)
        action = mean + std * noise
        logp = -0.5 * (
            jnp.square(noise) + 2.0 * log_std + jnp.log(2.0 * jnp.pi)
        ).sum(-1)
        return action, logp, value

    def sample_sde(self, params, obs, sde_state):
        """Collection-time gSDE sample; log-prob under the marginal std."""
        from usv_tpu.models.sde import sde_noise

        mean, log_std, value, latent = self.apply(params, obs)
        # reconstruct sigma * E noise from the trunk features
        log_std_mat = params["params"]["log_std"]
        noise = sde_noise(latent, log_std_mat, sde_state)
        action = mean + noise
        std = jnp.exp(log_std)
        z = (action - mean) / std
        logp = -0.5 * (
            jnp.square(z) + 2.0 * log_std + jnp.log(2.0 * jnp.pi)
        ).sum(-1)
        return action, logp, value

    def log_prob(self, params, obs, action):
        mean, log_std, value, _ = self.apply(params, obs)
        std = jnp.exp(log_std)
        z = (action - mean) / std
        logp = -0.5 * (
            jnp.square(z) + 2.0 * log_std + jnp.log(2.0 * jnp.pi)
        ).sum(-1)
        entropy = (log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e)).sum(-1)
        entropy = jnp.broadcast_to(entropy, logp.shape)
        return logp, entropy, value
