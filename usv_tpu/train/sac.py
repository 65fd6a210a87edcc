"""SAC learner with CAPS action-smoothness regularization.

Re-implements the training capability of the reference's patched SB3 SAC
(``train_test/config.py:17-37``): twin critics, auto-tuned entropy
temperature, soft target updates, ``train_freq = gradient_steps = 8``,
400x300 nets, lr 1e-4, buffer 400k, batch 256, learning_starts 50k — plus the
CAPS smoothness terms implied by ``lambda_t/lambda_s/eps_s`` (config.py:34-36;
CAPS = "Regularizing Action Policies for Smooth Control", Mysore et al.):

    L_T = lambda_t * E ||pi(s_t) - pi(s_{t+1})||^2        (temporal)
    L_S = lambda_s * E ||pi(s) - pi(s~)||^2, s~ ~ N(s, eps_s)  (spatial)

TPU-first design: the entire {collect train_freq env steps -> gradient_steps
updates} cycle is ONE jitted program (``train_rounds`` runs many cycles under
``lax.scan``), so a training run is a handful of device dispatches regardless
of length — environment, replay buffer, and learner never leave the device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from usv_tpu.envs.autoreset import make_autoreset_step
from usv_tpu.envs.registry import EnvHandle
from usv_tpu.models.mlp import DoubleCritic, SquashedGaussianActor
from usv_tpu.train.buffer import (
    ReplayBuffer,
    buffer_add_batch,
    buffer_add_traj_local,
    buffer_init,
    buffer_sample,
    buffer_sample_local,
)
from usv_tpu.vector.frames import init_frames, push_frames


@dataclasses.dataclass(frozen=True)
class SacConfig:
    # SB3-matching hyperparameters (train_test/config.py:17-37)
    buffer_size: int = 400_000
    batch_size: int = 256
    learning_rate: float = 1e-4
    # optional linear lr decay over the first lr_decay_steps GRADIENT steps
    # (to lr * lr_final_fraction, held constant after). The reference uses a
    # constant lr (config.py:23); this is a tuning lever for closing the
    # sample-efficiency gap of fused/at-scale configs.
    lr_decay_steps: Optional[int] = None
    lr_final_fraction: float = 0.1
    gamma: float = 0.99
    tau: float = 0.005          # SB3 default (config passes none)
    train_freq: int = 8
    gradient_steps: int = 8
    learning_starts: int = 50_000
    hidden: Tuple[int, int] = (400, 300)
    log_std_init: float = -3.0
    # CAPS smoothness (config.py:34-36)
    lambda_t: float = 10.0
    lambda_s: float = 5.0
    eps_s: float = 0.1
    # gSDE exploration (config.py:18-19; SB3 use_sde + sde_sample_freq).
    # Updates always use the exact marginal distribution; this flag makes
    # collection noise temporally smooth via exploration matrices. Defaults
    # True to match the reference's config_sac (train_test/config.py:18);
    # set False / pass --no-sde for plain per-step Gaussian collection.
    use_sde: bool = True
    sde_sample_freq: int = 4
    # vector-env setup
    num_envs: int = 64
    frame_stack: int = 5        # FrameStack(5), sb3_train.py:51
    # TPU throughput options (beyond the reference's SB3 semantics):
    # compute_dtype="bfloat16" runs the MLP matmuls on the MXU in bf16
    # (params and optimizer state stay f32). update_fusion=k folds k of the
    # gradient_steps sequential updates into one update on a k*batch_size
    # batch: same sample:update FLOP ratio, 1/k the sequential depth (the
    # latency bound at SB3-like tiny batches) — but also 1/k the optimizer
    # steps, so large k trades sample efficiency for wall-clock (measured in
    # docs/PERFORMANCE.md; consider scaling the lr with k). fused_updates=True
    # is shorthand for full fusion (k = gradient_steps).
    compute_dtype: str = "float32"
    fused_updates: bool = False
    update_fusion: int = 1
    # Shard-local replay (multi-chip scaling; docs/SCALING.md): insert and
    # sample the replay buffer per mesh shard, so the only steady-state
    # cross-chip traffic is the gradient psum. Requires passing ``mesh=`` to
    # the learner; num_envs, batch_size and the replay capacity must divide
    # the mesh's env axis. Sampling is stratified-uniform (equal rows per
    # shard) — equal in marginal distribution to global uniform sampling.
    shard_local_replay: bool = False
    # action bounds; None derives them from the env config
    action_low: Optional[Tuple[float, ...]] = None
    action_high: Optional[Tuple[float, ...]] = None
    # Numerical guard (utils/guards.py): the hydrodynamic env families can
    # diverge in long episodes (ASMC adaptive-gain windup under random/bad
    # actions -> float32 overflow within one substep block; observed on
    # usv-asmc-ca-v0 after ~750 random-action steps). Without the guard one
    # NaN env poisons the replay buffer and the whole run. Default ON:
    # diverged envs terminate (reward 0, sanitized obs) and auto-reset;
    # info["diverged"] counts occurrences.
    sanitize_envs: bool = True


@struct.dataclass
class SacTrainState:
    actor_params: dict
    critic_params: dict
    target_critic_params: dict
    log_alpha: jnp.ndarray
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    alpha_opt: optax.OptState
    buffer: ReplayBuffer
    env_state: object           # vmapped env-state pytree
    frames: jnp.ndarray         # (B, S, obs_dim) rolling stack; the current
                                # stacked obs is frames.reshape(B, -1)
    key: jnp.ndarray
    env_steps: jnp.ndarray      # () int64-ish counter (int32)
    grad_steps: jnp.ndarray
    sde: object = None          # SdeState when cfg.use_sde


class SacLearner:
    """Actor-learner bound to one env family (fully on-device)."""

    def __init__(self, handle: EnvHandle, config: SacConfig = SacConfig(),
                 mesh=None):
        self.handle = handle
        self.cfg = config
        self.mesh = mesh
        if config.shard_local_replay:
            if mesh is None:
                raise ValueError(
                    "shard_local_replay=True needs the device mesh: "
                    "SacLearner(handle, cfg, mesh=make_env_mesh())"
                )
            n = mesh.devices.size
            if config.num_envs % n or config.batch_size % n:
                raise ValueError(
                    f"num_envs ({config.num_envs}) and batch_size "
                    f"({config.batch_size}) must divide the mesh size ({n})"
                )
        env_cfg = handle.cfg
        self.obs_dim = env_cfg.obs_dim * max(1, config.frame_stack)
        self.act_dim = env_cfg.action_dim
        self.action_low = tuple(
            config.action_low if config.action_low is not None
            else env_cfg.action_low
        )
        self.action_high = tuple(
            config.action_high if config.action_high is not None
            else env_cfg.action_high
        )

        compute_dtype = jnp.dtype(config.compute_dtype)
        self.actor = SquashedGaussianActor(
            action_dim=self.act_dim,
            hidden=config.hidden,
            log_std_init=config.log_std_init,
            action_low=self.action_low,
            action_high=self.action_high,
            use_sde=config.use_sde,
            compute_dtype=compute_dtype,
        )
        self.critic = DoubleCritic(
            hidden=config.hidden, compute_dtype=compute_dtype
        )
        self.target_entropy = -float(self.act_dim)  # SB3 'auto'

        if config.lr_decay_steps:
            lr = optax.linear_schedule(
                config.learning_rate,
                config.learning_rate * config.lr_final_fraction,
                config.lr_decay_steps,
            )
        else:
            lr = config.learning_rate
        self.actor_tx = optax.adam(lr)
        self.critic_tx = optax.adam(lr)
        self.alpha_tx = optax.adam(lr)

        # Round the replay capacity up to a multiple of the per-round write
        # block (train_freq * num_envs rows) so inserts stay aligned and
        # never wrap mid-batch — keeps buffer_add_batch on its
        # dynamic_update_slice fast path (a batched scatter serializes under
        # the population vmap).
        self._fusion = (
            config.gradient_steps if config.fused_updates
            else max(1, config.update_fusion)
        )
        if config.gradient_steps % self._fusion:
            raise ValueError(
                f"update_fusion={self._fusion} must divide "
                f"gradient_steps={config.gradient_steps}"
            )

        block = config.train_freq * config.num_envs
        self.buffer_capacity = -(-config.buffer_size // block) * block
        if self.buffer_capacity != config.buffer_size:
            import warnings

            warnings.warn(
                f"replay capacity rounded {config.buffer_size} -> "
                f"{self.buffer_capacity} (multiple of train_freq*num_envs="
                f"{block} for aligned writes). Checkpoints depend on the "
                "exact capacity — keep train_freq/num_envs fixed across "
                "save/resume, or set buffer_size to a multiple yourself."
            )

        step_fn = handle.step
        if config.sanitize_envs:
            from usv_tpu.utils.guards import make_sanitized_step

            _san = make_sanitized_step(handle.step, env_cfg)

            def step_fn(cfg_, state, action):
                return _san(state, action)

        self._auto_step = jax.vmap(
            make_autoreset_step(
                env_cfg, step_fn, handle.reset, handle.reset_obs
            )
        )
        self._jit_init = jax.jit(self._init_impl)
        self._jit_rounds = {}
        self._jit_eval = {}
        self._jit_watch = None

    # ------------------------------------------------------------------ init

    def _init_impl(self, key) -> SacTrainState:
        cfg = self.cfg
        k_actor, k_critic, k_env, key = jax.random.split(key, 4)
        dummy_obs = jnp.zeros((1, self.obs_dim))
        dummy_act = jnp.zeros((1, self.act_dim))
        actor_params = self.actor.init(k_actor, dummy_obs)
        critic_params = self.critic.init(k_critic, dummy_obs, dummy_act)

        env_keys = jax.random.split(k_env, cfg.num_envs)
        env_state = jax.vmap(lambda k: self.handle.reset(self.handle.cfg, k))(env_keys)
        obs0 = jax.vmap(lambda s: self.handle.reset_obs(self.handle.cfg, s))(env_state)
        frames = init_frames(obs0, cfg.frame_stack)

        sde = None
        if cfg.use_sde:
            from usv_tpu.models.sde import init_sde

            key, k_sde = jax.random.split(key)
            sde = init_sde(
                k_sde, cfg.hidden[-1], self.act_dim,
                batch_shape=(cfg.num_envs,),
            )

        return SacTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=critic_params,
            log_alpha=jnp.zeros(()),
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            alpha_opt=self.alpha_tx.init(jnp.zeros(())),
            buffer=buffer_init(self.buffer_capacity, self.obs_dim, self.act_dim),
            env_state=env_state,
            frames=frames,
            key=key,
            env_steps=jnp.zeros((), jnp.int32),
            grad_steps=jnp.zeros((), jnp.int32),
            sde=sde,
        )

    def init(self, seed: int = 0) -> SacTrainState:
        return self._jit_init(jax.random.key(seed))

    # ----------------------------------------------------------- collection

    def _policy_action(self, ts: SacTrainState, obs, key, random_phase, sde=None):
        """Random uniform during warmup, else squashed-Gaussian sample
        (temporally smooth gSDE noise when enabled).

        ``random_phase`` is a scalar, so ``lax.cond`` executes only the live
        branch — no actor forward during warmup, no uniform draw after.
        (Under the population vmap the cond lowers back to a select; warmup
        is cheap relative to a population run anyway.)"""
        low = jnp.asarray(self.action_low)
        high = jnp.asarray(self.action_high)
        k1, k2 = jax.random.split(key)

        def rand_branch(_):
            return jax.random.uniform(
                k1, (obs.shape[0], self.act_dim), minval=low, maxval=high
            )

        def actor_branch(_):
            if self.cfg.use_sde:
                return self.actor.sample_sde(ts.actor_params, obs, sde)
            return self.actor.sample(ts.actor_params, obs, k2)[0]

        return jax.lax.cond(random_phase, rand_branch, actor_branch, None)

    def _env_cycle(self, ts: SacTrainState, key):
        """train_freq env steps on all envs, then ONE buffer insert.

        The buffer stays OUT of the inner scan carry: carrying the multi-GB
        replay arrays through a scan costs a full copy at the scan boundary
        (measured ~3 ms/GB/round on v5e); collecting the transitions as
        stacked scan outputs and inserting the (train_freq*B)-row block once
        per round keeps the buffer in place (the insert is a single aligned
        dynamic_update_slice — capacity is rounded to a multiple of the
        block in __init__).
        """
        cfg = self.cfg

        # static threshold in SCAN-STEP units: env_steps * num_envs would
        # overflow int32 past 2^31 total env steps and silently re-enter the
        # uniform-random collection phase
        warmup_scan_steps = -(-cfg.learning_starts // cfg.num_envs)

        def one_step(carry, step_key):
            env_state, frames, env_steps, sde = carry
            obs = frames.reshape(frames.shape[0], -1)
            random_phase = env_steps < warmup_scan_steps
            k_resample, k_action = jax.random.split(step_key)
            if cfg.use_sde:
                from usv_tpu.models.sde import maybe_resample

                sde = maybe_resample(sde, k_resample, cfg.sde_sample_freq)
            actions = self._policy_action(ts, obs, k_action, random_phase, sde)
            env_state, step_ts = self._auto_step(env_state, actions)
            new_frames = push_frames(frames, step_ts.obs, step_ts.done)
            # next_obs for the buffer: terminal obs continuation (frames
            # shifted with the terminal observation, not the reset one)
            terminal_frames = jnp.concatenate(
                [frames[:, 1:, :], step_ts.info["terminal_observation"][:, None, :]],
                axis=1,
            )
            transition = dict(
                obs=obs,
                action=actions,
                reward=step_ts.reward,
                next_obs=terminal_frames.reshape(obs.shape[0], -1),
                done=step_ts.terminated.astype(jnp.float32),
            )
            return (
                (env_state, new_frames, env_steps + 1, sde),
                (transition, jnp.sum(step_ts.reward)),
            )

        keys = jax.random.split(key, cfg.train_freq)
        (env_state, frames, env_steps, sde), (traj, rewards) = jax.lax.scan(
            one_step,
            (ts.env_state, ts.frames, ts.env_steps, ts.sde),
            keys,
        )
        if cfg.shard_local_replay:
            # each shard appends its own envs' (T, B/n) block locally —
            # no cross-chip traffic on insert (docs/SCALING.md)
            buffer = buffer_add_traj_local(ts.buffer, traj, self.mesh)
        else:
            # flatten (T, B, ...) -> (T*B, ...): step-major, matching the
            # reference's per-step insertion order
            flat = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), traj
            )
            buffer = buffer_add_batch(
                ts.buffer, flat["obs"], flat["action"], flat["reward"],
                flat["next_obs"], flat["done"], aligned=True,
            )
        ts = ts.replace(
            env_state=env_state, frames=frames,
            buffer=buffer, env_steps=env_steps, sde=sde,
        )
        return ts, jnp.sum(rewards)

    # -------------------------------------------------------------- updates

    def _sample(self, buffer, key, batch_size):
        if self.cfg.shard_local_replay:
            return buffer_sample_local(buffer, key, batch_size, self.mesh)
        return buffer_sample(buffer, key, batch_size)

    def _critic_loss(self, critic_params, ts: SacTrainState, batch, key):
        cfg = self.cfg
        next_action, next_logp, _ = self.actor.sample(
            ts.actor_params, batch["next_obs"], key
        )
        q1_t, q2_t = self.critic.apply(
            ts.target_critic_params, batch["next_obs"], next_action
        )
        alpha = jnp.exp(ts.log_alpha)
        target_v = jnp.minimum(q1_t, q2_t) - alpha * next_logp
        target_q = batch["reward"] + cfg.gamma * (1.0 - batch["done"]) * target_v
        target_q = jax.lax.stop_gradient(target_q)
        q1, q2 = self.critic.apply(critic_params, batch["obs"], batch["action"])
        return 0.5 * (
            jnp.mean(jnp.square(q1 - target_q))
            + jnp.mean(jnp.square(q2 - target_q))
        )

    def _actor_loss(self, actor_params, ts: SacTrainState, batch, key):
        cfg = self.cfg
        k_sample, k_spatial = jax.random.split(key)
        action, logp, _mean_action = self.actor.sample(
            actor_params, batch["obs"], k_sample
        )
        q1, q2 = self.critic.apply(ts.critic_params, batch["obs"], action)
        alpha = jax.lax.stop_gradient(jnp.exp(ts.log_alpha))
        sac_loss = jnp.mean(alpha * logp - jnp.minimum(q1, q2))

        # CAPS (config.py:34-36). Temporal: consecutive-state mean actions;
        # spatial: mean action under observation noise of scale eps_s.
        mu_s = self.actor.deterministic(actor_params, batch["obs"])
        mu_next = self.actor.deterministic(actor_params, batch["next_obs"])
        noisy_obs = batch["obs"] + cfg.eps_s * jax.random.normal(
            k_spatial, batch["obs"].shape
        )
        mu_noisy = self.actor.deterministic(actor_params, noisy_obs)
        caps_t = jnp.mean(jnp.sum(jnp.square(mu_s - mu_next), axis=-1))
        caps_s = jnp.mean(jnp.sum(jnp.square(mu_s - mu_noisy), axis=-1))
        loss = sac_loss + cfg.lambda_t * caps_t + cfg.lambda_s * caps_s
        return loss, (jnp.mean(logp), sac_loss, caps_t, caps_s)

    def _update_once(self, ts: SacTrainState, key, batch_size=None):
        cfg = self.cfg
        k_batch, k_critic, k_actor, k_next = jax.random.split(key, 4)
        batch = self._sample(ts.buffer, k_batch, batch_size or cfg.batch_size)

        critic_grads = jax.grad(self._critic_loss)(
            ts.critic_params, ts, batch, k_critic
        )
        c_updates, critic_opt = self.critic_tx.update(
            critic_grads, ts.critic_opt, ts.critic_params
        )
        critic_params = optax.apply_updates(ts.critic_params, c_updates)
        ts = ts.replace(critic_params=critic_params, critic_opt=critic_opt)

        (_, (mean_logp, _, _, _)), actor_grads = jax.value_and_grad(
            self._actor_loss, has_aux=True
        )(ts.actor_params, ts, batch, k_actor)
        a_updates, actor_opt = self.actor_tx.update(
            actor_grads, ts.actor_opt, ts.actor_params
        )
        actor_params = optax.apply_updates(ts.actor_params, a_updates)

        # temperature (auto entropy tuning)
        def alpha_loss(log_alpha):
            return -log_alpha * jax.lax.stop_gradient(
                mean_logp + self.target_entropy
            )

        al_grad = jax.grad(alpha_loss)(ts.log_alpha)
        al_updates, alpha_opt = self.alpha_tx.update(
            al_grad, ts.alpha_opt, ts.log_alpha
        )
        log_alpha = optax.apply_updates(ts.log_alpha, al_updates)

        target = jax.tree.map(
            lambda t, o: (1.0 - cfg.tau) * t + cfg.tau * o,
            ts.target_critic_params, critic_params,
        )
        return ts.replace(
            actor_params=actor_params, actor_opt=actor_opt,
            log_alpha=log_alpha, alpha_opt=alpha_opt,
            target_critic_params=target,
            grad_steps=ts.grad_steps + 1,
        )

    # ----------------------------------------------------------- train loop

    def _rounds_impl(self, ts: SacTrainState, n_rounds: int):
        cfg = self.cfg

        def one_round(ts: SacTrainState, _):
            key, k_collect, k_update = jax.random.split(ts.key, 3)
            ts = ts.replace(key=key)
            ts, reward_sum = self._env_cycle(ts, k_collect)

            # Warmup gate on BUFFER FILL, not the env-step counter: for a
            # fresh run they are identical (train_freq*num_envs inserts per
            # round), but after a light-checkpoint resume (empty re-attached
            # buffer, restored counter) only the fill gate re-warms properly.
            # (in shard-local mode buffer.size counts LOCAL rows; scale by
            # the shard count for the global fill)
            fill_scale = (
                self.mesh.devices.size if cfg.shard_local_replay else 1
            )
            past_warmup = ts.buffer.size * fill_scale >= min(
                cfg.learning_starts, cfg.buffer_size
            )

            fusion = self._fusion
            n_updates = cfg.gradient_steps // fusion

            def do_updates(ts):
                # n_updates MXU-sized updates instead of gradient_steps tiny
                # sequential ones (same data:update ratio; grad_steps counts
                # actual updates, so n_updates per round)
                if n_updates == 1:
                    return self._update_once(
                        ts, k_update, batch_size=fusion * cfg.batch_size
                    )
                def body(ts, uk):
                    return self._update_once(
                        ts, uk, batch_size=fusion * cfg.batch_size
                    ), None
                ts, _ = jax.lax.scan(
                    body, ts, jax.random.split(k_update, n_updates)
                )
                return ts

            ts = jax.lax.cond(past_warmup, do_updates, lambda t: t, ts)
            return ts, reward_sum

        ts, rewards = jax.lax.scan(one_round, ts, None, length=n_rounds)
        return ts, jnp.sum(rewards)

    def train_rounds(self, ts: SacTrainState, n_rounds: int):
        """Run n_rounds x {train_freq env steps + gradient_steps updates}
        as one device program. Returns (state, summed reward)."""
        if n_rounds not in self._jit_rounds:
            self._jit_rounds[n_rounds] = jax.jit(
                partial(self._rounds_impl, n_rounds=n_rounds),
                donate_argnums=(0,),
            )
        return self._jit_rounds[n_rounds](ts)

    # ------------------------------------------------- seed-parallel (vmap)

    def init_many(self, seeds) -> SacTrainState:
        """Initialize a POPULATION of independent learners (one per seed),
        stacked on a leading axis — envs, replay buffers, params, optimizer
        states all become (S, ...) leaves of one pytree.

        TPU-native population training: the whole {collect -> update} cycle
        then runs for every seed in ONE device program via
        :meth:`train_rounds_many` — hyperparameter-free seed sweeps and
        variance estimates at the cost of one jit. No reference counterpart
        (SB3 trains one model per process).
        """
        keys = jax.vmap(jax.random.key)(jnp.asarray(list(seeds), jnp.uint32))
        return jax.jit(jax.vmap(self._init_impl))(keys)

    def train_rounds_many(self, ts: SacTrainState, n_rounds: int):
        """Population version of :meth:`train_rounds`: (S, ...) state in,
        (S, ...) state + per-seed summed reward out.

        Note: under vmap, the warmup ``lax.cond`` becomes a select (both
        branches execute every round, results discarded during warmup), so
        prefer small ``learning_starts`` for population runs.
        """
        key = ("many", n_rounds)
        if key not in self._jit_rounds:
            self._jit_rounds[key] = jax.jit(
                jax.vmap(partial(self._rounds_impl, n_rounds=n_rounds)),
                donate_argnums=(0,),
            )
        return self._jit_rounds[key](ts)

    def eval_policy_many(self, ts: SacTrainState, n_steps: int = 500,
                         num_envs: int = 16):
        """Per-seed deterministic eval -> (S,) mean reward/step array."""
        return self.eval_policy_stats_many(ts, n_steps, num_envs)[
            "reward_per_step"
        ]

    def eval_policy_stats_many(self, ts: SacTrainState, n_steps: int = 500,
                               num_envs: int = 16) -> dict:
        """Population eval with outcome counts: the
        :meth:`eval_policy_stats` dict with (S,) NumPy arrays per entry
        (model selection across a seed population, ``--recipe robust``)."""
        import numpy as np

        key = ("many", n_steps, num_envs)
        if key not in self._jit_eval:
            run = self._build_eval(n_steps, num_envs)
            self._jit_eval[key] = jax.jit(jax.vmap(run))
        keys = jax.vmap(lambda k: jax.random.fold_in(k, 7))(ts.key)
        out = self._jit_eval[key](ts.actor_params, keys)
        return {k: np.asarray(v) for k, v in out.items()}

    # ---------------------------------------------------------- diagnostics

    def watch(self, ts: SacTrainState) -> dict:
        """Gradient/parameter diagnostics — the analog of the reference's
        ``wandb.watch`` gradient+parameter logging (wandb_callback.py:126-131).

        Computes global L2 norms of the actor/critic parameters and of their
        gradients on one diagnostic replay batch, plus the current loss
        terms, entropy temperature, and sampled-policy entropy. Runs as a
        separate jitted program so the training hot path pays nothing; call
        it at logging cadence (the train CLIs do, on eval blocks). Only
        meaningful once the buffer holds data (after warmup).
        """
        if self._jit_watch is None:

            def impl(ts: SacTrainState):
                key = jax.random.fold_in(ts.key, 13)
                k_batch, k_critic, k_actor = jax.random.split(key, 3)
                batch = self._sample(ts.buffer, k_batch, self.cfg.batch_size)
                critic_loss, critic_grads = jax.value_and_grad(
                    self._critic_loss
                )(ts.critic_params, ts, batch, k_critic)
                (actor_loss, aux), actor_grads = jax.value_and_grad(
                    self._actor_loss, has_aux=True
                )(ts.actor_params, ts, batch, k_actor)
                mean_logp, sac_loss, caps_t, caps_s = aux
                return dict(
                    actor_param_norm=optax.global_norm(ts.actor_params),
                    critic_param_norm=optax.global_norm(ts.critic_params),
                    actor_grad_norm=optax.global_norm(actor_grads),
                    critic_grad_norm=optax.global_norm(critic_grads),
                    critic_loss=critic_loss,
                    actor_loss=actor_loss,
                    sac_actor_loss=sac_loss,
                    caps_temporal=caps_t,
                    caps_spatial=caps_s,
                    policy_entropy=-mean_logp,
                    alpha=jnp.exp(ts.log_alpha),
                )

            self._jit_watch = jax.jit(impl)
        return {k: float(v) for k, v in self._jit_watch(ts).items()}

    # ----------------------------------------------------------- evaluation

    def eval_policy(self, ts: SacTrainState, n_steps: int = 500, num_envs: int = 16):
        """Deterministic-policy rollout; returns mean reward per step.

        The jitted rollout is cached per (n_steps, num_envs) — a fresh jit
        per call would recompile every evaluation (tens of seconds on TPU).
        """
        return self.eval_policy_stats(ts, n_steps, num_envs)["reward_per_step"]

    def eval_policy_stats(self, ts: SacTrainState, n_steps: int = 500,
                          num_envs: int = 16) -> dict:
        """Deterministic eval with outcome counts: ``reward_per_step`` plus
        ``episodes``/``terminations``/``truncations`` (and ``arriveds``/
        ``collisions`` where the env reports them) over the rollout —
        so model selection can use the task metric (e.g. CA arrivals)
        rather than reward/step."""
        return self.eval_policy_stats_at(
            ts.actor_params, jax.random.fold_in(ts.key, 7), n_steps, num_envs
        )

    def eval_policy_stats_at(self, actor_params, key, n_steps: int = 500,
                             num_envs: int = 16) -> dict:
        """The exact :meth:`eval_policy_stats` program on arbitrary actor
        params under an explicit PRNG key — lets a bundle's recorded in-run
        eval (the key the train CLI stored at best-export time) be replayed
        bit-for-bit against the exported params (export-fidelity testing and
        eval-gap attribution; ``run_eval --replay-recorded-eval``)."""
        if (n_steps, num_envs) not in self._jit_eval:
            self._jit_eval[(n_steps, num_envs)] = self._build_eval(
                n_steps, num_envs
            )
        run = self._jit_eval[(n_steps, num_envs)]
        out = run(actor_params, key)
        return {k: float(v) for k, v in out.items()}

    def _build_eval(self, n_steps, num_envs):
        cfg = self.cfg
        handle = self.handle

        @jax.jit
        def run(actor_params, key):
            env_keys = jax.random.split(key, num_envs)
            env_state = jax.vmap(lambda k: handle.reset(handle.cfg, k))(env_keys)
            obs0 = jax.vmap(lambda s: handle.reset_obs(handle.cfg, s))(env_state)
            frames = init_frames(obs0, cfg.frame_stack)

            def body(carry, _):
                env_state, frames = carry
                obs = frames.reshape(num_envs, -1)
                actions = self.actor.deterministic(actor_params, obs)
                env_state, step_ts = self._auto_step(env_state, actions)
                new_frames = push_frames(frames, step_ts.obs, step_ts.done)
                per_step = {
                    "reward": jnp.mean(step_ts.reward),
                    "episodes": jnp.sum(step_ts.done),
                    "terminations": jnp.sum(step_ts.terminated),
                    "truncations": jnp.sum(step_ts.truncated),
                }
                # task-outcome flags where the env provides them (the CA env
                # exposes arrived/collision; reward/step is a poor proxy for
                # its arrival metric — docs/PERFORMANCE.md)
                for k in ("arrived", "collision"):
                    if k in step_ts.info:
                        per_step[k + "s"] = jnp.sum(step_ts.info[k])
                return (env_state, new_frames), per_step

            _, acc = jax.lax.scan(body, (env_state, frames), None, length=n_steps)
            out = {"reward_per_step": jnp.mean(acc.pop("reward"))}
            out.update({k: jnp.sum(v) for k, v in acc.items()})
            return out

        return run
