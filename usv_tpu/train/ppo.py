"""PPO learner (clipped surrogate, GAE) on the vmapped env batch.

Capability match for the reference's ``config_ppo`` path
(``train_test/config.py:3-15``): n_steps=2048 rollout horizon, minibatch 64,
pi/vf nets 256x256, log_std_init=-2, and gSDE (use_sde + sde_sample_freq=4,
config.py:4-5): exploration noise is state-dependent (phi(s) @ sigma E) with
the exploration matrix resampled every sde_sample_freq env steps
(usv_tpu/models/sde.py).

Like the SAC learner, {rollout -> GAE -> epochs of minibatch updates} is one
jitted device program.
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
from usv_tpu.models.mlp import PpoActorCritic
from usv_tpu.vector.frames import init_frames, push_frames


@dataclasses.dataclass(frozen=True)
class PpoConfig:
    n_steps: int = 2048          # config.py:7 (per env)
    batch_size: int = 64         # config.py:8
    n_epochs: int = 10           # SB3 default
    learning_rate: float = 3e-4  # SB3 default (config comments one out)
    # optional linear lr decay over the first lr_decay_updates GRADIENT
    # updates (to lr * lr_final_fraction, held constant after) — the analog
    # of SB3's linear lr schedule and the standard guard against late-run
    # PPO policy collapse (see docs/PERFORMANCE.md, at-scale PPO study).
    lr_decay_updates: Optional[int] = None
    lr_final_fraction: float = 0.0
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    ent_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    pi_hidden: Tuple[int, int] = (256, 256)
    vf_hidden: Tuple[int, int] = (256, 256)
    log_std_init: float = -2.0   # config.py:12
    use_sde: bool = True         # config.py:4
    sde_sample_freq: int = 4     # config.py:5
    num_envs: int = 16
    frame_stack: int = 5
    # bf16 MLP matmuls on the MXU (params/optimizer stay f32)
    compute_dtype: str = "float32"
    # TPU throughput lever (docs/PERFORMANCE.md, PPO update study): fold k
    # consecutive minibatches into ONE optimizer step on a k*batch_size
    # batch. Same data:update FLOP ratio per epoch, 1/k the sequential
    # optimizer-step depth — at the reference's SB3 minibatch of 64 the
    # 256x256 matmuls are ~100x below MXU tile efficiency, so the update
    # phase is latency-bound, exactly like unfused SAC (train/sac.py:77-87).
    # 1/k the optimizer steps trades some sample efficiency for wall-clock;
    # consider scaling lr with sqrt(k).
    update_fusion: int = 1
    # SB3 reshuffles the whole rollout every epoch; at 256+ envs that is a
    # random-row gather over the full (n_steps*num_envs, obs) arrays per
    # epoch — the dominant update-phase cost once fusion removes the
    # optimizer-step latency (docs/PERFORMANCE.md PPO study). False keeps
    # ONE shuffle per iteration (minibatches still random, epochs revisit
    # them in the same grouping) for ~1/n_epochs the shuffle traffic.
    reshuffle_epochs: bool = True
    # Pod-scaling lever (docs/SCALING.md "PPO's extra term"): the minibatch
    # permutation over the flattened rollout is the ONE PPO collective that
    # scales with rollout bytes when the batch axis is sharded (~6 GB/chip/
    # iteration at the at-scale shape). shuffle_groups=S > 1 permutes within
    # S env-contiguous row groups instead and builds every minibatch from
    # eff_batch/S rows of EACH group (stratified). The formulation is plain
    # reshapes + a batched within-group gather, so it is placement-
    # independent: on one chip S>1 emulates the pod sampling restriction for
    # quality studies; sharded over an n-device mesh with S % n == 0 the
    # partitioner keeps the gather chip-local and the update phase's only
    # collective is the gradient psum (tests/test_parallel.py::
    # test_shard_local_shuffle_traffic). 0/1 = global shuffle (SB3
    # semantics). Requires num_envs % S == 0 and batch_size*fusion % S == 0.
    shuffle_groups: int = 0
    # Rotation mitigation for the grouped shuffle's measured quality
    # deficit (VERDICT r4 next-#1b): between iterations the per-env
    # carried state (env state, frame stack, sde) is randomly PERMUTED
    # across the env axis, so each iteration's env-contiguous groups hold
    # a fresh random membership — over iterations every env mixes with
    # every other, removing the fixed-coupling restriction entirely while
    # each iteration's minibatches stay stratified and shard-local. The
    # traffic cost is an all-to-all of STATE bytes once per iteration —
    # n_steps-independent, ~1/n_steps of one rollout shuffle (a roll of
    # the rollout itself was measured to lower WORSE than the global
    # shuffle; see the _iteration_impl comment).
    shuffle_group_rotate: bool = False
    # Numerical guard (utils/guards.py; see SacConfig.sanitize_envs): diverged
    # envs terminate with reward 0 and auto-reset instead of poisoning the
    # on-policy batch with NaN. Default ON.
    sanitize_envs: bool = True
    # Store the flattened rollout OBSERVATIONS in bf16 for the update phase.
    # The n_epochs minibatch sweeps re-read the (n_steps*num_envs, obs)
    # array every epoch — 1.5 GB/epoch at the at-scale shape — and that HBM
    # stream, not the MXU, is the non-matmul half of the update cost
    # (docs/PERFORMANCE.md SOL accounting). bf16 halves it; the first-layer
    # matmul runs bf16 passes on the MXU anyway, so the only precision loss
    # is the 8-bit observation mantissa (actions/logp/adv/ret stay f32 —
    # the PPO ratio is exp(logp - logp_old) and must not be quantized).
    rollout_obs_bf16: bool = False


def grouped_minibatches(tree, n_groups, eff_batch, key):
    """Stratified minibatching with group-local permutations.

    ``tree`` leaves are rollout arrays of shape ``(n_steps, num_envs, *f)``.
    Rows are regrouped env-major into ``n_groups`` env-contiguous groups,
    permuted independently WITHIN each group, and every minibatch takes
    ``eff_batch / n_groups`` rows from EACH group, returned as leaves of
    shape ``(n_batches, eff_batch, *f)`` with group g's rows contiguous at
    ``[g*eff_local, (g+1)*eff_local)``. Because the gather never crosses a
    group and the merges keep the group axis major, the SPMD partitioner
    keeps the whole operation shard-local when the env axis is sharded over
    a mesh whose size divides ``n_groups`` (docs/SCALING.md, "PPO's extra
    term"; tests/test_parallel.py::test_shard_local_shuffle_traffic)."""
    leaves = jax.tree.leaves(tree)
    n_steps, num_envs = leaves[0].shape[:2]
    n_total = n_steps * num_envs
    if num_envs % n_groups or eff_batch % n_groups:
        raise ValueError(
            f"shuffle_groups ({n_groups}) must divide num_envs "
            f"({num_envs}) and batch_size*update_fusion ({eff_batch})"
        )
    n_local = n_total // n_groups
    eff_local = eff_batch // n_groups
    n_batches = n_total // eff_batch
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, n_local)
    )(jax.random.split(key, n_groups))

    def pick(x):
        x = jnp.moveaxis(x, 0, 1)  # env-major: whole-env trajectories
        x = x.reshape(n_groups, n_local, *x.shape[2:])
        idx = perms.reshape(n_groups, n_local, *([1] * (x.ndim - 2)))
        shuf = jnp.take_along_axis(x, idx, axis=1)
        mb = shuf[:, : n_batches * eff_local].reshape(
            n_groups, n_batches, eff_local, *x.shape[2:]
        )
        mb = jnp.moveaxis(mb, 0, 1)
        return mb.reshape(n_batches, eff_batch, *x.shape[2:])

    return jax.tree.map(pick, tree)


@struct.dataclass
class PpoTrainState:
    params: dict
    opt_state: optax.OptState
    env_state: object
    frames: jnp.ndarray
    key: jnp.ndarray
    update_count: jnp.ndarray
    sde: object = None  # SdeState when cfg.use_sde


class PpoLearner:
    def __init__(self, handle: EnvHandle, config: PpoConfig = PpoConfig()):
        self.handle = handle
        self.cfg = config
        env_cfg = handle.cfg
        self.obs_dim = env_cfg.obs_dim * max(1, config.frame_stack)
        self.act_dim = env_cfg.action_dim
        self.model = PpoActorCritic(
            action_dim=self.act_dim,
            pi_hidden=config.pi_hidden,
            vf_hidden=config.vf_hidden,
            log_std_init=config.log_std_init,
            use_sde=config.use_sde,
            compute_dtype=jnp.dtype(config.compute_dtype),
        )
        if config.lr_decay_updates:
            lr = optax.linear_schedule(
                config.learning_rate,
                config.learning_rate * config.lr_final_fraction,
                config.lr_decay_updates,
            )
        else:
            lr = config.learning_rate
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(lr),
        )
        self._jit_eval = {}
        step_fn = handle.step
        if config.sanitize_envs:
            from usv_tpu.utils.guards import make_sanitized_step

            _san = make_sanitized_step(handle.step, env_cfg)

            def step_fn(cfg_, state, action):
                return _san(state, action)

        self._auto_step = jax.vmap(
            make_autoreset_step(env_cfg, step_fn, handle.reset, handle.reset_obs)
        )
        self._jit_init = jax.jit(self._init_impl)
        self._jit_iter = jax.jit(self._iteration_impl, donate_argnums=(0,))

    def _init_impl(self, key) -> PpoTrainState:
        cfg = self.cfg
        k_model, k_env, key = jax.random.split(key, 3)
        params = self.model.init(k_model, jnp.zeros((1, self.obs_dim)))
        env_keys = jax.random.split(k_env, cfg.num_envs)
        env_state = jax.vmap(lambda k: self.handle.reset(self.handle.cfg, k))(env_keys)
        obs0 = jax.vmap(lambda s: self.handle.reset_obs(self.handle.cfg, s))(env_state)
        frames = init_frames(obs0, cfg.frame_stack)
        sde = None
        if cfg.use_sde:
            from usv_tpu.models.sde import init_sde

            key, k_sde = jax.random.split(key)
            sde = init_sde(
                k_sde, cfg.pi_hidden[-1], self.act_dim,
                batch_shape=(cfg.num_envs,),
            )
        return PpoTrainState(
            params=params,
            opt_state=self.tx.init(params),
            env_state=env_state,
            frames=frames,
            key=key,
            update_count=jnp.zeros((), jnp.int32),
            sde=sde,
        )

    def init(self, seed: int = 0) -> PpoTrainState:
        return self._jit_init(jax.random.key(seed))

    # ------------------------------------------------------------- rollout

    def _collect(self, ts: PpoTrainState, key):
        cfg = self.cfg

        def body(carry, step_key):
            env_state, frames, sde = carry
            obs = frames.reshape(cfg.num_envs, -1)
            if cfg.use_sde:
                from usv_tpu.models.sde import maybe_resample

                sde = maybe_resample(sde, step_key, cfg.sde_sample_freq)
                action, logp, value = self.model.sample_sde(ts.params, obs, sde)
            else:
                action, logp, value = self.model.sample(ts.params, obs, step_key)
            # clip to the env's action space before stepping (the log-prob
            # keeps the unclipped action, as SB3 does)
            clipped = jnp.clip(
                action,
                jnp.asarray(self.handle.cfg.action_low),
                jnp.asarray(self.handle.cfg.action_high),
            )
            env_state, step_ts = self._auto_step(env_state, clipped)
            new_frames = push_frames(frames, step_ts.obs, step_ts.done)
            # Time-limit (truncation) bootstrap, SB3-style: when an episode is
            # truncated but not terminated, add gamma * V(terminal_obs) to the
            # reward so GAE can treat every done as terminal.
            truncated_mask = step_ts.truncated & ~step_ts.terminated
            truncated_only = truncated_mask.astype(jnp.float32)

            # The bootstrap value is only consumed on steps where some env
            # actually truncated (~1 in max_episode_steps when episodes run
            # full length); lax.cond skips the whole extra forward pass
            # otherwise — the rollout phase was paying a second value-net
            # forward every step (docs/PERFORMANCE.md, PPO update study).
            def _terminal_value(_):
                terminal_frames = jnp.concatenate(
                    [frames[:, 1:, :],
                     step_ts.info["terminal_observation"][:, None, :]],
                    axis=1,
                )
                return self.model.apply(
                    ts.params, terminal_frames.reshape(cfg.num_envs, -1),
                    method=self.model.value_only,
                )

            terminal_value = jax.lax.cond(
                jnp.any(truncated_mask), _terminal_value,
                lambda _: jnp.zeros((cfg.num_envs,)), None,
            )
            reward = step_ts.reward + cfg.gamma * terminal_value * truncated_only
            out = dict(
                obs=obs, action=action, logp=logp, value=value,
                reward=reward,                  # bootstrap-augmented (GAE)
                raw_reward=step_ts.reward,      # env reward (metrics)
                done=step_ts.done.astype(jnp.float32),
            )
            return (env_state, new_frames, sde), out

        keys = jax.random.split(key, cfg.n_steps)
        (env_state, frames, sde), traj = jax.lax.scan(
            body, (ts.env_state, ts.frames, ts.sde), keys
        )
        last_obs = frames.reshape(cfg.num_envs, -1)
        _, _, last_value, _ = self.model.apply(ts.params, last_obs)
        return ts.replace(env_state=env_state, frames=frames, sde=sde), traj, last_value

    @staticmethod
    def _gae(traj, last_value, gamma, lam):
        """A_t = delta_t + gamma*lam*(1-d_t)*A_{t+1},
        delta_t = r_t + gamma*(1-d_t)*V_{t+1} - V_t — the bootstrap of step t
        is masked by step t's OWN done (d_t == s_{t+1} is terminal)."""

        def body(carry, x):
            adv_next, v_next = carry
            nonterm = 1.0 - x["done"]
            delta = x["reward"] + gamma * v_next * nonterm - x["value"]
            adv = delta + gamma * lam * nonterm * adv_next
            return (adv, x["value"]), adv

        _, advs = jax.lax.scan(
            body,
            (jnp.zeros_like(last_value), last_value),
            traj,
            reverse=True,
        )
        returns = advs + traj["value"]
        return advs, returns

    # -------------------------------------------------------------- update

    def _loss(self, params, batch, clip_range, ent_coef, vf_coef):
        logp, entropy, value = self.model.log_prob(
            params, batch["obs"], batch["action"]
        )
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = adv * ratio
        pg2 = adv * jnp.clip(ratio, 1.0 - clip_range, 1.0 + clip_range)
        pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))
        v_loss = jnp.mean(jnp.square(value - batch["ret"]))
        ent_loss = -jnp.mean(entropy)
        return pg_loss + vf_coef * v_loss + ent_coef * ent_loss

    def _iteration_impl(self, ts: PpoTrainState):
        cfg = self.cfg
        key, k_collect, k_perm = jax.random.split(ts.key, 3)
        ts = ts.replace(key=key)
        ts, traj, last_value = self._collect(ts, k_collect)
        advs, returns = self._gae(traj, last_value, cfg.gamma, cfg.gae_lambda)

        n_total = cfg.n_steps * cfg.num_envs
        obs_dtype = jnp.bfloat16 if cfg.rollout_obs_bf16 else jnp.float32
        eff_batch = cfg.batch_size * max(1, cfg.update_fusion)
        n_batches = n_total // eff_batch

        if cfg.shuffle_groups > 1:
            # Grouped (shard-local-able) shuffle — see the config comment
            # and grouped_minibatches above.
            rollout = dict(
                obs=traj["obs"].astype(obs_dtype),
                action=traj["action"],
                logp=traj["logp"],
                adv=advs,
                ret=returns,
            )
            def shuffle_batch(ek):
                return grouped_minibatches(
                    rollout, cfg.shuffle_groups, eff_batch, ek
                )
        else:
            flat = dict(
                obs=traj["obs"].reshape(n_total, -1).astype(obs_dtype),
                action=traj["action"].reshape(n_total, -1),
                logp=traj["logp"].reshape(n_total),
                adv=advs.reshape(n_total),
                ret=returns.reshape(n_total),
            )

            def shuffle_batch(ek):
                perm = jax.random.permutation(ek, n_total)
                shuffled = jax.tree.map(lambda x: x[perm], flat)
                return jax.tree.map(
                    lambda x: x[: n_batches * eff_batch].reshape(
                        n_batches, eff_batch, *x.shape[1:]
                    ),
                    shuffled,
                )

        def minibatch(carry, batch):
            params, opt_state = carry
            grads = jax.grad(self._loss)(
                params, batch, cfg.clip_range, cfg.ent_coef, cfg.vf_coef
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), None

        if cfg.reshuffle_epochs:  # SB3 semantics: fresh permutation/epoch
            def epoch(carry, ek):
                carry, _ = jax.lax.scan(minibatch, carry, shuffle_batch(ek))
                return carry, None

            (params, opt_state), _ = jax.lax.scan(
                epoch, (ts.params, ts.opt_state),
                jax.random.split(k_perm, cfg.n_epochs),
            )
        else:  # one shuffle per iteration; epochs rescan the same batching
            batched = shuffle_batch(k_perm)

            def epoch(carry, _):
                carry, _ = jax.lax.scan(minibatch, carry, batched)
                return carry, None

            (params, opt_state), _ = jax.lax.scan(
                epoch, (ts.params, ts.opt_state), None, length=cfg.n_epochs,
            )
        mean_reward = jnp.mean(traj["raw_reward"])
        ts = ts.replace(
            params=params, opt_state=opt_state,
            update_count=ts.update_count + 1,
        )
        if cfg.shuffle_groups > 1 and cfg.shuffle_group_rotate:
            # Group-membership rotation (see the config comment): permute
            # the per-env carried state BETWEEN iterations, so the next
            # rollout's env-contiguous groups hold a fresh random subset of
            # trajectories. Permuting STATE (one step's worth of bytes)
            # instead of the rollout keeps the traffic rollout-size
            # independent — a dynamic roll of the (n_steps, num_envs, obs)
            # arrays was measured to lower to MORE collective bytes than
            # the global shuffle it replaces (2.4x its growth on the
            # 8-device mesh), while this all-to-all is bounded by state
            # bytes once per iteration.
            key, k_rot = jax.random.split(ts.key)
            perm = jax.random.permutation(k_rot, cfg.num_envs)

            def pick(x):
                return jnp.take(x, perm, axis=0)

            ts = ts.replace(
                env_state=jax.tree.map(pick, ts.env_state),
                frames=pick(ts.frames),
                sde=(jax.tree.map(pick, ts.sde)
                     if ts.sde is not None else None),
                key=key,
            )
        return ts, mean_reward

    def train_iteration(self, ts: PpoTrainState):
        """One {rollout, GAE, epochs x minibatches} cycle as one device call."""
        return self._jit_iter(ts)

    # --------------------------------------------------------------- eval

    def eval_policy(self, ts: PpoTrainState, n_steps: int = 500,
                    num_envs: int = 16) -> float:
        """Deterministic-policy rollout (clipped mean action) on fresh envs;
        returns mean reward per step — the same protocol as
        ``SacLearner.eval_policy``, so SAC/PPO numbers are comparable. The
        jitted rollout is cached per (n_steps, num_envs)."""
        return self.eval_policy_stats(ts, n_steps, num_envs)["reward_per_step"]

    def eval_policy_stats(self, ts: PpoTrainState, n_steps: int = 500,
                          num_envs: int = 16) -> dict:
        """Deterministic eval with outcome counts (see
        ``SacLearner.eval_policy_stats``)."""
        return self.eval_policy_stats_at(
            ts.params, jax.random.fold_in(ts.key, 7), n_steps, num_envs
        )

    def eval_policy_stats_at(self, params, key, n_steps: int = 500,
                             num_envs: int = 16) -> dict:
        """The exact :meth:`eval_policy_stats` program on arbitrary params
        under an explicit PRNG key (see ``SacLearner.eval_policy_stats_at``)."""
        if (n_steps, num_envs) not in self._jit_eval:
            self._jit_eval[(n_steps, num_envs)] = self._build_eval(
                n_steps, num_envs
            )
        run = self._jit_eval[(n_steps, num_envs)]
        out = run(params, key)
        return {k: float(v) for k, v in out.items()}

    def _build_eval(self, n_steps, num_envs):
        cfg = self.cfg
        handle = self.handle
        low = jnp.asarray(handle.cfg.action_low)
        high = jnp.asarray(handle.cfg.action_high)

        @jax.jit
        def run(params, key):
            env_keys = jax.random.split(key, num_envs)
            env_state = jax.vmap(lambda k: handle.reset(handle.cfg, k))(env_keys)
            obs0 = jax.vmap(lambda s: handle.reset_obs(handle.cfg, s))(env_state)
            frames = init_frames(obs0, cfg.frame_stack)

            def body(carry, _):
                env_state, frames = carry
                obs = frames.reshape(num_envs, -1)
                mean, _, _, _ = self.model.apply(params, obs)
                actions = jnp.clip(mean, low, high)
                env_state, step_ts = self._auto_step(env_state, actions)
                new_frames = push_frames(frames, step_ts.obs, step_ts.done)
                per_step = {
                    "reward": jnp.mean(step_ts.reward),
                    "episodes": jnp.sum(step_ts.done),
                    "terminations": jnp.sum(step_ts.terminated),
                    "truncations": jnp.sum(step_ts.truncated),
                }
                for k in ("arrived", "collision"):
                    if k in step_ts.info:
                        per_step[k + "s"] = jnp.sum(step_ts.info[k])
                return (env_state, new_frames), per_step

            _, acc = jax.lax.scan(
                body, (env_state, frames), None, length=n_steps
            )
            out = {"reward_per_step": jnp.mean(acc.pop("reward"))}
            out.update({k: jnp.sum(v) for k, v in acc.items()})
            return out

        return run

    def eval_policy_many(self, ts: PpoTrainState, n_steps: int = 500,
                         num_envs: int = 16):
        """Per-seed deterministic eval -> (S,) mean reward/step array (the
        population counterpart of :meth:`eval_policy`; see
        ``SacLearner.eval_policy_many``)."""
        return self.eval_policy_stats_many(ts, n_steps, num_envs)[
            "reward_per_step"
        ]

    def eval_policy_stats_many(self, ts: PpoTrainState, n_steps: int = 500,
                               num_envs: int = 16) -> dict:
        """Population eval with outcome counts: the
        :meth:`eval_policy_stats` dict with (S,) NumPy arrays per entry —
        model selection across a seed population can use the task metric
        (``--recipe robust``)."""
        import numpy as np

        key = ("many", n_steps, num_envs)
        if key not in self._jit_eval:
            run = self._build_eval(n_steps, num_envs)
            self._jit_eval[key] = jax.jit(jax.vmap(run))
        keys = jax.vmap(lambda k: jax.random.fold_in(k, 7))(ts.key)
        out = self._jit_eval[key](ts.params, keys)
        return {k: np.asarray(v) for k, v in out.items()}

    # ---------------------------------------------------------- diagnostics

    def watch(self, ts: PpoTrainState) -> dict:
        """Parameter diagnostics — the analog of the reference's
        ``wandb.watch`` parameter logging (wandb_callback.py:126-131): global
        L2 norm of the actor-critic parameters and the exploration log-std.
        (PPO keeps no replay data between iterations, so gradient norms would
        require a fresh rollout; parameters are the persistent state worth
        watching.) Separate jitted program; zero hot-path cost."""
        if not hasattr(self, "_jit_watch"):

            def impl(params):
                out = {"param_norm": optax.global_norm(params)}
                leaves = jax.tree_util.tree_leaves_with_path(params)
                log_stds = [
                    leaf for path, leaf in leaves
                    if "log_std" in jax.tree_util.keystr(path)
                ]
                if log_stds:
                    out["log_std_mean"] = jnp.mean(
                        jnp.concatenate([x.ravel() for x in log_stds])
                    )
                return out

            self._jit_watch = jax.jit(impl)
        return {k: float(v) for k, v in self._jit_watch(ts.params).items()}

    # ------------------------------------------------- seed-parallel (vmap)

    def init_many(self, seeds) -> PpoTrainState:
        """Population init: S independent learners stacked on a leading axis
        (see SacLearner.init_many)."""
        keys = jax.vmap(jax.random.key)(jnp.asarray(list(seeds), jnp.uint32))
        return jax.jit(jax.vmap(self._init_impl))(keys)

    def train_iteration_many(self, ts: PpoTrainState):
        """Population version of :meth:`train_iteration`: every seed's
        {rollout, GAE, update epochs} in one device program; returns
        (state, (S,) mean rewards)."""
        if not hasattr(self, "_jit_iter_many"):
            self._jit_iter_many = jax.jit(
                jax.vmap(self._iteration_impl), donate_argnums=(0,)
            )
        return self._jit_iter_many(ts)
