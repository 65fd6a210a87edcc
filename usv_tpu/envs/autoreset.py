"""On-device auto-reset: the vector-env replacement for SB3's VecEnv loop.

The reference relies on SB3 ``DummyVecEnv``/``SubprocVecEnv`` to reset
finished episodes on the host (SURVEY.md §2.3). Here reset-on-done is a
branch-free ``jnp.where`` select over the state pytree (the standard
Brax/Gymnax pattern): every env steps every iteration; finished envs are
replaced by freshly randomized ones drawn from their own split keys — no
host round-trip, no divergence between batch members.

The returned TimeStep follows the SB3 convention: on done, ``obs`` is the
*reset* observation of the new episode and the final observation of the old
episode is exposed as ``info['terminal_observation']``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from usv_tpu.envs.types import TimeStep


def _get_key(state):
    """Env states either carry ``key`` directly or wrap a base that does."""
    if hasattr(state, "key"):
        return state.key
    return state.base.key


def _set_key(state, key):
    if hasattr(state, "key"):
        return state.replace(key=key)
    return state.replace(base=state.base.replace(key=key))


def _select(done, new, old):
    """Pytree select: pick ``new`` where done (broadcast over leading axis)."""

    def pick(a, b):
        d = done.reshape(done.shape + (1,) * (a.ndim - done.ndim))
        return jnp.where(d, a, b)

    return jax.tree.map(pick, new, old)


def make_autoreset_step(
    cfg,
    step_fn: Callable,
    reset_fn: Callable,
    reset_obs_fn: Callable,
):
    """Wrap a functional env into an auto-resetting single-env step.

    step_fn(cfg, state, action) -> (state, TimeStep)
    reset_fn(cfg, key) -> state ; reset_obs_fn(cfg, state) -> obs
    """

    def auto_step(state, action):
        new_state, ts = step_fn(cfg, state, action)
        done = ts.done

        # env resets store an UNCONSUMED child key (see each reset), so
        # splitting it here never reuses bits already drawn during reset
        next_key, reset_key = jax.random.split(_get_key(new_state))
        fresh = _set_key(reset_fn(cfg, reset_key), next_key)

        out_state = _select(done, fresh, _set_key(new_state, next_key))
        obs = jnp.where(done, reset_obs_fn(cfg, fresh), ts.obs)
        info = dict(ts.info)
        info["terminal_observation"] = ts.obs
        return out_state, TimeStep(
            obs=obs,
            reward=ts.reward,
            terminated=ts.terminated,
            truncated=ts.truncated,
            info=info,
        )

    return auto_step


def default_reset_pool(num_envs: int) -> int:
    """Default pool size: 0 — the per-env select path everywhere.

    Measured verdict (v5e, 4096 usv-simple envs): the pooled variant LOSES.
    Distributing F fresh states to arbitrary done rows needs per-leaf row
    gathers, and cross-row data movement on TPU costs far more than just
    recomputing the reset math elementwise in every row (per-env select
    196 us/batched step vs pooled 411-486 us, even at F=128). Recompute
    beats gather; the branch-free select design is the right one on this
    hardware. The pooled path stays available as an explicit opt-in for
    hardware/backends where gathers are cheap.
    """
    return 0


def make_pooled_autoreset_step(
    cfg,
    step_fn: Callable,
    reset_fn: Callable,
    reset_obs_fn: Callable,
    num_envs: int,
    fresh_per_step: int,
):
    """Batch-level auto-reset that amortizes reset generation.

    The per-env select-based :func:`make_autoreset_step` computes a full
    domain-randomized reset — including the reset observation's sensor pass —
    for EVERY env EVERY step and discards ~(1 - 1/episode_len) of it; at 4096
    ``usv-simple`` envs that is ~20% of the whole step. Here only
    ``fresh_per_step`` (F) fresh states are generated per step; the i-th done
    env consumes pool entry ``cumsum(done)-1`` so each done env always gets
    its own independent draw. When more than F envs finish in one step (e.g.
    the synchronized TimeLimit wave of a batch that was reset together, every
    ``max_episode_steps`` steps) a ``lax.cond`` falls back to the exact
    full-width path for that step — so semantics match the per-env version
    in distribution for ANY done pattern, at full price only on wave steps.

    **Not the default — measured SLOWER on TPU** (see
    :func:`default_reset_pool`): the per-leaf row gathers that distribute
    pool entries to done rows cost more than the redundant reset math they
    save. Kept as an opt-in for backends with cheap gathers.

    Key hygiene matches the per-env version: every env's carried key is split
    every step; the pool consumes the reset-children of envs ``0..F-1`` and
    the fresh states carry their own unconsumed child keys. Distinct random
    streams, each used once.

    Returns ``fn(batched_state, batched_actions) -> (batched_state, TimeStep)``
    operating on a leading env axis of ``num_envs`` (NOT for use under vmap).
    """
    fresh_per_step = int(min(max(1, fresh_per_step), num_envs))
    vstep = jax.vmap(lambda s, a: step_fn(cfg, s, a))
    vreset = jax.vmap(lambda k: reset_fn(cfg, k))
    vreset_obs = jax.vmap(lambda s: reset_obs_fn(cfg, s))
    vsplit = jax.vmap(lambda k: tuple(jax.random.split(k)))
    F = fresh_per_step

    def pooled(args):
        stepped, obs, done, reset_keys = args
        fresh = vreset(reset_keys[:F])
        fresh_obs = vreset_obs(fresh)
        idx = jnp.clip(jnp.cumsum(done) - 1, 0, F - 1)

        def pick(f, o):
            g = f[idx]  # row gather; works for typed PRNG-key leaves too
            d = done.reshape(done.shape + (1,) * (g.ndim - 1))
            return jnp.where(d, g, o)

        out_state = jax.tree.map(pick, fresh, stepped)
        out_obs = jnp.where(done[:, None], fresh_obs[idx], obs)
        return out_state, out_obs

    def full(args):
        stepped, obs, done, reset_keys = args
        fresh = vreset(reset_keys)
        out_state = _select(done, fresh, stepped)
        out_obs = jnp.where(done[:, None], vreset_obs(fresh), obs)
        return out_state, out_obs

    def auto_step(state, action):
        new_state, ts = vstep(state, action)
        done = ts.done
        next_keys, reset_keys = vsplit(_get_key(new_state))
        stepped = _set_key(new_state, next_keys)

        if F >= num_envs:
            out_state, obs = full((stepped, ts.obs, done, reset_keys))
        else:
            out_state, obs = jax.lax.cond(
                jnp.sum(done) <= F,
                pooled,
                full,
                (stepped, ts.obs, done, reset_keys),
            )
        info = dict(ts.info)
        info["terminal_observation"] = ts.obs
        return out_state, TimeStep(
            obs=obs,
            reward=ts.reward,
            terminated=ts.terminated,
            truncated=ts.truncated,
            info=info,
        )

    return auto_step
