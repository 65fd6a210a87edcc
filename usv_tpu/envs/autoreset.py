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
