"""Vmapped lockstep env batch — the replacement for SB3 Dummy/SubprocVecEnv.

The reference vectorizes by stepping N python objects serially (or over
subprocess pipes; SURVEY.md §2.3). Here the batch axis is a ``vmap`` over the
state pytree: one jit-compiled XLA program steps all B envs in lockstep on
device, auto-resetting finished episodes (on-device, branch-free) and
maintaining an optional rolling frame-stack — the on-device analog of
``VecFrameStack(5)`` (reference sb3_train_vec.py:70).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from usv_tpu.envs.autoreset import (
    default_reset_pool,
    make_autoreset_step,
    make_pooled_autoreset_step,
)
from usv_tpu.envs.registry import EnvHandle
from usv_tpu.envs.types import TimeStep
from usv_tpu.vector.frames import init_frames, push_frames


@struct.dataclass
class BatchState:
    env: object            # vmapped env-state pytree, leading axis B
    frames: Optional[jnp.ndarray]  # (B, S, obs_dim) rolling stack or None

    @property
    def stacked_obs(self):
        """(B, S * obs_dim) frame-stacked observation (oldest first, like
        gym.wrappers.FrameStack)."""
        if self.frames is None:
            raise ValueError("frame stacking disabled")
        b, s, d = self.frames.shape
        return self.frames.reshape(b, s * d)


class BatchedEnv:
    """Jit-compiled lockstep batch of one env family.

    >>> h = usv_tpu.envs.make("usv-simple")
    >>> benv = BatchedEnv(h, num_envs=4096, frame_stack=5)
    >>> state = benv.reset(jax.random.key(0))
    >>> state, ts = benv.step(state, actions)   # actions: (4096, 2)
    """

    def __init__(self, handle: EnvHandle, num_envs: int, frame_stack: int = 0,
                 sanitize: bool = False, reset_pool: Optional[int] = None):
        self.handle = handle
        self.cfg = handle.cfg
        self.num_envs = num_envs
        self.frame_stack = frame_stack

        step_fn = handle.step
        if sanitize:
            # numerical guard for the hydrodynamic families (see
            # utils/guards.py) — diverged envs terminate and auto-reset
            from usv_tpu.utils.guards import make_sanitized_step

            _san = make_sanitized_step(handle.step, self.cfg)

            def step_fn(cfg_, state, action):
                return _san(state, action)

        # reset_pool: fresh resets generated per step (amortized autoreset;
        # see envs/autoreset.py). None -> default_reset_pool() == 0, the
        # per-env select path (pooled measured slower on TPU); explicit
        # F > 0 opts in.
        pool = default_reset_pool(num_envs) if reset_pool is None else reset_pool
        if pool and pool < num_envs:
            self._vstep = make_pooled_autoreset_step(
                self.cfg, step_fn, handle.reset, handle.reset_obs,
                num_envs, pool,
            )
        else:
            self._vstep = jax.vmap(make_autoreset_step(
                self.cfg, step_fn, handle.reset, handle.reset_obs
            ))
        self._vreset = jax.vmap(partial(handle.reset, self.cfg))
        self._vreset_obs = jax.vmap(partial(handle.reset_obs, self.cfg))
        self._jit_step = jax.jit(self._step_impl, donate_argnums=(0,))
        self._jit_reset = jax.jit(self._reset_impl)

    # -- implementation (pure) ------------------------------------------

    def _reset_impl(self, key):
        keys = jax.random.split(key, self.num_envs)
        env_state = self._vreset(keys)
        obs = self._vreset_obs(env_state)
        frames = None
        if self.frame_stack:
            frames = init_frames(obs, self.frame_stack)
        return BatchState(env=env_state, frames=frames), obs

    def _step_impl(self, state: BatchState, actions):
        env_state, ts = self._vstep(state.env, actions)
        frames = state.frames
        if self.frame_stack:
            frames = push_frames(state.frames, ts.obs, ts.done)
        return BatchState(env=env_state, frames=frames), ts

    # -- public API ------------------------------------------------------

    def reset(self, key):
        return self._jit_reset(key)

    def step(self, state, actions):
        return self._jit_step(state, actions)
