"""gymnasium.vector.VectorEnv adapter over the device-batched env.

The reference's vector surface is SB3 ``DummyVecEnv``/``make_vec_env``
(sb3_train_vec.py:67); its gymnasium analog is ``gymnasium.vector.VectorEnv``.
This adapter exposes the on-device lockstep batch (``usv_tpu.vector
.BatchedEnv`` semantics: jit-compiled step, on-device auto-reset, optional
frame stacking) through that standard API, so host-side training loops written
against gymnasium vector envs (or SB3's VecEnv via its gymnasium bridge) can
drive thousands of TPU envs with one process and one device dispatch per step.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

try:
    import gymnasium
    from gymnasium import spaces

    _BASE = gymnasium.vector.VectorEnv
except ImportError:  # pragma: no cover
    gymnasium = None
    spaces = None
    _BASE = object

from usv_tpu.envs import make as make_functional
from usv_tpu.vector.batch import BatchedEnv


class UsvVectorEnv(_BASE):
    """N lockstep envs of one family behind gymnasium's VectorEnv API."""

    # SAME-step autoreset: the obs returned with done=True is already the
    # next episode's reset observation; the finished episode's final obs is
    # in infos (gymnasium's "final_obs" and SB3's "terminal_observation").
    metadata = {"render_modes": ["rgb_array"], "autoreset_mode": "SameStep"}

    def __init__(self, env_id: str = "usv-simple", num_envs: int = 256,
                 frame_stack: int = 0, seed: int = 0, sanitize: bool = False,
                 **config_overrides):
        if gymnasium is None:
            raise ImportError("UsvVectorEnv requires gymnasium")
        self.handle = make_functional(env_id, **config_overrides)
        cfg = self.handle.cfg
        self.num_envs = num_envs
        self._benv = BatchedEnv(
            self.handle, num_envs, frame_stack=frame_stack, sanitize=sanitize
        )
        self._state = None
        self._seed_counter = seed

        obs_dim = cfg.obs_dim * max(1, frame_stack)
        self.single_observation_space = spaces.Box(
            -np.inf, np.inf, shape=(obs_dim,), dtype=np.float32
        )
        self.single_action_space = spaces.Box(
            np.asarray(cfg.action_low, np.float32),
            np.asarray(cfg.action_high, np.float32),
            dtype=np.float32,
        )
        self.observation_space = gymnasium.vector.utils.batch_space(
            self.single_observation_space, num_envs
        )
        self.action_space = gymnasium.vector.utils.batch_space(
            self.single_action_space, num_envs
        )
        self._frame_stack = frame_stack

    def _obs_out(self, ts_obs):
        if self._frame_stack:
            return np.asarray(self._state.stacked_obs)
        return np.asarray(ts_obs)

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is None:
            self._seed_counter += 1
            seed = self._seed_counter
        self._state, obs = self._benv.reset(jax.random.key(seed))
        if self._frame_stack:
            return np.asarray(self._state.stacked_obs), {}
        return np.asarray(obs), {}

    def step(self, actions):
        actions = np.asarray(actions, dtype=np.float32)
        self._state, ts = self._benv.step(self._state, actions)
        # pass every vectorized info field through; the final observation is
        # published under both gymnasium's and SB3's conventional keys
        infos = {k: np.asarray(v) for k, v in ts.info.items()}
        infos["final_obs"] = infos.get(
            "terminal_observation", self._obs_out(ts.obs)
        )
        return (
            self._obs_out(ts.obs),
            np.asarray(ts.reward),
            np.asarray(ts.terminated),
            np.asarray(ts.truncated),
            infos,
        )

    def close_extras(self, **kwargs):
        pass
