"""Common environment interfaces: the functional env contract.

Every environment in this framework is a pair of pure functions

    reset(cfg, key)                  -> EnvState
    step(cfg, state, action)         -> (EnvState, TimeStep)

over fixed-shape pytrees; ``vmap`` gives the lockstep batch, ``lax.scan`` the
rollout, ``shard_map`` the multi-host spread. This replaces the reference's
stateful ``gym.Env`` objects (L4 of SURVEY.md §1); a thin gymnasium adapter in
``usv_tpu.compat`` reproduces the original class API on top.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TimeStep:
    """One transition's outputs (gymnasium 5-tuple, minus the state).

    ``info`` is a flat dict of fixed-shape arrays (the reference's ragged
    info dicts become fixed-shape debug pytrees; SURVEY.md §7.3).
    """

    obs: jnp.ndarray
    reward: jnp.ndarray
    terminated: jnp.ndarray
    truncated: jnp.ndarray
    info: Dict[str, Any]

    @property
    def done(self):
        return jnp.logical_or(self.terminated, self.truncated)
