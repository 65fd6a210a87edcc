"""Rolling frame-stack primitives (the on-device FrameStack(5) analog).

One implementation of the push-with-reset-refill semantics shared by the
batch layer, the learners, and every rollout/eval/video path: the newest
observation enters at the end of the stack axis, and on episode end (done)
the whole stack refills with the new episode's first observation —
VecFrameStack-after-reset semantics (reference sb3_train.py:51).

Shapes are uniform over leading axes: frames ``(..., S, D)``, obs
``(..., D)``, done ``(...,)`` bool (or a scalar for single-env rollouts).
"""

from __future__ import annotations

import jax.numpy as jnp


def init_frames(obs, stack: int):
    """Tile ``obs (..., D)`` into a full stack ``(..., max(1,stack), D)``."""
    return jnp.repeat(obs[..., None, :], max(1, stack), axis=-2)


def push_frames(frames, obs, done):
    """Shift ``obs`` into ``frames``; refill the stack where ``done``."""
    new = jnp.concatenate([frames[..., 1:, :], obs[..., None, :]], axis=-2)
    refill = init_frames(obs, frames.shape[-2])
    if getattr(done, "ndim", 0):
        done = done.reshape(done.shape + (1, 1))
    return jnp.where(done, refill, new)
