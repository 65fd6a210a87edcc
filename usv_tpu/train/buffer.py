"""Device-resident replay buffer.

The SB3 SAC buffer the reference relies on (400k transitions,
``config.py:21``) lives in host RAM with NumPy copies per sample; here the
buffer is a pytree of preallocated device arrays — insertion is an aligned
``dynamic_update_slice`` (learner path) or wrap-around scatter (general
path) and sampling an indexed gather inside the same jit as the learner
update, so no transition ever crosses the host boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    obs: jnp.ndarray        # (cap, obs_dim)
    action: jnp.ndarray     # (cap, act_dim)
    reward: jnp.ndarray     # (cap,)
    next_obs: jnp.ndarray   # (cap, obs_dim)
    done: jnp.ndarray       # (cap,)  1.0 where terminated (not truncated)
    ptr: jnp.ndarray        # () int32 next write position
    size: jnp.ndarray      # () int32 current fill


def buffer_init(capacity: int, obs_dim: int, act_dim: int, dtype=jnp.float32):
    return ReplayBuffer(
        obs=jnp.zeros((capacity, obs_dim), dtype),
        action=jnp.zeros((capacity, act_dim), dtype),
        reward=jnp.zeros((capacity,), dtype),
        next_obs=jnp.zeros((capacity, obs_dim), dtype),
        done=jnp.zeros((capacity,), dtype),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def buffer_add_batch(buf: ReplayBuffer, obs, action, reward, next_obs, done,
                     aligned: bool = False):
    """Insert B transitions at the write head (wrap-around).

    ``aligned=True`` is an OPT-IN fast path for callers that guarantee
    EVERY write to this buffer has the same row count B with
    ``capacity % B == 0`` (then the write head stays B-aligned and never
    wraps mid-batch): the insert lowers to ``dynamic_update_slice`` instead
    of a scatter, which matters under ``vmap`` (population training: a
    batched scatter serializes on TPU, ~40x slower collect). The learners
    round their capacity up to guarantee the invariant. With mixed write
    sizes ``aligned=True`` silently corrupts rows (DUS clamps the start
    index instead of wrapping) — the default scatter path is correct for
    any write sequence.
    """
    cap = buf.obs.shape[0]
    b = obs.shape[0]
    if b > cap:
        raise ValueError(
            f"batch of {b} transitions exceeds buffer capacity {cap}; "
            "modulo indices would silently collide"
        )
    if aligned and cap % b:
        raise ValueError(
            f"aligned insert needs capacity ({cap}) % rows ({b}) == 0"
        )
    if aligned:
        def put(dst, rows):
            return jax.lax.dynamic_update_slice(
                dst, rows.astype(dst.dtype),
                (buf.ptr,) + (0,) * (dst.ndim - 1),
            )
    else:
        idx = (buf.ptr + jnp.arange(b)) % cap

        def put(dst, rows):
            return dst.at[idx].set(rows.astype(dst.dtype))
    return buf.replace(
        obs=put(buf.obs, obs),
        action=put(buf.action, action),
        reward=put(buf.reward, reward),
        next_obs=put(buf.next_obs, next_obs),
        done=put(buf.done, done),
        ptr=(buf.ptr + b) % cap,
        size=jnp.minimum(buf.size + b, cap),
    )


def buffer_sample(buf: ReplayBuffer, key, batch_size: int):
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(buf.size, 1))
    return dict(
        obs=buf.obs[idx],
        action=buf.action[idx],
        reward=buf.reward[idx],
        next_obs=buf.next_obs[idx],
        done=buf.done[idx],
    )
