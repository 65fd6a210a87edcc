"""Numerical guards: NaN detection for the physics hot path.

The aux-subsystem upgrade over the reference (SURVEY.md §5: its only guard is
``faulthandler``; the dynamics can diverge under extreme thrust). Two tiers:

* :func:`checked_step` — wrap any env step with ``checkify`` NaN/inf checks
  on the output state (debug tier; adds cost, not for the hot loop).
* :func:`sanitize_state` — branch-free production tier: replace non-finite
  pose/velocity leaves with a reset-safe value and flag the env, so one
  diverged env in a 4096-batch cannot poison a whole rollout (it terminates
  and auto-resets instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked_step(step_fn):
    """Wrap step(cfg, state, action) with NaN/inf checks on outputs.

    Returns fn(cfg, state, action) -> (err, (state, timestep)); call
    ``err.throw()`` (or inspect it) on the host.
    """

    def inner(cfg, state, action):
        new_state, ts = step_fn(cfg, state, action)
        for leaf in jax.tree.leaves(new_state):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                checkify.check(
                    jnp.all(jnp.isfinite(leaf)), "non-finite value in env state"
                )
        checkify.check(jnp.isfinite(ts.reward), "non-finite reward")
        return new_state, ts

    return checkify.checkify(inner)


def is_state_finite(state) -> jnp.ndarray:
    """Scalar bool: every float leaf of the pytree is finite.

    Reduces over ALL axes — on a single-env state this is the per-env
    verdict; on a batched state it is a whole-batch verdict."""
    flags = []
    for leaf in jax.tree.leaves(state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            axes = tuple(range(leaf.ndim))
            flags.append(jnp.all(jnp.isfinite(leaf), axis=axes))
    return jnp.stack(flags).all(axis=0)


def is_state_sane(state, bound: float = 1e4) -> jnp.ndarray:
    """Scalar bool: every float leaf is finite AND |value| < bound.

    Finiteness alone is not enough to catch a hydrodynamic blow-up: the
    divergence is explosive (repeated squaring in the damping terms), so the
    step that crosses from sane values to float32 overflow computes its
    reward from an exploded-but-still-finite state — e.g. the CA env's
    +0.5*||v|| term produced single rewards of ~1e26, which wrecks a critic
    even though nothing is NaN yet. Legitimate magnitudes in every env
    family are <= a few hundred (positions <~200, velocities <~15, adaptive
    gains / integrators <~100, unwrapped headings <~1.5e3), so the default
    bound of 1e4 has wide margin on both sides."""
    flags = []
    for leaf in jax.tree.leaves(state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            axes = tuple(range(leaf.ndim))
            flags.append(jnp.all(jnp.abs(leaf) < bound, axis=axes))
    return jnp.stack(flags).all(axis=0)


def make_sanitized_step(step_fn, cfg, bound: float = 1e4):
    """Production guard: if a step produces a non-finite or absurdly large
    state (see :func:`is_state_sane`), mark the env terminated (so autoreset
    replaces it), zero that step's reward, and zero the poisoned leaves.

    Wrap the SINGLE-env step and vmap the result (``jax.vmap(
    make_sanitized_step(step, cfg))``) — wrapping an already-batched step
    would reduce the verdict over the whole batch and terminate/zero every
    env when any one diverges."""

    def inner(state, action):
        new_state, ts = step_fn(cfg, state, action)
        ok = is_state_sane(new_state, bound)

        def clean(leaf):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                return jnp.where(jnp.abs(leaf) < bound, leaf, 0.0)
            return leaf

        new_state = jax.tree.map(clean, new_state)
        info = dict(ts.info)
        info["diverged"] = ~ok  # observable in eval/info-flag summaries
        ts = ts.replace(
            terminated=ts.terminated | ~ok,
            reward=jnp.where(ok & (jnp.abs(ts.reward) < bound), ts.reward, 0.0),
            obs=jnp.where(jnp.abs(ts.obs) < bound, ts.obs, 0.0),
            info=info,
        )
        return new_state, ts

    return inner
