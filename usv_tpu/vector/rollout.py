"""Device-resident rollouts and the throughput benchmark protocol.

``rollout_scan`` keeps the entire rollout on device under ``lax.scan`` (no
host round-trips — SURVEY.md §7.3's requirement for the 10 M steps/s target);
``throughput`` reproduces the reference's benchmark protocol
(``tools/profile_env.py:1-8``: N zero-action steps of ``usv-simple``) at
arbitrary batch width.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from usv_tpu.envs.autoreset import (
    default_reset_pool,
    make_autoreset_step,
    make_pooled_autoreset_step,
)
from usv_tpu.envs.registry import EnvHandle


def rollout_scan(
    handle: EnvHandle,
    num_envs: int,
    n_steps: int,
    policy_fn: Optional[Callable] = None,
    collect: bool = False,
    reset_pool: Optional[int] = None,
):
    """Build a jitted function: key -> rollout aggregates.

    policy_fn(obs, key) -> actions; defaults to zero actions (the reference
    profile protocol). With ``collect=True`` the full (T, B, ...) obs/reward
    trajectory is returned; otherwise only final state + running aggregates
    (reward sum, done count) to keep HBM traffic minimal.

    ``reset_pool``: fresh resets generated per step (see
    :func:`make_pooled_autoreset_step`). None uses
    :func:`default_reset_pool`, which is currently 0 — the per-env select
    path everywhere (the pooled variant measured SLOWER on TPU); pass an
    explicit F > 0 to opt in.
    """
    cfg = handle.cfg
    pool = default_reset_pool(num_envs) if reset_pool is None else reset_pool
    if pool and pool < num_envs:
        auto = make_pooled_autoreset_step(
            cfg, handle.step, handle.reset, handle.reset_obs, num_envs, pool
        )
    else:
        auto = jax.vmap(
            make_autoreset_step(cfg, handle.step, handle.reset, handle.reset_obs)
        )
    vreset = jax.vmap(partial(handle.reset, cfg))
    vreset_obs = jax.vmap(partial(handle.reset_obs, cfg))

    def run(key):
        kr, kp = jax.random.split(key)
        state = vreset(jax.random.split(kr, num_envs))
        obs0 = vreset_obs(state)

        def body(carry, step_key):
            state, obs, reward_sum, done_count = carry
            if policy_fn is None:
                actions = jnp.zeros((num_envs, cfg.action_dim), dtype=jnp.float32)
            else:
                actions = policy_fn(obs, step_key)
            state, ts = auto(state, actions)
            carry = (
                state,
                ts.obs,
                reward_sum + jnp.sum(ts.reward),
                done_count + jnp.sum(ts.done),
            )
            out = (ts.obs, ts.reward, ts.done) if collect else None
            return carry, out

        keys = jax.random.split(kp, n_steps)
        (state, obs, reward_sum, done_count), traj = jax.lax.scan(
            body, (state, obs0, jnp.zeros(()), jnp.zeros((), jnp.int32)), keys
        )
        # obs MUST be part of the output: with the default zero-action
        # policy nothing else consumes it, and XLA's while-loop dead-tuple
        # elimination would silently skip per-step observation assembly —
        # inflating the benchmark ~10% (measured; docs/PERFORMANCE.md
        # "Autoreset step anatomy"). The reference protocol
        # (tools/profile_env.py:1-8) builds obs every step.
        if collect:
            return state, obs, reward_sum, done_count, traj
        return state, obs, reward_sum, done_count

    return jax.jit(run)


def throughput(
    handle: EnvHandle,
    num_envs: int,
    n_steps: int = 10_000,
    repeats: int = 3,
    policy_fn=None,
):
    """Measure env-steps/s: compile once, best of ``repeats`` timed runs."""
    run = rollout_scan(handle, num_envs, n_steps, policy_fn=policy_fn)

    def run_sync(key):
        # fetch a scalar: block_until_ready alone does not reliably block on
        # remote/experimental platforms (observed on the axon TPU tunnel)
        out = run(key)
        return float(out[2])  # reward_sum (out = state, obs, rsum, dones)

    run_sync(jax.random.key(0))  # compile + warm up
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        run_sync(jax.random.key(i + 1))
        best = min(best, time.perf_counter() - t0)
    steps = num_envs * n_steps
    return {
        "env_steps": steps,
        "seconds": best,
        "steps_per_second": steps / best,
    }
