"""Sharding layouts for learner train states.

Applies the layout rules of :mod:`usv_tpu.parallel.mesh` to a whole
``SacTrainState``/``PpoTrainState``: env-batch leaves sharded over the mesh's
``env`` axis, replay buffer sharded over its capacity axis (each shard keeps
its own envs' transitions), everything else (params, optimizer state, RNG,
counters) replicated. Running the already-jitted learner step on such a
state makes XLA emit the data-parallel program: per-shard env stepping and
buffer traffic stay chip-local, gradient reductions become psums over ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _put_batch_axis0(tree, mesh: Mesh, axis_name: str):
    """Shard rank>=1 leaves on axis 0, replicate rank-0 leaves (counters)."""
    batch = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return jax.device_put(
        tree, jax.tree.map(lambda x: batch if jnp_ndim(x) >= 1 else repl, tree)
    )


def jnp_ndim(x):
    return getattr(x, "ndim", 0)


def shard_sac_train_state(ts, mesh: Mesh, axis_name: str = "env"):
    from usv_tpu.parallel.mesh import replicate

    repl = NamedSharding(mesh, P())

    def put_repl(tree):
        return replicate(tree, mesh)

    sde = ts.sde
    if sde is not None:
        # per-env exploration matrices ride the batch axis like the envs
        sde = _put_batch_axis0(sde, mesh, axis_name)
    return ts.replace(
        sde=sde,
        actor_params=put_repl(ts.actor_params),
        critic_params=put_repl(ts.critic_params),
        target_critic_params=put_repl(ts.target_critic_params),
        log_alpha=jax.device_put(ts.log_alpha, repl),
        actor_opt=put_repl(ts.actor_opt),
        critic_opt=put_repl(ts.critic_opt),
        alpha_opt=put_repl(ts.alpha_opt),
        buffer=_put_batch_axis0(ts.buffer, mesh, axis_name),
        env_state=_put_batch_axis0(ts.env_state, mesh, axis_name),
        frames=_put_batch_axis0(ts.frames, mesh, axis_name),
        key=jax.device_put(ts.key, repl),
        env_steps=jax.device_put(ts.env_steps, repl),
        grad_steps=jax.device_put(ts.grad_steps, repl),
    )


def shard_ppo_train_state(ts, mesh: Mesh, axis_name: str = "env"):
    from usv_tpu.parallel.mesh import replicate

    repl = NamedSharding(mesh, P())

    def put_repl(tree):
        return replicate(tree, mesh)

    sde = ts.sde
    if sde is not None:
        sde = _put_batch_axis0(sde, mesh, axis_name)
    return ts.replace(
        sde=sde,
        params=put_repl(ts.params),
        opt_state=put_repl(ts.opt_state),
        env_state=_put_batch_axis0(ts.env_state, mesh, axis_name),
        frames=_put_batch_axis0(ts.frames, mesh, axis_name),
        key=jax.device_put(ts.key, repl),
        update_count=jax.device_put(ts.update_count, repl),
    )
