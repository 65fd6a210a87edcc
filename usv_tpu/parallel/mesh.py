"""Device-mesh sharding of the env batch and learner state.

The TPU-native replacement for the reference's (absent) distributed backend
(SURVEY.md §2.3): a 1-D ``env`` mesh shards the environment batch axis across
chips/hosts via ``NamedSharding``; learner parameters are replicated; XLA
inserts the ICI collectives (psum for gradient all-reduce, all-gathers for
metrics) from the sharding annotations alone — there is no NCCL/MPI analog to
manage.

Layout rules:
* env-state pytrees, observations, actions, rewards: sharded on axis 0 (P("env"))
* network params, optimizer state, scalars: replicated (P())
* the replay buffer: sharded on its capacity axis — each shard holds the
  transitions its own envs produced, and batch sampling gathers per-shard.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_env_mesh(devices: Optional[Sequence] = None, axis_name: str = "env") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(devices, (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "env") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_batch(tree, mesh: Mesh, axis_name: str = "env"):
    """Place a batched pytree with axis 0 sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.device_put(tree, jax.tree.map(lambda _: sh, tree))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, opt state) on every device of the mesh."""
    sh = replicated_sharding(mesh)
    return jax.device_put(tree, jax.tree.map(lambda _: sh, tree))
