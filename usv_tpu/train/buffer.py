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


# --------------------------------------------------------------------------
# Shard-local variants (multi-chip scaling; docs/SCALING.md).
#
# With the capacity axis sharded over an n-device ``env`` mesh, the global
# ``buffer_sample`` draws indices over the whole buffer, so every gradient
# step gathers batch rows across all shards — an all-to-all over ICI/DCN.
# The local variants keep replay traffic chip-local by construction:
#   * insert: each shard appends its OWN envs' transitions to its OWN
#     capacity shard (``ptr``/``size`` then count LOCAL rows — identical on
#     every shard because all envs step in lockstep);
#   * sample: each shard draws batch_size/n rows uniformly from its local
#     fill. Because local fills are equal at all times, the union batch is a
#     stratified-uniform sample of the global buffer — each row's marginal
#     is exactly uniform over the filled region, strata just never collide.
# Gradients on the resulting P("env")-sharded batch become the only
# cross-chip traffic (psum inserted by XLA from the sharding annotations).
# A buffer written in local mode is NOT interchangeable with global mode
# (ptr/size units differ); keep the mode fixed across checkpoints.
# --------------------------------------------------------------------------


def buffer_add_traj_local(buf: ReplayBuffer, traj: dict, mesh, axis_name="env"):
    """Shard-local insert of a (T, B, ...) trajectory pytree.

    ``traj`` leaves are step-major scan outputs with the env batch axis B
    sharded over the mesh; each shard flattens its local (T, B/n, ...) block
    step-major and writes it at its local write head (aligned
    ``dynamic_update_slice`` — local capacity must be a multiple of the
    local block, guaranteed when capacity % (T*B) == 0).
    """
    n = mesh.shape[axis_name]
    cap = buf.obs.shape[0]
    t, b = traj["obs"].shape[:2]
    if b % n or cap % n:
        raise ValueError(f"num_envs ({b}) and capacity ({cap}) must divide "
                         f"the mesh axis ({n})")
    if (cap // n) % (t * (b // n)):
        raise ValueError("local capacity must be a multiple of the local "
                         "write block for aligned inserts")

    from jax.sharding import PartitionSpec as P

    data_spec = jax.tree.map(lambda _: P(axis_name), _data_dict(buf))
    traj_spec = jax.tree.map(lambda _: P(None, axis_name), traj)

    def f(data, ptr, size, tr):
        local_cap = data["obs"].shape[0]
        flat = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), tr
        )
        rows = flat["obs"].shape[0]

        def put(dst, src):
            return jax.lax.dynamic_update_slice(
                dst, src.astype(dst.dtype), (ptr,) + (0,) * (dst.ndim - 1)
            )

        new_data = {k: put(data[k], flat[k]) for k in data}
        return (
            new_data,
            (ptr + rows) % local_cap,
            jnp.minimum(size + rows, local_cap),
        )

    new_data, ptr, size = jax.shard_map(
        f, mesh=mesh,
        in_specs=(data_spec, P(), P(), traj_spec),
        out_specs=(data_spec, P(), P()),
    )(_data_dict(buf), buf.ptr, buf.size, traj)
    return buf.replace(ptr=ptr, size=size, **new_data)


def buffer_sample_local(buf: ReplayBuffer, key, batch_size: int, mesh,
                        axis_name="env"):
    """Stratified shard-local sample: batch_size/n rows per shard, all
    gathers chip-local; returns a batch dict sharded P("env") on axis 0."""
    n = mesh.shape[axis_name]
    if batch_size % n:
        raise ValueError(f"batch_size ({batch_size}) must divide the mesh "
                         f"axis ({n})")
    local_bs = batch_size // n

    from jax.sharding import PartitionSpec as P

    data_spec = jax.tree.map(lambda _: P(axis_name), _data_dict(buf))

    def f(data, size, key):
        shard = jax.lax.axis_index(axis_name)
        k = jax.random.fold_in(key, shard)
        idx = jax.random.randint(k, (local_bs,), 0, jnp.maximum(size, 1))
        return {k_: v[idx] for k_, v in data.items()}

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(data_spec, P(), P()),
        out_specs=jax.tree.map(lambda _: P(axis_name), _data_dict(buf)),
    )(_data_dict(buf), buf.size, key)


def buffer_reshard_local(buf: ReplayBuffer, n_src: int, n_dst: int,
                         insert_rows: int | None = None):
    """Re-layout a SHARD-LOCAL buffer's logical content from ``n_src`` to
    ``n_dst`` shard blocks (cross-topology checkpoint restore — pod resize,
    preemption onto a smaller slice; docs/SCALING.md "Cross-topology
    restore").

    A shard-local buffer's capacity axis is ``n`` contiguous blocks; the
    scalar ``ptr``/``size`` counters are per-shard-LOCAL (identical on every
    shard because inserts are uniform). Restoring such a buffer onto a mesh
    with a different shard count would silently misinterpret the block
    structure, so this function re-flattens: collect each source block's
    valid rows oldest-first, concatenate (shard-major), and redistribute
    into ``n_dst`` equal blocks. Total capacity and logical content are
    preserved; only the block partitioning (and hence which shard samples
    which row) changes — sampling remains uniform over the same row set.

    Raises ``ValueError`` when the re-layout is not well defined: capacity
    not divisible by either shard count, or the total row count not evenly
    divisible across the destination shards (refuse-and-explain rather than
    silently drop rows).

    ``insert_rows`` (recommended): the destination learner's per-shard
    write-block size, ``train_freq * num_envs // n_dst`` for SAC. The
    aligned ``dynamic_update_slice`` insert path requires the write head to
    stay a multiple of the block — a requirement every uniform-geometry run
    maintains by construction, but which a reshard can silently break when
    the new topology changes the block size (a misaligned head eventually
    CLAMPS a wrapping insert and corrupts rows without any error). Passing
    ``insert_rows`` makes this function refuse such a restore up front.
    """
    cap = buf.obs.shape[0]
    if n_src < 1 or n_dst < 1 or cap % n_src or cap % n_dst:
        raise ValueError(
            f"capacity {cap} must divide both shard counts "
            f"(src {n_src}, dst {n_dst})"
        )
    if n_src == n_dst:
        return buf
    local_src, local_dst = cap // n_src, cap // n_dst
    size = int(buf.size)
    ptr = int(buf.ptr)
    total = n_src * size
    if total % n_dst:
        raise ValueError(
            f"cannot reshard: {n_src} shards x {size} local rows = {total} "
            f"total rows does not divide {n_dst} destination shards; train "
            f"for a whole number of insert blocks first"
        )
    size_dst = total // n_dst  # <= local_dst since total <= cap
    if insert_rows is not None:
        local_dst_cap = cap // n_dst
        if local_dst_cap % insert_rows or size_dst % insert_rows:
            raise ValueError(
                f"resharded write head {size_dst} (local capacity "
                f"{local_dst_cap}) is not aligned to the destination "
                f"insert block of {insert_rows} rows; continuing would "
                f"corrupt wrapping inserts — adjust num_envs/train_freq "
                f"or the shard count so the block divides both"
            )

    def re(x):
        blocks = x.reshape((n_src, local_src) + x.shape[1:])
        if size == local_src and ptr != 0:
            # full ring: oldest row sits at ptr
            blocks = jnp.roll(blocks, -ptr, axis=1)
        rows = blocks[:, :size].reshape((total,) + x.shape[1:])
        out = jnp.zeros((n_dst, local_dst) + x.shape[1:], x.dtype)
        out = out.at[:, :size_dst].set(
            rows.reshape((n_dst, size_dst) + x.shape[1:])
        )
        return out.reshape(x.shape)

    return buf.replace(
        ptr=jnp.asarray(size_dst % local_dst, jnp.int32),
        size=jnp.asarray(size_dst, jnp.int32),
        **{k: re(v) for k, v in _data_dict(buf).items()},
    )


def _data_dict(buf: ReplayBuffer) -> dict:
    return dict(obs=buf.obs, action=buf.action, reward=buf.reward,
                next_obs=buf.next_obs, done=buf.done)
