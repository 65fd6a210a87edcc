"""Mesh sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from usv_tpu.envs import make
from usv_tpu.envs.autoreset import make_autoreset_step
from usv_tpu.parallel.mesh import batch_sharding, make_env_mesh, shard_env_batch
from usv_tpu.parallel.sharded import shard_ppo_train_state, shard_sac_train_state
from usv_tpu.train.ppo import PpoConfig, PpoLearner
from usv_tpu.train.sac import SacConfig, SacLearner


def test_mesh_has_8_devices():
    mesh = make_env_mesh()
    assert mesh.devices.size == 8


def test_sharded_env_step_matches_unsharded():
    h = make("usv-simple")
    cfg = h.cfg
    B = 32
    keys = jax.random.split(jax.random.key(0), B)
    state = jax.vmap(lambda k: h.reset(cfg, k))(keys)
    actions = jnp.zeros((B, 2))
    auto = jax.vmap(make_autoreset_step(cfg, h.step, h.reset, h.reset_obs))

    step = jax.jit(lambda s, a: auto(s, a))
    plain_state, plain_ts = step(state, actions)

    mesh = make_env_mesh()
    sstate = shard_env_batch(state, mesh)
    sactions = jax.device_put(actions, batch_sharding(mesh))
    shard_state, shard_ts = step(sstate, sactions)

    np.testing.assert_allclose(
        np.asarray(plain_ts.reward), np.asarray(shard_ts.reward), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(plain_state.position), np.asarray(shard_state.position),
        rtol=1e-5,
    )
    # outputs actually sharded over the mesh
    assert len(shard_ts.reward.sharding.device_set) == 8


def test_sharded_sac_round_runs():
    cfg = SacConfig(
        num_envs=16, buffer_size=512, batch_size=32, learning_starts=0,
        train_freq=2, gradient_steps=1, hidden=(32, 32), frame_stack=2,
    )
    learner = SacLearner(make("usv-simple"), cfg)
    ts = learner.init(seed=0)
    mesh = make_env_mesh()
    ts = shard_sac_train_state(ts, mesh)
    ts, reward = learner.train_rounds(ts, 2)
    assert np.isfinite(float(reward))
    assert int(ts.grad_steps) == 2
    leaf = jax.tree.leaves(ts.actor_params)[0]
    assert bool(jnp.all(jnp.isfinite(leaf)))


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of a SHARDED train state: restore into a sharded
    template, keep training — checkpointing at scale (docs/SCALING.md)."""
    from usv_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    cfg = SacConfig(
        num_envs=16, buffer_size=512, batch_size=32, learning_starts=0,
        train_freq=2, gradient_steps=1, hidden=(32, 32), frame_stack=2,
    )
    learner = SacLearner(make("usv-simple"), cfg)
    mesh = make_env_mesh()
    ts = shard_sac_train_state(learner.init(seed=0), mesh)
    ts, _ = learner.train_rounds(ts, 3)
    save_checkpoint(tmp_path / "ckpt", ts, 7)

    template = shard_sac_train_state(learner.init(seed=1), mesh)
    restored, step = restore_checkpoint(tmp_path / "ckpt", template)
    assert step == 7
    # restored with the template's shardings, values from the saved state
    assert len(restored.frames.sharding.device_set) == 8
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.actor_params)[0]),
        np.asarray(jax.tree.leaves(ts.actor_params)[0]),
    )
    restored, reward = learner.train_rounds(restored, 2)
    assert np.isfinite(float(reward))


def test_sharded_ppo_iteration_runs():
    cfg = PpoConfig(
        n_steps=32, batch_size=32, n_epochs=1, num_envs=8,
        pi_hidden=(32, 32), vf_hidden=(32, 32), frame_stack=2,
    )
    learner = PpoLearner(make("usv-simple"), cfg)
    ts = learner.init(seed=0)
    mesh = make_env_mesh()
    ts = shard_ppo_train_state(ts, mesh)
    ts, r = learner.train_iteration(ts)
    assert np.isfinite(float(r))


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
