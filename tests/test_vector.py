"""Batch layer: vmapped autoreset, frame stacking, rollout throughput."""

import jax
import jax.numpy as jnp
import numpy as np

from usv_tpu.envs import make
from usv_tpu.vector import BatchedEnv, rollout_scan, throughput


def test_batched_reset_step():
    h = make("usv-simple")
    benv = BatchedEnv(h, num_envs=16)
    state, obs = benv.reset(jax.random.key(0))
    assert obs.shape == (16, 143)
    actions = jnp.zeros((16, 2))
    state, ts = benv.step(state, actions)
    assert ts.obs.shape == (16, 143)
    assert ts.reward.shape == (16,)
    # envs are randomized differently
    assert not np.allclose(np.asarray(ts.obs[0]), np.asarray(ts.obs[1]))


def test_frame_stack():
    h = make("usv-simple")
    benv = BatchedEnv(h, num_envs=4, frame_stack=5)
    state, obs = benv.reset(jax.random.key(1))
    assert state.frames.shape == (4, 5, 143)
    # initially all frames equal the reset obs
    np.testing.assert_allclose(np.asarray(state.frames[:, 0]), np.asarray(obs))
    np.testing.assert_allclose(np.asarray(state.frames[:, 4]), np.asarray(obs))
    state, ts = benv.step(state, jnp.zeros((4, 2)))
    # newest frame is the new obs; older frames shifted
    np.testing.assert_allclose(np.asarray(state.frames[:, 4]), np.asarray(ts.obs))
    assert state.stacked_obs.shape == (4, 5 * 143)


def test_autoreset_on_time_limit():
    h = make("usv-simple", max_episode_steps=3)
    benv = BatchedEnv(h, num_envs=8)
    state, _ = benv.reset(jax.random.key(2))
    for i in range(3):
        state, ts = benv.step(state, jnp.zeros((8, 2)))
    assert np.all(np.asarray(ts.done))
    # step_count must have been reset on all envs
    assert np.all(np.asarray(state.env.step_count) == 0)
    # after autoreset, envs got fresh randomization (positions differ from
    # each other)
    pos = np.asarray(state.env.position)
    assert len(np.unique(pos[:, 2])) > 1


def test_pooled_autoreset_wave_and_fast_path():
    """BatchedEnv(reset_pool=F): wave fallback AND the pooled fast path."""
    h = make("usv-simple", max_episode_steps=3)
    benv = BatchedEnv(h, num_envs=16, reset_pool=8)
    state, _ = benv.reset(jax.random.key(4))
    for _ in range(3):
        state, ts = benv.step(state, jnp.zeros((16, 2)))
    # all 16 done at once > pool 8 -> wave fallback: full-width reset
    assert np.all(np.asarray(ts.done))
    assert np.all(np.asarray(state.env.step_count) == 0)
    pos = np.asarray(state.env.position)
    # every env got its own independent reset (no duplicated pool entries)
    assert len(np.unique(pos[:, 0])) == 16

    # desynchronize: advance two envs' step counters so only they hit the
    # TimeLimit on the next jitted step -> sum(done)=2 <= F=8 takes the
    # pooled branch inside BatchedEnv's donated step program
    sc = np.zeros(16, dtype=np.asarray(state.env.step_count).dtype)
    sc[3] = sc[11] = 2
    state = state.replace(env=state.env.replace(step_count=jnp.asarray(sc)))
    old_pos = np.asarray(state.env.position)
    state, ts = benv.step(state, jnp.zeros((16, 2)))
    done = np.asarray(ts.done)
    assert done[3] and done[11] and done.sum() == 2
    new_pos = np.asarray(state.env.position)
    # distinct fresh states from the pool, untouched envs keep stepping
    assert not np.allclose(new_pos[3], old_pos[3])
    assert not np.allclose(new_pos[11], old_pos[11])
    assert not np.allclose(new_pos[3], new_pos[11])
    sc2 = np.asarray(state.env.step_count)
    assert sc2[3] == 0 and sc2[11] == 0 and np.all(np.delete(sc2, [3, 11]) == 1)


def test_pooled_autoreset_partial_wave():
    """count <= pool: the pooled branch hands out distinct fresh states."""
    from usv_tpu.envs.autoreset import make_pooled_autoreset_step

    h = make("usv-simple", max_episode_steps=5)
    cfg = h.cfg
    auto = make_pooled_autoreset_step(
        cfg, h.step, h.reset, h.reset_obs, num_envs=8, fresh_per_step=4
    )
    keys = jax.random.split(jax.random.key(5), 8)
    state = jax.vmap(lambda k: h.reset(cfg, k))(keys)
    # stagger: manually advance step_count of envs 2 and 6 so only they hit
    # the TimeLimit on the next step
    sc = np.zeros(8, dtype=np.asarray(state.step_count).dtype)
    sc[2] = sc[6] = 4
    state = state.replace(step_count=jnp.asarray(sc))
    old_pos = np.asarray(state.position)

    auto = jax.jit(auto)
    state, ts = auto(state, jnp.zeros((8, 2)))
    done = np.asarray(ts.done)
    assert done[2] and done[6] and done.sum() == 2
    new_pos = np.asarray(state.position)
    # the two done envs were re-randomized to DIFFERENT fresh states
    assert not np.allclose(new_pos[2], old_pos[2])
    assert not np.allclose(new_pos[6], old_pos[6])
    assert not np.allclose(new_pos[2], new_pos[6])
    # step counters: reset for done envs, advanced for the rest
    sc2 = np.asarray(state.step_count)
    assert sc2[2] == 0 and sc2[6] == 0 and np.all(sc2[[0, 1, 3, 4, 5, 7]] == 1)
    # obs of done envs is the RESET observation of the fresh state (SB3
    # convention), terminal obs exposed in info
    np.testing.assert_allclose(
        np.asarray(ts.obs[2]), np.asarray(h.reset_obs(cfg, jax.tree.map(lambda x: x[2], state))),
        rtol=1e-6,
    )
    assert "terminal_observation" in ts.info


def test_rollout_scan_runs():
    h = make("usv-simple")
    run = rollout_scan(h, num_envs=32, n_steps=50)
    state, obs, reward_sum, done_count = jax.block_until_ready(run(jax.random.key(0)))
    assert np.isfinite(float(reward_sum))


def test_rollout_with_policy():
    h = make("usv-simple")

    def policy(obs, key):
        return jax.random.uniform(key, (obs.shape[0], 2), minval=-1.0, maxval=1.0)

    run = rollout_scan(h, num_envs=16, n_steps=30, policy_fn=policy)
    state, obs, reward_sum, done_count = jax.block_until_ready(run(jax.random.key(3)))
    assert np.isfinite(float(reward_sum))


def test_throughput_protocol():
    h = make("usv-simple")
    out = throughput(h, num_envs=64, n_steps=100, repeats=1)
    assert out["env_steps"] == 6400
    assert out["steps_per_second"] > 0
