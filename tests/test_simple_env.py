"""Functional UsvSimpleEnv core tests: semantics pinned to the reference
(simple_env.py), batch/autoreset behavior, and scripted golden scenarios."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usv_tpu.envs import make
from usv_tpu.envs.simple import (
    SimpleEnvConfig,
    compute_reward,
    observe,
    reset,
    reset_obs,
    step,
)

CFG = SimpleEnvConfig()


def test_reset_shapes_and_ranges():
    state = reset(CFG, jax.random.key(0))
    assert state.position.shape == (3,)
    assert state.obs_xy.shape == (CFG.obstacle_cap, 2)
    n_valid = int(jnp.sum(state.obs_mask))
    assert 1 <= n_valid <= 30
    assert 0.0 <= float(state.reference_velocity) <= 3.0
    assert float(state.max_action[1]) == 0.0
    # boat starts at path_start (reference :238)
    np.testing.assert_allclose(
        np.asarray(state.position[:2]), np.asarray(state.path_start)
    )
    obs = reset_obs(CFG, state)
    assert obs.shape == (143,)
    assert obs.dtype == jnp.float32


def test_obs_layout_matches_reference():
    state = reset(CFG, jax.random.key(1))
    obs = observe(CFG, state, jnp.zeros(3))
    np.testing.assert_allclose(
        np.asarray(obs[:3]), np.asarray(state.velocity) / 10.0, rtol=1e-6
    )
    # kinem block: max_action/10 then max_acceleration/10 (reference :85-89)
    np.testing.assert_allclose(
        np.asarray(obs[9:12]), np.asarray(state.max_action) / 10.0, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(obs[12:15]), np.asarray(state.max_acceleration) / 10.0, rtol=1e-6
    )
    # sensor block: distances / max_range; zeros at reset (fresh env)
    np.testing.assert_allclose(np.asarray(obs[15:]), np.zeros(128))


def test_step_moves_boat_forward():
    state = reset(CFG, jax.random.key(2))
    action = jnp.asarray([1.0, 0.0], dtype=jnp.float32)
    jstep = jax.jit(lambda s, a: step(CFG, s, a))
    p0 = np.asarray(state.position[:2]).copy()
    for _ in range(20):
        state, ts = jstep(state, action)
    p1 = np.asarray(state.position[:2])
    assert np.linalg.norm(p1 - p0) > 0.1
    assert np.isfinite(float(ts.reward))


def test_ema_action_smoothing():
    # After one step with action a, last_action == 0.2 * max_action * [a0,0,a1]
    state = reset(CFG, jax.random.key(3))
    action = jnp.asarray([1.0, -1.0], dtype=jnp.float32)
    new_state, _ = step(CFG, state, action)
    expected = 0.2 * np.asarray(state.max_action) * np.array([1.0, 0.0, -1.0])
    np.testing.assert_allclose(
        np.asarray(new_state.last_action), expected, rtol=1e-5
    )


def test_progress_is_monotone():
    state = reset(CFG, jax.random.key(4))
    jstep = jax.jit(lambda s, a: step(CFG, s, a))
    last_progress = float(state.progress)
    for i in range(50):
        state, _ = jstep(state, jnp.asarray([0.5, 0.1 * ((-1) ** i)]))
        p = float(state.progress)
        assert p >= last_progress - 1e-7
        last_progress = p


def test_observation_uses_previous_action():
    # Reference :338 quirk — obs action block reflects last step's action.
    state = reset(CFG, jax.random.key(5))
    a1 = jnp.asarray([1.0, 0.5], dtype=jnp.float32)
    state1, ts1 = step(CFG, state, a1)
    # the action block of obs from step 1 must be last_action BEFORE the EMA
    # update, i.e. zeros at the first step
    np.testing.assert_allclose(np.asarray(ts1.obs[7:9]), np.zeros(2), atol=1e-7)
    state2, ts2 = step(CFG, state1, a1)
    expected = np.asarray(state1.last_action)[[0, 2]] / np.asarray(
        state1.max_action
    )[[0, 2]]
    np.testing.assert_allclose(np.asarray(ts2.obs[7:9]), expected, rtol=1e-5)


def test_out_of_bounds_truncates():
    state = reset(CFG, jax.random.key(6))
    # Teleport the boat near the edge heading out
    state = state.replace(
        position=jnp.asarray([19.99, 10.0, 0.0]),
        velocity=jnp.asarray([3.0, 0.0, 0.0]),
        last_action=jnp.asarray([3.0, 0.0, 0.0]),
    )
    state, ts = step(CFG, state, jnp.asarray([1.0, 0.0]))
    assert bool(ts.truncated)


def test_collision_terminates_and_penalizes():
    state = reset(CFG, jax.random.key(7))
    # Put one obstacle directly on the boat
    obs_xy = state.obs_xy.at[0].set(state.position[:2] + jnp.asarray([0.3, 0.0]))
    obs_r = state.obs_r.at[0].set(0.3)
    mask = jnp.zeros_like(state.obs_mask).at[0].set(True)
    state = state.replace(obs_xy=obs_xy, obs_r=obs_r, obs_mask=mask)
    state, ts = step(CFG, state, jnp.asarray([0.0, 0.0]))
    assert bool(ts.terminated)
    assert float(ts.reward) < -15  # collision penalty -20 dominates


def test_ignore_obstacles_mode():
    cfg = SimpleEnvConfig(ignore_obstacles=True)
    state = reset(cfg, jax.random.key(8))
    obs_xy = state.obs_xy.at[0].set(state.position[:2])
    state = state.replace(obs_xy=obs_xy)
    state, ts = step(cfg, state, jnp.asarray([0.0, 0.0]))
    assert not bool(ts.terminated)
    assert float(jnp.min(state.sensor_dist)) == cfg.sensor_max_range


def test_time_limit():
    cfg = SimpleEnvConfig(max_episode_steps=5)
    state = reset(cfg, jax.random.key(9))
    jstep = jax.jit(lambda s, a: step(cfg, s, a))
    for i in range(5):
        state, ts = jstep(state, jnp.asarray([0.2, 0.0]))
    assert bool(ts.truncated)


def test_reward_decomposition_sums():
    state = reset(CFG, jax.random.key(10))
    state, ts = step(CFG, state, jnp.asarray([0.7, 0.3]))
    info = ts.info
    total = (
        float(info["ye_reward"])
        + float(info["angle_to_target_reward"])
        + float(info["velocity_track_reward"])
        + float(info["delta_action_reward"])
    )
    # no collision at reset-start (obstacles pruned near start)
    assert abs(total - float(ts.reward)) < 1e-5


def test_registry_make():
    h = make("usv-simple", max_episode_steps=100)
    assert h.cfg.max_episode_steps == 100
    state = h.reset(h.cfg, jax.random.key(0))
    state, ts = h.step(h.cfg, state, jnp.zeros(2))
    assert ts.obs.shape == (143,)
