"""Golden-value tests: obs/reward math pinned to hand-derived numbers from
the reference formulas (guards the quirky constants against regressions)."""

import jax
import jax.numpy as jnp
import numpy as np

from usv_tpu.envs.asmc_ca import CaEnvConfig
from usv_tpu.envs.asmc_ca import reset as ca_reset
from usv_tpu.envs.asmc_ca import step as ca_step
from usv_tpu.envs.simple import (
    SimpleEnvConfig,
    compute_reward,
    observe,
    reset,
)


def _crafted_state():
    """Boat at (5, 11), heading 0; straight path y=10 heading east; known vel."""
    cfg = SimpleEnvConfig()
    state = reset(cfg, jax.random.key(0))
    state = state.replace(
        position=jnp.asarray([5.0, 11.0, 0.0]),
        velocity=jnp.asarray([1.0, 0.0, 0.0]),
        last_action=jnp.asarray([0.5, 0.0, 0.2]),
        path_start=jnp.asarray([0.0, 10.0]),
        path_end=jnp.asarray([100.0, 10.0]),
        target_position=jnp.asarray([10.0, 10.0]),
        reference_velocity=jnp.asarray(1.0),
        max_action=jnp.asarray([2.0, 0.0, 4.0]),
        sensor_dist=jnp.full(cfg.sensor_count, 100.0),
    )
    return cfg, state


def test_simple_reward_golden():
    cfg, state = _crafted_state()
    action3 = jnp.asarray([1.0, 0.0, 0.4])
    reward, info = compute_reward(cfg, state, action3)

    # hand-derived from reference simple_env.py:150-186:
    ye = 1.0  # -(5-0)*sin(0) + (11-10)*cos(0)
    k = 0.075
    ye_reward = max(np.exp(-abs(ye / k)), np.exp(-((ye / k) ** 2)))
    # angle to target: atan2(10-11, 10-5) - 0 = atan2(-1, 5)
    angle = np.arctan2(-1.0, 5.0)
    angle_reward = np.exp(-abs(angle))
    # delta action vs last_action [0.5,0,0.2]
    delta = abs(0.5 - 1.0) + 0.0 + abs(0.2 - 0.4)
    delta_reward = -(delta / 2) * 0.15
    vel_reward = np.exp(-abs(np.hypot(1.0, 0.0) - 1.0)) * 0.05
    expected = ye_reward + angle_reward + delta_reward + vel_reward  # no collision

    np.testing.assert_allclose(float(reward), expected, rtol=1e-5)
    np.testing.assert_allclose(float(info["ye_reward"]), ye_reward, rtol=1e-5)
    np.testing.assert_allclose(
        float(info["angle_to_target_reward"]), angle_reward, rtol=1e-5
    )
    assert float(info["angle_action_reward"]) == 0.0  # zeroed (ref :178)


def test_simple_collision_threshold_golden():
    cfg, state = _crafted_state()
    # min sensor just above / below the 0.2 threshold
    s_above = state.replace(
        sensor_dist=state.sensor_dist.at[0].set(0.201)
    )
    s_below = state.replace(
        sensor_dist=state.sensor_dist.at[0].set(0.199)
    )
    r_above, _ = compute_reward(cfg, s_above, jnp.zeros(3))
    r_below, _ = compute_reward(cfg, s_below, jnp.zeros(3))
    np.testing.assert_allclose(float(r_above) - float(r_below), 20.0, rtol=1e-5)


def test_simple_obs_golden():
    cfg, state = _crafted_state()
    obs = observe(cfg, state, jnp.asarray([0.5, 0.0, 0.2]))
    # velocity block /10
    np.testing.assert_allclose(np.asarray(obs[:3]), [0.1, 0.0, 0.0], atol=1e-6)
    # target block: [angle/pi, dist/hypot(20,20), ye/10, ref/10]
    angle = np.arctan2(-1.0, 5.0)
    dist = np.hypot(5.0, 1.0)
    np.testing.assert_allclose(
        np.asarray(obs[3:7]),
        [angle / np.pi, dist / np.hypot(20, 20), 1.0 / 10, 1.0 / 10],
        rtol=1e-5,
    )
    # action block: action[[0,2]]/max_action[[0,2]] = [0.5/2, 0.2/4]
    np.testing.assert_allclose(np.asarray(obs[7:9]), [0.25, 0.05], rtol=1e-5)
    # sensors /100
    np.testing.assert_allclose(np.asarray(obs[15:]), 1.0, atol=1e-6)


def test_ca_reward_golden():
    cfg = CaEnvConfig()
    state = ca_reset(cfg, jax.random.key(1))
    # plant the boat at a known offset from the target, no obstacles
    target = state.target_point
    pose = jnp.asarray([float(target[0]) - 10.0, float(target[1]), 0.0])
    state = state.replace(
        dyn=state.dyn.replace(
            pose=pose, vel=jnp.zeros(3),
            accel_last=jnp.zeros(3), eta_dot_last=jnp.zeros(3),
        ),
        obs_mask=jnp.zeros_like(state.obs_mask),
        ctrl=jax.tree.map(jnp.zeros_like, state.ctrl),
    )
    # action [-1, 0]: velocity setpoint -1, heading 0 -> thrusters fire but
    # one step moves the boat little; check reward ~ -d/75 - |ang|/pi + 0.5*v
    state2, ts = ca_step(cfg, state, jnp.asarray([-1.0, 0.0]))
    d = float(
        jnp.hypot(
            state2.dyn.pose[0] - target[0], state2.dyn.pose[1] - target[1]
        )
    )
    ang = float(
        jnp.arctan2(
            target[1] - state2.dyn.pose[1], target[0] - state2.dyn.pose[0]
        ) - state2.dyn.pose[2]
    )
    ang = np.arctan2(np.sin(ang), np.cos(ang))
    v = float(jnp.hypot(state2.dyn.vel[0], state2.dyn.vel[1]))
    expected = -d / 75.0 - abs(ang) / np.pi + 0.5 * v
    np.testing.assert_allclose(float(ts.reward), expected, rtol=1e-4, atol=1e-5)
