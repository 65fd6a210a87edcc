"""usv-asmc-ca-v0 functional env tests."""

import jax
import jax.numpy as jnp
import numpy as np

from usv_tpu.envs import make
from usv_tpu.envs.asmc_ca import CaEnvConfig, reset, reset_obs, step

CFG = CaEnvConfig()


def test_reset_takes_bootstrap_step():
    state = reset(CFG, jax.random.key(0))
    obs = reset_obs(CFG, state)
    assert obs.shape == (23,)
    # bootstrap step [-1, 0] ran: ASMC gains have adapted away from 0
    assert float(state.ctrl.ka_psi) != 0.0
    assert int(state.step_count) == 0


def test_step_shapes_and_reward():
    state = reset(CFG, jax.random.key(1))
    jstep = jax.jit(lambda s, a: step(CFG, s, a))
    state, ts = jstep(state, jnp.asarray([0.5, 0.0]))
    assert ts.obs.shape == (23,)
    assert np.isfinite(float(ts.reward))
    # velocity reward term: reward = -te/75 - |ang|/pi + 0.5*speed
    assert float(ts.reward) > -3.0


def test_asmc_tracks_heading_setpoint():
    state = reset(CFG, jax.random.key(2))
    # drive with absolute heading pi/2 (action_in[1] = 0.5 -> pi/2)
    jstep = jax.jit(lambda s, a: step(CFG, s, a))
    for _ in range(40):
        state, ts = jstep(state, jnp.asarray([0.3, 0.5]))
    psi = float(state.dyn.pose[2])
    assert abs(psi - np.pi / 2) < 0.4


def test_arrival_terminates():
    state = reset(CFG, jax.random.key(3))
    # teleport next to the target
    pose = jnp.concatenate([state.target_point + 0.5, jnp.zeros(1)])
    state = state.replace(dyn=state.dyn.replace(pose=pose.astype(jnp.float32)))
    state, ts = step(CFG, state, jnp.asarray([-1.0, 0.0]))
    assert bool(ts.terminated)
    assert bool(ts.info["arrived"])


def test_collision_truncates():
    state = reset(CFG, jax.random.key(4))
    obs_xy = state.obs_xy.at[0].set(state.dyn.pose[:2])
    mask = state.obs_mask.at[0].set(True)
    state = state.replace(obs_xy=obs_xy, obs_mask=mask)
    state, ts = step(CFG, state, jnp.asarray([-1.0, 0.0]))
    assert bool(ts.truncated)
    assert bool(ts.info["collision"])


def test_far_tracking_error_penalty():
    state = reset(CFG, jax.random.key(5))
    pose = jnp.asarray([90.0, 0.0, 0.0], jnp.float32)  # <100 (no oob), >40 te
    state = state.replace(dyn=state.dyn.replace(pose=pose))
    state, ts = step(CFG, state, jnp.asarray([-1.0, 0.0]))
    assert bool(ts.terminated)
    assert float(ts.reward) < -90.0


def test_registry_and_vmap():
    h = make("usv-asmc-ca-v0")
    B = 4
    keys = jax.random.split(jax.random.key(6), B)
    states = jax.vmap(lambda k: h.reset(h.cfg, k))(keys)
    actions = jnp.zeros((B, 2))
    states, ts = jax.jit(jax.vmap(lambda s, a: h.step(h.cfg, s, a)))(states, actions)
    assert ts.obs.shape == (B, 23)
