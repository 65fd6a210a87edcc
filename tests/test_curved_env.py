"""usv-curved-aitsmc: curved/waypoint-path AITSMC env (BASELINE config 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from usv_tpu.envs import make
from usv_tpu.envs.curved import CurvedEnvConfig, reset, reset_obs, step
from usv_tpu.utils.path_gen import pchip_eval

CFG = CurvedEnvConfig()


def test_reset_builds_valid_path():
    state = reset(CFG, jax.random.key(0))
    wps = np.asarray(state.waypoints)
    assert wps.shape == (8, 2)
    # strictly increasing x knots (required by the interpolant)
    assert np.all(np.diff(wps[:, 0]) > 0)
    # path passes through the knots
    ys = np.asarray(pchip_eval(state.path, wps[:, 0]))
    np.testing.assert_allclose(ys, wps[:, 1], atol=1e-4)
    # boat starts at the first waypoint
    np.testing.assert_allclose(
        np.asarray(state.dyn.pose[:2]), wps[0], atol=1e-5
    )
    obs = reset_obs(CFG, state)
    assert obs.shape == (CFG.obs_dim,)


def test_randomized_starts_differ():
    s1 = reset(CFG, jax.random.key(1))
    s2 = reset(CFG, jax.random.key(2))
    assert not np.allclose(
        np.asarray(s1.waypoints), np.asarray(s2.waypoints)
    )


def test_aitsmc_follows_curved_path():
    # A simple proportional-on-angle pilot through the AITSMC loop should
    # track the curved path: |ye| stays small while x progresses. Obstacles
    # are masked off — the blind pilot cannot avoid the on-path ones (that
    # termination is covered separately below).
    state = reset(CFG, jax.random.key(3))
    state = state.replace(obs_mask=jnp.zeros_like(state.obs_mask))
    jstep = jax.jit(lambda s, a: step(CFG, s, a))
    max_ye = 0.0
    for i in range(400):
        obs = reset_obs(CFG, state)
        angle = float(obs[3]) * np.pi
        action = jnp.asarray([0.6, np.clip(2.5 * angle, -1, 1)], jnp.float32)
        state, ts = jstep(state, action)
        max_ye = max(max_ye, abs(float(ts.info["ye"])))
        if bool(ts.terminated):
            break
    assert float(state.dyn.pose[0]) > 2.0   # made along-track progress
    assert max_ye < 5.0                      # stayed near the path
    assert np.isfinite(float(ts.reward))


def test_vmapped_batch():
    h = make("usv-curved-aitsmc")
    B = 8
    states = jax.vmap(lambda k: h.reset(h.cfg, k))(
        jax.random.split(jax.random.key(4), B)
    )
    actions = jnp.tile(jnp.asarray([[0.5, 0.0]], jnp.float32), (B, 1))
    states, ts = jax.jit(jax.vmap(lambda s, a: h.step(h.cfg, s, a)))(
        states, actions
    )
    assert ts.obs.shape == (B, h.cfg.obs_dim)
    assert np.all(np.isfinite(np.asarray(ts.reward)))


def test_on_path_obstacle_collides_blind_pilot():
    # with obstacles active, the blind path follower eventually collides
    state = reset(CFG, jax.random.key(3))
    jstep = jax.jit(lambda s, a: step(CFG, s, a))
    collided = False
    for _ in range(400):
        obs = reset_obs(CFG, state)
        angle = float(obs[3]) * np.pi
        state, ts = jstep(
            state, jnp.asarray([0.6, np.clip(2.5 * angle, -1, 1)], jnp.float32)
        )
        if bool(ts.info["collision"]):
            collided = True
            break
    assert collided


def test_curved_gym_adapter_and_render():
    import os

    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    import gymnasium

    from usv_tpu.compat import register_gymnasium_envs

    register_gymnasium_envs()
    env = gymnasium.make("usv-curved-aitsmc", render_mode="rgb_array")
    obs, info = env.reset(seed=3)
    assert obs.shape == env.observation_space.shape
    obs, r, term, trunc, info = env.step(np.asarray([0.5, 0.0], np.float32))
    frame = env.render()
    assert frame.shape == (512, 512, 3) and frame.dtype == np.uint8
    # path polyline / obstacles / boat were actually drawn
    assert (frame < 250).any()
    env.close()


def test_arrival_terminates():
    state = reset(CFG, jax.random.key(5))
    pose = state.dyn.pose.at[0].set(state.waypoints[-1, 0] + 1.0)
    state = state.replace(dyn=state.dyn.replace(pose=pose))
    state, ts = step(CFG, state, jnp.zeros(2))
    assert bool(ts.terminated)
    assert bool(ts.info["arrived"])
