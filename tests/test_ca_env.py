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


def test_debug_history_substep_arrays():
    """debug_history=True exposes the reference's per-substep
    controller/model history (usv_asmc_ca_env.py:312-323) as fixed-shape
    (n_substeps, ...) arrays whose last entries agree with the flat info
    and the post-step state."""
    h = make("usv-asmc-ca-v0", debug_history=True)
    state = h.reset(h.cfg, jax.random.key(0))
    state, ts = jax.jit(lambda s, a: h.step(h.cfg, s, a))(
        state, jnp.array([0.5, 0.1])
    )
    ch = ts.info["controller_history"]
    mh = ts.info["model_history"]
    n = h.cfg.n_substeps
    for k in ("left_thruster", "right_thruster", "speed_error",
              "heading_error", "speed_gain", "heading_gain",
              "speed_sigma", "heading_sigma", "Tx", "Tz"):
        assert ch[k].shape == (n,), k
    assert mh["pose"].shape == (n, 3)
    assert mh["vel"].shape == (n, 3)
    # last substep agrees with the flat info and the integrated state
    np.testing.assert_allclose(
        ch["left_thruster"][-1], ts.info["left_thruster"]
    )
    np.testing.assert_allclose(mh["pose"][-1], state.dyn.pose, rtol=1e-6)
    np.testing.assert_allclose(mh["vel"][-1], state.dyn.vel, rtol=1e-6)
    # default config stays history-free (hot path unchanged)
    h2 = make("usv-asmc-ca-v0")
    _, ts2 = jax.jit(lambda s, a: h2.step(h2.cfg, s, a))(
        h2.reset(h2.cfg, jax.random.key(0)), jnp.array([0.5, 0.1])
    )
    assert "controller_history" not in ts2.info


def test_debug_history_through_gym_adapter():
    from usv_tpu.compat import UsvAsmcCaEnv

    env = UsvAsmcCaEnv(render_mode=None, debug_history=True)
    env.reset(seed=0)
    _, _, _, _, info = env.step(np.array([0.3, 0.0], np.float32))
    assert info["controller_history"]["Tz"].shape == (env.handle.cfg.n_substeps,)
    assert info["model_history"]["pose"].shape == (env.handle.cfg.n_substeps, 3)
    env.close()
