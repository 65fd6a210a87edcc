"""NaN guards + video recording tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usv_tpu.envs import make
from usv_tpu.envs.simple import SimpleEnvConfig, reset, step
from usv_tpu.utils.guards import checked_step, is_state_finite, make_sanitized_step


def test_checked_step_passes_on_normal_input():
    cfg = SimpleEnvConfig()
    state = reset(cfg, jax.random.key(0))
    checked = checked_step(step)
    err, (new_state, ts) = checked(cfg, state, jnp.asarray([0.5, 0.0]))
    err.throw()  # no error


def test_checked_step_catches_poisoned_state():
    cfg = SimpleEnvConfig()
    state = reset(cfg, jax.random.key(1))
    state = state.replace(velocity=state.velocity.at[0].set(jnp.nan))
    checked = checked_step(step)
    err, _ = checked(cfg, state, jnp.asarray([0.5, 0.0]))
    with pytest.raises(Exception):
        err.throw()


def test_sanitized_step_recovers():
    cfg = SimpleEnvConfig()
    state = reset(cfg, jax.random.key(2))
    state = state.replace(position=state.position.at[0].set(jnp.inf))
    sanitized = make_sanitized_step(step, cfg)
    new_state, ts = sanitized(state, jnp.asarray([0.5, 0.0]))
    assert bool(ts.terminated)
    assert bool(is_state_finite(new_state))
    assert np.all(np.isfinite(np.asarray(ts.obs)))


def test_sanitized_step_catches_finite_explosion():
    """Exploded-but-finite states must be flagged BEFORE they overflow: the
    divergence step computes its reward from huge finite values (observed
    ~1e26 rewards on the CA env via the +0.5*||v|| term), which poisons a
    critic with no NaN in sight. The guard bounds magnitude, not just
    finiteness. (Needs a hydrodynamic env — velocity is dynamical state
    there; the kinematic simple env overwrites velocity from the action.)"""
    h = make("usv-asmc-ca-v0")
    cfg = h.cfg
    state = h.reset(cfg, jax.random.key(4))
    state = state.replace(
        dyn=state.dyn.replace(vel=state.dyn.vel.at[0].set(1e9))
    )
    sanitized = make_sanitized_step(h.step, cfg)
    new_state, ts = sanitized(state, jnp.asarray([0.5, 0.0]))
    assert bool(ts.info["diverged"])
    assert bool(ts.terminated)
    assert float(ts.reward) == 0.0
    for leaf in jax.tree.leaves(new_state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert bool(jnp.all(jnp.abs(leaf) < 1e4))


def test_sanitized_autoreset_recovers_ca_env():
    """A diverged CA env terminates, resets fresh, and flags info['diverged'].

    The real failure mode this guards (observed at 512 envs, ~750
    random-action steps): ASMC adaptive-gain windup destabilizes the
    hydrodynamics, float32 overflows to inf/NaN inside one substep block,
    and an unguarded autoreset can never fire again (NaN comparisons are
    False) — one env poisons the whole batch/replay buffer."""
    from usv_tpu.envs.autoreset import make_autoreset_step
    from usv_tpu.utils.guards import make_sanitized_step

    h = make("usv-asmc-ca-v0")
    cfg = h.cfg
    san = make_sanitized_step(h.step, cfg)
    auto = make_autoreset_step(
        cfg, lambda c, s, a: san(s, a), h.reset, h.reset_obs
    )
    state = h.reset(cfg, jax.random.key(3))
    state = state.replace(
        dyn=state.dyn.replace(vel=state.dyn.vel.at[2].set(jnp.inf))
    )
    new_state, ts = jax.jit(auto)(state, jnp.asarray([0.5, 0.0]))
    assert bool(ts.info["diverged"])
    assert bool(ts.terminated)
    assert bool(is_state_finite(new_state))
    assert np.all(np.isfinite(np.asarray(ts.obs)))
    # the replacement state is a fresh episode, not the zeroed wreck
    assert int(new_state.step_count) == 0


def test_sac_learner_survives_diverged_env():
    """sanitize_envs (default on): a poisoned env in the batch cannot poison
    the learner — one round later everything is finite again."""
    from usv_tpu.train.sac import SacConfig, SacLearner

    h = make("usv-asmc-ca-v0")
    cfg = SacConfig(
        buffer_size=1024, batch_size=32, learning_starts=32, num_envs=8,
        train_freq=4, gradient_steps=2, hidden=(32, 32), frame_stack=2,
    )
    learner = SacLearner(h, cfg)
    ts = learner.init(seed=0)
    poisoned = ts.env_state.dyn.vel.at[3, 2].set(jnp.nan)
    ts = ts.replace(env_state=ts.env_state.replace(
        dyn=ts.env_state.dyn.replace(vel=poisoned)
    ))
    ts, reward = learner.train_rounds(ts, 4)
    assert np.isfinite(float(reward))
    assert bool(is_state_finite(ts.env_state))
    assert np.all(np.isfinite(np.asarray(ts.frames)))
    for leaf in jax.tree.leaves(ts.actor_params):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_video_recording(tmp_path):
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    from usv_tpu.compat import UsvSimpleEnv
    from usv_tpu.utils.video import record_episode, video_trigger

    env = UsvSimpleEnv(render_mode="rgb_array")
    path, total = record_episode(
        env, lambda obs: np.array([0.5, 0.0], np.float32),
        tmp_path / "ep", max_steps=15, seed=0,
    )
    assert path is not None and os.path.exists(path)
    assert os.path.getsize(path) > 5_000
    env.close()

    assert video_trigger(0)
    assert video_trigger(200)  # step 1 cubic
    assert not video_trigger(500 * 200 + 200)


def test_record_rollout_video(tmp_path):
    """Device-side trace rollout -> host rendering (the TPU-friendly path)."""
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    from usv_tpu.utils.video import record_rollout_video

    handle = make("usv-simple")

    def policy(obs):
        return jnp.asarray([0.5, 0.0])

    path, reward = record_rollout_video(
        handle, policy, tmp_path / "roll", n_steps=15, seed=0, frame_stack=2,
    )
    assert path is not None and os.path.exists(path)
    assert os.path.getsize(path) > 5_000
    assert np.isfinite(reward)
