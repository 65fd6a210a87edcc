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
