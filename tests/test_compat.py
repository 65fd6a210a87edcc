"""Gymnasium adapter tests: the reference's exact API surface."""

import gymnasium
import numpy as np
import pytest

from usv_tpu.compat import (
    UsvAsmcCaEnv,
    UsvAsmcEnv,
    UsvSimpleEnv,
    register_gymnasium_envs,
)


@pytest.fixture(scope="module", autouse=True)
def _register():
    register_gymnasium_envs()


def test_gym_make_simple():
    env = gymnasium.make("usv-simple")
    obs, info = env.reset(seed=1)
    assert obs.shape == (143,)
    assert env.action_space.shape == (2,)
    np.testing.assert_allclose(env.action_space.low, [0.2, -1.0])
    total = 0.0
    for _ in range(10):
        obs, reward, terminated, truncated, info = env.step(
            np.zeros(2, np.float32)
        )
        total += reward
    assert np.isfinite(total)
    env.close()


def test_reset_info_matches_reference_surface():
    """Reference reset returns ``_get_info(-1, np.zeros(3))``
    (simple_env.py:303-308): same keys as step info, reward=-1, zero action."""
    env = UsvSimpleEnv(render_mode=None)
    obs, info = env.reset(seed=3)
    for key in ("position", "velocity", "path_start", "path_end", "reward",
                "action0", "action1", "left_thruster", "right_thruster",
                "ye", "angle_to_target"):
        assert key in info, key
    assert float(info["reward"]) == -1.0
    assert float(info["action0"]) == 0.0
    assert float(info["action1"]) == 0.0
    # info reflects the post-reset state
    np.testing.assert_allclose(
        np.asarray(info["position"])[:2], np.asarray(info["path_start"]),
        atol=1e-5,
    )
    env.close()


def test_gym_time_limit_wrapping():
    env = gymnasium.make("usv-simple")  # max_episode_steps=500
    assert env.spec.max_episode_steps == 500


def test_direct_class_reset_step():
    env = UsvSimpleEnv(render_mode=None)
    obs, info = env.reset(seed=0)
    obs2, r, term, trunc, info = env.step(np.array([0.5, 0.1], np.float32))
    assert obs2.shape == (143,)
    assert isinstance(r, float)
    assert "ye" in info
    env.close()


def test_custom_experiment_scene():
    # tools/test_env.py experiment_1-style scripted scene
    env = UsvSimpleEnv(
        render_mode=None,
        options={"run_custom_experiment": True},
    )
    exp = {
        "obstacle_positions": np.array([[10.0, 12.0], [8.0, 12.0]]),
        "obstacle_radius": np.array([1.5, 1.5]),
        "path_start": np.array([10.0, 4.0]),
        "angle": np.pi / 2,
        "position": np.array([10.0, 4.0, np.pi / 2]),
    }
    obs, _ = env.reset(options={"run_custom_experiment": True, "experiment": exp})
    st = env._state
    np.testing.assert_allclose(np.asarray(st.position), exp["position"])
    assert int(np.asarray(st.obs_mask).sum()) == 2
    # stepping toward the wall eventually sees it in the sensors
    for _ in range(40):
        obs, r, term, trunc, _ = env.step(np.array([1.0, 0.0], np.float32))
        if term:
            break
    assert np.asarray(st.obs_mask).sum() == 2
    env.close()


def test_ca_env_adapter():
    env = UsvAsmcCaEnv(render_mode=None)
    obs, info = env.reset(seed=3)
    assert obs.shape == (23,)
    obs, r, term, trunc, info = env.step(np.array([0.2, 0.0], np.float32))
    assert np.isfinite(r)
    env.close()


def test_ca_env_scripted_options():
    env = UsvAsmcCaEnv(render_mode=None)
    options = {
        "obs_x": np.array([-6.0, 0.0, 6.0]),
        "obs_y": np.array([0.0, 0.0, 0.0]),
        "obs_r": np.array([1.5, 1.5, 1.5]),
        "start_position": np.array([0.0, -8.0, 0.0]),
        "target_point": np.array([0.0, 8.0, 0.0]),
        "renderplots": False,
    }
    obs, _ = env.reset(seed=0, options=options)
    st = env._state
    assert int(np.asarray(st.obs_mask).sum()) == 3
    np.testing.assert_allclose(np.asarray(st.target_point), [0.0, 8.0])
    env.close()


def test_legacy_adapter_old_gym_api():
    env = UsvAsmcEnv(render_mode=None)
    obs = env.reset(seed=5)  # legacy: obs only
    assert obs.shape == (6,)
    out = env.step(np.zeros(1, np.float32))
    assert len(out) == 4  # old-gym 4-tuple
    env.close()


def test_rgb_array_render():
    env = UsvSimpleEnv(render_mode="rgb_array")
    env.reset(seed=7)
    frame = env.render()
    assert frame.shape == (512, 512, 3)
    assert frame.dtype == np.uint8
    env.close()


def test_vector_env_adapter():
    from usv_tpu.compat import UsvVectorEnv

    venv = UsvVectorEnv("usv-simple", num_envs=8, frame_stack=2)
    obs, info = venv.reset(seed=3)
    assert obs.shape == (8, 2 * 143)
    assert venv.action_space.shape == (8, 2)
    actions = np.zeros((8, 2), np.float32)
    for _ in range(3):
        obs, rewards, terminated, truncated, infos = venv.step(actions)
    assert obs.shape == (8, 2 * 143)
    assert rewards.shape == (8,)
    assert terminated.dtype == bool
    assert infos["terminal_observation"].shape == (8, 143)
    # gymnasium-conventional key + SameStep autoreset declaration
    assert infos["final_obs"].shape == (8, 143)
    assert venv.metadata["autoreset_mode"] == "SameStep"
    venv.close()


def test_legacy_render_smoke():
    import os

    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    from usv_tpu.compat import UsvAsmcEnv

    env = UsvAsmcEnv(render_mode="rgb_array")
    env.reset(seed=1)
    env.step(np.asarray([0.2], np.float32))
    frame = env.render()
    assert frame.shape == (512, 512, 3) and frame.dtype == np.uint8
    env.close()
