"""The vector layer must generalize across every env family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usv_tpu.envs import make, registered_ids
from usv_tpu.vector import BatchedEnv

ACTION_DIMS = {
    "usv-simple": 2,
    "usv-asmc-simple": 2,
    "usv-aitsmc-simple": 2,
    "usv-asmc-ca-v0": 2,
    "usv-asmc-v0": 1,
    "usv-pid-v0": 1,
    "usv-asmc-ye-int-v0": 1,
}


@pytest.mark.parametrize("env_id", sorted(ACTION_DIMS))
def test_batched_autoreset_all_families(env_id):
    h = make(env_id)
    benv = BatchedEnv(h, num_envs=8)
    state, obs = benv.reset(jax.random.key(0))
    assert obs.shape == (8, h.cfg.obs_dim)
    actions = jnp.zeros((8, ACTION_DIMS[env_id]), jnp.float32)
    for _ in range(3):
        state, ts = benv.step(state, actions)
    assert ts.obs.shape == (8, h.cfg.obs_dim)
    assert np.all(np.isfinite(np.asarray(ts.reward)))


def test_batched_framestack_on_variant():
    h = make("usv-aitsmc-simple")
    benv = BatchedEnv(h, num_envs=4, frame_stack=3)
    state, obs = benv.reset(jax.random.key(1))
    state, ts = benv.step(state, jnp.zeros((4, 2)))
    assert state.stacked_obs.shape == (4, 3 * 143)


def test_reference_ids_plus_curved_registered():
    # the 7 reference env IDs plus the curved-path extension (BASELINE cfg 2)
    assert set(registered_ids()) == set(ACTION_DIMS) | {"usv-curved-aitsmc"}


ALL_DIMS = {**ACTION_DIMS, "usv-curved-aitsmc": 2}


@pytest.mark.parametrize("env_id", sorted(ALL_DIMS))
def test_extreme_actions_stay_finite(env_id):
    """Bang-bang saturated actions with random sign flips must never
    produce NaN/Inf state, obs, or reward in any family (the M-inverse and
    sqrt paths are where the reference could blow up, SURVEY.md §5)."""
    h = make(env_id)
    benv = BatchedEnv(h, num_envs=8)
    state, obs = benv.reset(jax.random.key(3))
    key = jax.random.key(4)
    for i in range(40):
        key, k = jax.random.split(key)
        actions = jnp.sign(
            jax.random.normal(k, (8, ALL_DIMS[env_id]))
        ).astype(jnp.float32)
        state, ts = benv.step(state, actions)
        assert np.all(np.isfinite(np.asarray(ts.obs))), f"step {i}"
        assert np.all(np.isfinite(np.asarray(ts.reward))), f"step {i}"


def test_training_is_deterministic():
    """Same seed => bit-identical params after identical train_rounds."""
    from usv_tpu.train.sac import SacConfig, SacLearner

    cfg = SacConfig(
        buffer_size=2048, batch_size=32, learning_starts=64, num_envs=4,
        train_freq=2, gradient_steps=2, hidden=(32, 32), frame_stack=2,
    )
    h = make("usv-simple")
    outs = []
    for _ in range(2):
        learner = SacLearner(h, cfg)
        ts = learner.init(seed=9)
        ts, reward = learner.train_rounds(ts, 12)
        outs.append((
            float(reward),
            np.asarray(jax.tree.leaves(ts.actor_params)[0]),
        ))
    assert outs[0][0] == outs[1][0]
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
