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
