"""gSDE (state-dependent exploration) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from usv_tpu.envs import make
from usv_tpu.models.mlp import PpoActorCritic, SquashedGaussianActor
from usv_tpu.models.sde import init_sde, maybe_resample, sde_noise, sde_std
from usv_tpu.train.ppo import PpoConfig, PpoLearner
from usv_tpu.train.sac import SacConfig, SacLearner


def test_sde_state_resample_schedule():
    state = init_sde(jax.random.key(0), 8, 2, batch_shape=(4,))
    mats = [state.exploration_mat]
    for i in range(1, 9):
        state = maybe_resample(state, jax.random.key(i), sample_freq=4)
        mats.append(state.exploration_mat)
    # step counter starts at 0 => resample happens at steps 0, 4, 8...
    assert not np.allclose(np.asarray(mats[0]), np.asarray(mats[1]))  # step 0 due
    np.testing.assert_allclose(np.asarray(mats[1]), np.asarray(mats[2]))
    np.testing.assert_allclose(np.asarray(mats[1]), np.asarray(mats[4]))
    assert not np.allclose(np.asarray(mats[4]), np.asarray(mats[5]))  # step 4 due


def test_sde_noise_matches_marginal_std():
    # empirical std of phi @ (sigma E) over many E draws == sde_std
    key = jax.random.key(1)
    latent = jax.random.normal(jax.random.key(2), (16,))
    log_std = jax.random.normal(jax.random.key(3), (16, 2)) * 0.3 - 1.0
    draws = []
    for i in range(500):
        st = init_sde(jax.random.fold_in(key, i), 16, 2)
        draws.append(np.asarray(sde_noise(latent, log_std, st)))
    emp = np.std(np.stack(draws), axis=0)
    want = np.asarray(sde_std(latent, log_std))
    np.testing.assert_allclose(emp, want, rtol=0.15)


def test_ppo_sde_temporal_smoothness():
    # with sde the action noise is constant between resamples for a frozen obs
    model = PpoActorCritic(action_dim=2, pi_hidden=(32, 32), vf_hidden=(32, 32),
                           use_sde=True)
    params = model.init(jax.random.key(0), jnp.zeros((1, 10)))
    obs = jnp.ones((1, 10))
    st = init_sde(jax.random.key(1), 32, 2, batch_shape=(1,))
    a1, _, _ = model.sample_sde(params, obs, st)
    a2, _, _ = model.sample_sde(params, obs, st)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    st2 = init_sde(jax.random.key(2), 32, 2, batch_shape=(1,))
    a3, _, _ = model.sample_sde(params, obs, st2)
    assert not np.allclose(np.asarray(a1), np.asarray(a3))


def test_ppo_trains_with_sde():
    cfg = PpoConfig(n_steps=32, batch_size=32, n_epochs=1, num_envs=4,
                    pi_hidden=(32, 32), vf_hidden=(32, 32), frame_stack=2,
                    use_sde=True, sde_sample_freq=4)
    learner = PpoLearner(make("usv-simple"), cfg)
    ts = learner.init(seed=0)
    assert ts.sde is not None
    ts, r = learner.train_iteration(ts)
    assert np.isfinite(float(r))
    leaf = jax.tree.leaves(ts.params)[0]
    assert bool(jnp.all(jnp.isfinite(leaf)))


def test_sac_trains_with_sde():
    cfg = SacConfig(buffer_size=1024, batch_size=32, learning_starts=64,
                    num_envs=4, train_freq=2, gradient_steps=1,
                    hidden=(32, 32), frame_stack=2, use_sde=True)
    learner = SacLearner(make("usv-simple"), cfg)
    ts = learner.init(seed=0)
    ts, r = learner.train_rounds(ts, 15)
    assert np.isfinite(float(r))
    assert int(ts.grad_steps) > 0
    # actions stay in bounds under sde sampling
    obs = jnp.zeros((8, learner.obs_dim))
    st = init_sde(jax.random.key(5), 32, 2, batch_shape=(8,))
    a = learner.actor.sample_sde(ts.actor_params, obs, st)
    assert np.all(np.asarray(a) >= np.asarray(learner.action_low) - 1e-5)
    assert np.all(np.asarray(a) <= np.asarray(learner.action_high) + 1e-5)
