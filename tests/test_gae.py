"""GAE correctness vs a hand-rolled reference implementation (guards the
done-mask alignment a review found off by one)."""

import jax.numpy as jnp
import numpy as np

from usv_tpu.train.ppo import PpoLearner


def reference_gae(rewards, values, dones, last_value, gamma, lam):
    """Textbook reverse loop: delta_t = r_t + g*(1-d_t)*V_{t+1} - V_t."""
    T = len(rewards)
    advs = np.zeros(T)
    adv = 0.0
    for t in reversed(range(T)):
        v_next = last_value if t == T - 1 else values[t + 1]
        nonterm = 1.0 - dones[t]
        delta = rewards[t] + gamma * v_next * nonterm - values[t]
        adv = delta + gamma * lam * nonterm * adv
        advs[t] = adv
    return advs, advs + values


def test_gae_matches_reference_with_episode_boundaries():
    rng = np.random.default_rng(0)
    T, B = 12, 3
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    dones = (rng.uniform(size=(T, B)) < 0.25).astype(np.float32)
    last_value = rng.normal(size=B).astype(np.float32)
    gamma, lam = 0.99, 0.95

    traj = {
        "reward": jnp.asarray(rewards),
        "value": jnp.asarray(values),
        "done": jnp.asarray(dones),
    }
    advs, rets = PpoLearner._gae(traj, jnp.asarray(last_value), gamma, lam)

    for b in range(B):
        want_adv, want_ret = reference_gae(
            rewards[:, b], values[:, b], dones[:, b], last_value[b], gamma, lam
        )
        np.testing.assert_allclose(np.asarray(advs)[:, b], want_adv, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(rets)[:, b], want_ret, rtol=1e-5)


def test_gae_terminal_step_cuts_bootstrap():
    # single env, done at the last step: advantage must not include last_value
    traj = {
        "reward": jnp.asarray([[1.0], [1.0]]),
        "value": jnp.asarray([[0.5], [0.5]]),
        "done": jnp.asarray([[0.0], [1.0]]),
    }
    advs, _ = PpoLearner._gae(traj, jnp.asarray([100.0]), 0.99, 0.95)
    # step 1 (terminal): delta = 1 - 0.5 = 0.5 — no 100 bootstrap
    np.testing.assert_allclose(float(advs[1, 0]), 0.5, rtol=1e-6)
