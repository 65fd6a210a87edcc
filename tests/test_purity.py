"""Jit-purity checks (SURVEY.md §5 aux): reset/step must be deterministic
pure functions of their inputs — same key/state/action => bit-identical
outputs, across fresh traces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usv_tpu.envs import make, registered_ids


@pytest.mark.parametrize("env_id", sorted(registered_ids()))
def test_reset_deterministic(env_id):
    h = make(env_id)
    s1 = h.reset(h.cfg, jax.random.key(42))
    s2 = jax.jit(lambda k: h.reset(h.cfg, k))(jax.random.key(42))
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        # eager and jit may differ by fusion reassociation (last-ulp)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-6, atol=1e-6
        )


def test_step_deterministic_across_traces():
    h = make("usv-simple")
    state = h.reset(h.cfg, jax.random.key(0))
    action = jnp.asarray([0.6, -0.2])
    out1 = h.step(h.cfg, state, action)  # eager trace
    out2 = jax.jit(lambda s, a: h.step(h.cfg, s, a))(state, action)
    np.testing.assert_allclose(
        np.asarray(out1[1].obs), np.asarray(out2[1].obs), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out1[1].reward), np.asarray(out2[1].reward), rtol=1e-6
    )
    # and jit-vs-jit is bit-exact
    out3 = jax.jit(lambda s, a: h.step(h.cfg, s, a))(state, action)
    np.testing.assert_array_equal(
        np.asarray(out3[1].obs), np.asarray(out2[1].obs)
    )


def test_step_does_not_mutate_input_state():
    h = make("usv-simple")
    state = h.reset(h.cfg, jax.random.key(1))

    def to_np(x):
        if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            x = jax.random.key_data(x)
        return np.asarray(x).copy()

    before = jax.tree.map(to_np, state)
    h.step(h.cfg, state, jnp.zeros(2))
    after = jax.tree.map(to_np, state)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
