"""ASMC controller + dynamics property tests.

Ports the reference's physics-sanity suite (``tests/test_usv_asmc.py:6-37``)
— fixed to the current compute signature, which the reference's own stale
suite was not — and adds vmapped-batch variants to pin down batch
transparency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usv_tpu.control.asmc import AsmcGains, asmc_compute, init_asmc_loop
from usv_tpu.physics.params import VehicleParams

N = 1000
GAINS = AsmcGains()
VPAR = VehicleParams()


def _rollout(action, n=N):
    loop = init_asmc_loop()
    action = jnp.asarray(action, dtype=jnp.float32)

    @jax.jit
    def run(loop):
        def body(carry, _):
            carry, _hist = asmc_compute(GAINS, VPAR, carry, action)
            return carry, None

        loop, _ = jax.lax.scan(body, loop, None, length=n)
        return loop

    out = run(loop)
    return np.asarray(out.dyn.pose), np.asarray(out.dyn.vel)


def test_no_movement():
    # Zero action => boat stays at the origin (reference test :8-16)
    pos, vel = _rollout([0.0, 0.0])
    assert np.allclose(pos, np.zeros(3), atol=1e-3)
    assert np.allclose(vel, np.zeros(3), atol=1e-3)


def test_forward_movement():
    # Full-ahead => x > 10, small lateral/heading drift, u > 1 (reference :18-28)
    pos, vel = _rollout([10.0, 0.0])
    assert pos[0] > 10
    assert np.all(np.abs(pos[1:]) < 1)
    assert vel[0] > 1
    assert np.all(np.abs(vel[1:]) < 1)


def test_rotation():
    # Constant heading offset => accumulated yaw > 5 rad (reference :30-37)
    pos, _vel = _rollout([0.0, 10.0], n=N)
    assert pos[2] > 5


def test_vmapped_batch_matches_single():
    # A batch of identical envs must evolve identically to the single env.
    B = 8
    action = jnp.tile(jnp.asarray([[2.0, 0.3]], dtype=jnp.float32), (B, 1))
    loop_b = init_asmc_loop(batch_shape=(B,))

    @jax.jit
    def run_batch(loop, action):
        step = jax.vmap(
            lambda l, a: asmc_compute(GAINS, VPAR, l, a)[0], in_axes=(0, 0)
        )
        def body(carry, _):
            return step(carry, action), None
        loop, _ = jax.lax.scan(body, loop, None, length=50)
        return loop

    out_b = run_batch(loop_b, action)

    loop_1 = init_asmc_loop()
    @jax.jit
    def run_one(loop):
        def body(carry, _):
            carry, _h = asmc_compute(
                GAINS, VPAR, carry, jnp.asarray([2.0, 0.3], dtype=jnp.float32)
            )
            return carry, None
        loop, _ = jax.lax.scan(body, loop, None, length=50)
        return loop

    out_1 = run_one(loop_1)
    np.testing.assert_allclose(
        np.asarray(out_b.dyn.pose),
        np.tile(np.asarray(out_1.dyn.pose), (B, 1)),
        rtol=2e-5, atol=1e-5,
    )


def test_heterogeneous_batch_diverges():
    # Different actions must produce different trajectories within the batch.
    actions = jnp.asarray([[1.0, 0.0], [1.0, 0.5]], dtype=jnp.float32)
    loop = init_asmc_loop(batch_shape=(2,))

    @jax.jit
    def run(loop):
        step = jax.vmap(lambda l, a: asmc_compute(GAINS, VPAR, l, a)[0])
        def body(carry, _):
            return step(carry, actions), None
        loop, _ = jax.lax.scan(body, loop, None, length=100)
        return loop

    out = run(loop)
    pose = np.asarray(out.dyn.pose)
    assert not np.allclose(pose[0], pose[1])


def test_debug_history_shape():
    loop = init_asmc_loop()
    action = jnp.asarray([1.0, 0.0], dtype=jnp.float32)
    _loop, hist = jax.jit(lambda l: asmc_compute(GAINS, VPAR, l, action))(loop)
    assert hist["tport"].shape == (10,)
    assert hist["psi_d"].shape == (10,)
