"""Bit-parity of the JAX kernels vs the native C++ oracle.

Mirrors the reference's C++/Python split (SURVEY.md §2.2): the C++ tier is an
independently written implementation of the same math; trajectories must
agree to float32 tolerance over long horizons.
"""

import numpy as np
import pytest

pytest.importorskip("usv_tpu.native")

import jax
import jax.numpy as jnp

from usv_tpu import native
from usv_tpu.control.asmc import AsmcGains, asmc_compute, init_asmc_loop
from usv_tpu.control.pid import PidGains, pid_control, init_pid
from usv_tpu.control.aitsmc import (
    AitsmcGains, AitsmcLoopState, AitsmcSetpoint, aitsmc_compute, init_aitsmc,
)
from usv_tpu.ops.raycast import raycast_first_hit_compat
from usv_tpu.physics.dynamics import dynamics_step, init_dynamics
from usv_tpu.physics.params import VehicleParams

VP = VehicleParams()


def test_dynamics_trajectory_parity():
    model = native.DynamicModel(1.0, -2.0, 0.3)
    state = init_dynamics(1.0, -2.0, 0.3, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    step = jax.jit(lambda s, a, b: dynamics_step(VP, s, a, b, 0.01))
    rng = np.random.default_rng(0)
    for i in range(500):
        tp = float(rng.uniform(-20, 30))
        ts = float(rng.uniform(-20, 30))
        model.update(tp, ts)
        state = step(state, tp, ts)
    np.testing.assert_allclose(np.asarray(state.pose), model.pose, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(state.vel), model.vel, rtol=2e-4, atol=2e-4)


def test_asmc_closed_loop_parity():
    model = native.DynamicModel()
    asmc = native.ASMC()
    loop = init_asmc_loop()
    gains = AsmcGains()
    action = jnp.asarray([1.5, 0.2], jnp.float32)

    run = jax.jit(lambda l: asmc_compute(gains, VP, l, action)[0])
    for i in range(100):  # 100 env-steps x 10 substeps
        asmc.compute(model, 1.5, 0.2, n=10)
        loop = run(loop)
    np.testing.assert_allclose(
        np.asarray(loop.dyn.pose), model.pose, rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(loop.dyn.vel), model.vel, rtol=5e-3, atol=5e-3
    )


def test_asmc_absolute_heading_parity():
    """Absolute-heading mode (the CA env's contract) incl. setpoints that
    cross the +-pi seam — the seam-wrap of the r_d finite difference and
    the total e_psi wrap must agree between JAX and the C oracle."""
    model = native.DynamicModel()
    asmc = native.ASMC()
    loop = init_asmc_loop()
    gains = AsmcGains()

    run = jax.jit(
        lambda l, a: asmc_compute(gains, VP, l, a, absolute_heading=True)[0]
    )
    rng = np.random.default_rng(5)
    for i in range(100):
        # heading setpoints hugging the seam, alternating sign
        heading = float((np.pi - 0.05) * (-1) ** i + rng.uniform(-0.02, 0.02))
        asmc.compute(model, 1.2, heading, n=10, absolute_heading=True)
        loop = run(loop, jnp.asarray([1.2, heading], jnp.float32))
    np.testing.assert_allclose(
        np.asarray(loop.dyn.pose), model.pose, rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(loop.dyn.vel), model.vel, rtol=5e-3, atol=5e-3
    )
    # the seam crossings must not have blown up the controller
    assert np.all(np.abs(model.vel) < 10.0)


def test_asmc_perturbed_parity():
    model = native.DynamicModel()
    asmc = native.ASMC()
    loop = init_asmc_loop()
    gains = AsmcGains()
    action = jnp.asarray([1.0, 0.0], jnp.float32)
    run = jax.jit(lambda l: asmc_compute(gains, VP, l, action, do_perturb=True)[0])
    for i in range(50):
        asmc.compute(model, 1.0, 0.0, n=10, do_perturb=True)
        loop = run(loop)
    np.testing.assert_allclose(
        np.asarray(loop.dyn.pose), model.pose, rtol=5e-3, atol=5e-3
    )


def test_pid_single_updates_parity():
    model = native.DynamicModel()
    pid = native.PID()
    jax_pid = init_pid()
    dyn = init_dynamics()
    gains = PidGains()
    for i in range(200):
        tp, ts = pid.control(model, 1.0, 0.1)
        jax_pid, jtp, jts, _ = pid_control(
            gains, VP, jax_pid, 1.0, 0.1, dyn.pose, dyn.vel
        )
        np.testing.assert_allclose(float(jtp), tp, rtol=1e-3, atol=1e-3)
        model.update(tp, ts)
        dyn = dynamics_step(VP, dyn, jtp, jts, 0.01)


def test_aitsmc_closed_loop_parity():
    model = native.DynamicModel()
    ai = native.AITSMC()
    loop = AitsmcLoopState(ctrl=init_aitsmc(), dyn=init_dynamics())
    gains = AitsmcGains()
    sp = AitsmcSetpoint(u=jnp.float32(0.6), r=jnp.float32(0.2),
                        dot_u=jnp.float32(0.0), dot_r=jnp.float32(0.0))
    run = jax.jit(lambda l: aitsmc_compute(gains, VP, l, sp, n_substeps=5)[0])
    for i in range(100):
        for _ in range(5):
            tp, ts = ai.update(model, 0.6, 0.2)
            model.update(tp, ts)
        loop = run(loop)
    np.testing.assert_allclose(
        np.asarray(loop.dyn.pose), model.pose, rtol=5e-3, atol=5e-3
    )
    dbg = ai.get_debug_data()
    np.testing.assert_allclose(float(loop.ctrl.ka_u), dbg["Ka_u"], rtol=5e-3, atol=1e-4)


def test_raycast_parity():
    rng = np.random.default_rng(5)
    span = (2 / 3) * 2 * np.pi
    R = 64
    for _ in range(10):
        pos = np.array([rng.uniform(0, 20), rng.uniform(0, 20), rng.uniform(-np.pi, np.pi)])
        n = 20
        ox = rng.uniform(0, 20, n)
        oy = rng.uniform(0, 20, n)
        orr = rng.uniform(0.15, 0.5, n)
        want = native.raycast(pos, ox, oy, orr, R, 100.0, span / R)
        got = raycast_first_hit_compat(
            jnp.asarray(pos, jnp.float32),
            jnp.asarray(np.stack([ox, oy], -1), jnp.float32),
            jnp.asarray(orr, jnp.float32),
            jnp.ones(n, bool), R, 100.0,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-3)
