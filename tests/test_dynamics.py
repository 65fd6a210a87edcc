"""Fossen dynamics unit tests (the C++ DynamicModel analog)."""

import jax
import jax.numpy as jnp
import numpy as np

from usv_tpu.physics.dynamics import (
    dynamics_step,
    fossen_acceleration,
    hydrodynamic_coefficients,
    init_dynamics,
    thruster_allocation,
)
from usv_tpu.physics.params import VehicleParams

VPAR = VehicleParams()


def _numpy_accel(vel, tau):
    """Independent dense-matrix evaluation of the same model (reference math,
    control/usv_asmc.py:172-227) used as an oracle for the component-wise
    closed-form implementation."""
    u, v, r = vel
    Xu, Xuu = (-25.0, 0.0) if abs(u) <= 1.2 else (64.55, -70.92)
    spd = np.sqrt(u * u + v * v)
    Yv = 0.5 * (-40 * 1000 * abs(v)) * (
        1.1 + 0.0045 * (1.01 / 0.09) - 0.1 * (0.27 / 0.09) + 0.016 * (0.27 / 0.09) ** 2
    )
    Yr = 6 * (-3.141592 * 1000) * spd * 0.09 * 0.09 * 1.01
    Nv = 0.06 * (-3.141592 * 1000) * spd * 0.09 * 0.09 * 1.01
    Nr = 0.02 * (-3.141592 * 1000) * spd * 0.09 * 0.09 * 1.01 * 1.01
    p = VPAR
    M = np.array([
        [p.m - p.X_u_dot, 0, 0],
        [0, p.m - p.Y_v_dot, -p.Y_r_dot],
        [0, -p.N_v_dot, p.Iz - p.N_r_dot],
    ])
    CRB = np.array([[0, 0, -p.m * v], [0, 0, p.m * u], [p.m * v, -p.m * u, 0]])
    CA = np.array([
        [0, 0, 2 * (p.Y_v_dot * v + 0.5 * (p.Y_r_dot + p.N_v_dot) * r)],
        [0, 0, -p.X_u_dot * p.m * u],
        [2 * (-p.Y_v_dot * v - 0.5 * (p.Y_r_dot + p.N_v_dot) * r), p.X_u_dot * p.m * u, 0],
    ])
    Dl = np.array([[-Xu, 0, 0], [0, -Yv, -Yr], [0, -Nv, -Nr]])
    Dn = np.array([
        [Xuu * abs(u), 0, 0],
        [0, p.Yvv * abs(v) + p.Yvr * abs(r), p.Yrv * abs(v) + p.Yrr * abs(r)],
        [0, p.Nvv * abs(v) + p.Nvr * abs(r), p.Nrv * abs(v) + p.Nrr * abs(r)],
    ])
    D = Dl - Dn
    return np.linalg.inv(M) @ (np.asarray(tau) - (CRB + CA) @ vel - D @ vel)


def test_accel_matches_dense_matrix_oracle():
    rng = np.random.default_rng(0)
    for _ in range(50):
        vel = rng.uniform(-2, 2, size=3)
        tau = rng.uniform(-40, 40, size=3)
        got = fossen_acceleration(
            VPAR, jnp.asarray(vel, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32),
            tau[0], tau[1], tau[2],
        )
        want = _numpy_accel(vel, tau)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-4)


def test_hydro_switch_at_high_speed():
    Xu_lo, Xuu_lo, *_ = hydrodynamic_coefficients(jnp.asarray(1.0), jnp.asarray(0.0))
    Xu_hi, Xuu_hi, *_ = hydrodynamic_coefficients(jnp.asarray(1.3), jnp.asarray(0.0))
    assert np.isclose(float(Xu_lo), -25.0) and float(Xuu_lo) == 0.0
    assert np.isclose(float(Xu_hi), 64.55) and np.isclose(float(Xuu_hi), -70.92)


def test_thruster_allocation_roundtrip():
    tx, tz = thruster_allocation(VPAR, 10.0, 10.0)
    # equal thrust => pure surge force, no yaw moment only if c == 1;
    # with c=0.78 there is a residual moment — just pin the formula.
    assert np.isclose(float(tx), 10.0 + 0.78 * 10.0)
    assert np.isclose(float(tz), 0.5 * 0.41 * (10.0 - 0.78 * 10.0))


def test_zero_input_stays_at_rest():
    state = init_dynamics()
    step = jax.jit(lambda s: dynamics_step(VPAR, s, 0.0, 0.0, 0.01))
    for _ in range(100):
        state = step(state)
    np.testing.assert_allclose(np.asarray(state.pose), np.zeros(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.vel), np.zeros(3), atol=1e-6)


def test_forward_thrust_moves_forward():
    state = init_dynamics()
    step = jax.jit(lambda s: dynamics_step(VPAR, s, 20.0, 20.0 / 0.78, 0.01))
    for _ in range(500):
        state = step(state)
    pose = np.asarray(state.pose)
    assert pose[0] > 1.0
    assert abs(pose[1]) < 0.5


def test_batched_step_matches_loop():
    B = 4
    rng = np.random.default_rng(1)
    poses = rng.uniform(-1, 1, size=(B, 3)).astype(np.float32)
    vels = rng.uniform(-1, 1, size=(B, 3)).astype(np.float32)
    from usv_tpu.physics.dynamics import DynamicsState

    batched = DynamicsState(
        pose=jnp.asarray(poses), vel=jnp.asarray(vels),
        accel_last=jnp.zeros((B, 3)), eta_dot_last=jnp.zeros((B, 3)),
    )
    tport = jnp.asarray(rng.uniform(-10, 10, size=B).astype(np.float32))
    tstbd = jnp.asarray(rng.uniform(-10, 10, size=B).astype(np.float32))
    out_b = jax.jit(lambda s, a, b: dynamics_step(VPAR, s, a, b, 0.01))(batched, tport, tstbd)
    for i in range(B):
        single = DynamicsState(
            pose=jnp.asarray(poses[i]), vel=jnp.asarray(vels[i]),
            accel_last=jnp.zeros(3), eta_dot_last=jnp.zeros(3),
        )
        out_1 = dynamics_step(VPAR, single, tport[i], tstbd[i], 0.01)
        np.testing.assert_allclose(
            np.asarray(out_b.pose)[i], np.asarray(out_1.pose), rtol=1e-6, atol=1e-6
        )
