"""PID and AITSMC controller property tests."""

import jax
import jax.numpy as jnp
import numpy as np

from usv_tpu.control.aitsmc import (
    AitsmcGains,
    AitsmcLoopState,
    AitsmcSetpoint,
    aitsmc_compute,
    init_aitsmc,
)
from usv_tpu.control.pid import PidGains, PidLoopState, init_pid, pid_compute
from usv_tpu.physics.dynamics import init_dynamics
from usv_tpu.physics.params import VehicleParams

VPAR = VehicleParams()


def _run_pid(action, n=500):
    loop = PidLoopState(
        ctrl=init_pid(), dyn=init_dynamics(), perturb_step=jnp.zeros((), jnp.int32)
    )
    action = jnp.asarray(action, dtype=jnp.float32)

    @jax.jit
    def run(loop):
        def body(carry, _):
            carry, _h = pid_compute(PidGains(), VPAR, carry, action)
            return carry, None
        loop, _ = jax.lax.scan(body, loop, None, length=n)
        return loop

    out = run(loop)
    return np.asarray(out.dyn.pose), np.asarray(out.dyn.vel)


def test_runner_matches_pid_compute():
    """The generic substep driver reproduces pid_compute exactly and returns
    per-substep histories (the update_controller_and_model_n analog)."""
    from usv_tpu.control.pid import pid_control
    from usv_tpu.control.runner import run_controller_and_model

    action = jnp.asarray([1.2, 0.3], jnp.float32)

    def control_fn(ctrl, dyn):
        return pid_control(
            PidGains(), VPAR, ctrl, action[0], action[1], dyn.pose, dyn.vel
        )

    ctrl, dyn = init_pid(), init_dynamics()
    for _ in range(20):
        ctrl, dyn, model_hist, ctrl_hist = run_controller_and_model(
            control_fn, VPAR, ctrl, dyn, n_substeps=10
        )
    assert model_hist["pose"].shape == (10, 3)
    assert "tport" in ctrl_hist

    loop = PidLoopState(
        ctrl=init_pid(), dyn=init_dynamics(),
        perturb_step=jnp.zeros((), jnp.int32),
    )
    for _ in range(20):
        loop, _h = pid_compute(PidGains(), VPAR, loop, action)
    np.testing.assert_allclose(
        np.asarray(dyn.pose), np.asarray(loop.dyn.pose), rtol=1e-6, atol=1e-6
    )


def test_pid_tracks_speed():
    pos, vel = _run_pid([1.0, 0.0])
    assert abs(vel[0] - 1.0) < 0.2
    assert pos[0] > 10


def test_pid_zero_stays():
    pos, vel = _run_pid([0.0, 0.0], n=200)
    np.testing.assert_allclose(pos, np.zeros(3), atol=1e-3)
    np.testing.assert_allclose(vel, np.zeros(3), atol=1e-3)


def _run_aitsmc(u_d, r_d, n=300, perturb=None):
    loop = AitsmcLoopState(ctrl=init_aitsmc(), dyn=init_dynamics())
    sp = AitsmcSetpoint(
        u=jnp.float32(u_d), r=jnp.float32(r_d),
        dot_u=jnp.float32(0.0), dot_r=jnp.float32(0.0),
    )
    pert = None if perturb is None else jnp.asarray(perturb, dtype=jnp.float32)

    @jax.jit
    def run(loop):
        def body(carry, _):
            carry, _h = aitsmc_compute(AitsmcGains(), VPAR, carry, sp, pert)
            return carry, None
        loop, _ = jax.lax.scan(body, loop, None, length=n)
        return loop

    out = run(loop)
    return out


def test_aitsmc_tracks_surge_setpoint():
    out = _run_aitsmc(0.5, 0.0)
    vel = np.asarray(out.dyn.vel)
    assert abs(vel[0] - 0.5) < 0.1
    assert abs(vel[2]) < 0.1


def test_aitsmc_tracks_yaw_rate():
    out = _run_aitsmc(0.3, 0.5, n=400)
    vel = np.asarray(out.dyn.vel)
    pose = np.asarray(out.dyn.pose)
    assert abs(vel[2] - 0.5) < 0.15
    assert pose[2] > 2.0  # yaw accumulated over 400*5 substeps at ~0.5 rad/s


def test_aitsmc_gains_adapt_and_stay_bounded():
    out = _run_aitsmc(1.0, 0.0, n=200)
    ka_u = float(out.ctrl.ka_u)
    assert ka_u > 0.0
    assert np.isfinite(ka_u) and ka_u < 100.0


def test_aitsmc_debug_fields():
    out = _run_aitsmc(0.5, 0.1, n=10)
    # getDebugData() contract: e_u, e_r, Ka_u, Ka_r all live on the state
    for field in ("e_u", "e_r", "ka_u", "ka_r"):
        assert np.isfinite(float(getattr(out.ctrl, field)))


def test_aitsmc_rejects_constant_disturbance():
    # With a constant body-frame surge disturbance the adaptive controller
    # still converges near the setpoint (integral action).
    out = _run_aitsmc(0.5, 0.0, n=600, perturb=[5.0, 0.0, 0.0])
    vel = np.asarray(out.dyn.vel)
    assert abs(vel[0] - 0.5) < 0.15
