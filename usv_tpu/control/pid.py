"""PID surge-speed + heading controller.

TPU-native equivalent of the reference's ``UsvPID``
(``control/usv_pid.py:55-213``): pure function + ``lax.scan`` substep loop.
Replicated semantics: sideslip-compensated, atan2-wrapped heading setpoint
(reference :77-78), heading error via the atan2 wrap (:104), ``e_psi_dot = -r``
(:107 — no reference filter is used in the PID path), trapezoidal integral and
backward-difference derivative of the speed error (:117-118), thruster clip to
±30 (:128-129), and the perturbation force being computed but **not** applied
(:167 — the ``T += perturb_force`` line is commented out in the reference; we
therefore never apply it here either), and ``e_u_last`` never being updated
(the reference packs it back unchanged — grep shows no ``e_u_last = e_u`` in
usv_pid.py, unlike usv_asmc.py:130 — so the speed-error integral is a
trapezoid against zero and the derivative is ``e_u/dt``; replicated via the
``freeze_e_u_last`` compat flag, default on).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from usv_tpu.core.angles import wrap_angle
from usv_tpu.physics.dynamics import (
    DynamicsState,
    dynamics_step,
    surge_yaw_model_terms,
)
from usv_tpu.physics.params import VehicleParams


@struct.dataclass
class PidGains:
    """Defaults per reference control/usv_pid.py:27-31."""

    kp_u: float = 1.6
    ki_u: float = 0.2
    kd_u: float = 0.1
    kp_psi: float = 22.625
    kd_psi: float = 10.0
    thrust_limit: float = 30.0
    # Reference quirk: e_u_last is never written back (see module docstring).
    # Static (not a pytree leaf): it is branched on with Python `if`.
    freeze_e_u_last: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class PidState:
    e_u_last: jnp.ndarray
    e_u_int: jnp.ndarray


def init_pid(batch_shape=(), dtype=jnp.float32) -> PidState:
    z = jnp.zeros(batch_shape, dtype=dtype)
    return PidState(e_u_last=z, e_u_int=z)


def pid_control(
    gains: PidGains,
    vparams: VehicleParams,
    state: PidState,
    u_d,
    heading_offset,
    pose,
    vel,
    dt=0.01,
):
    """One 100 Hz PID update -> (state, tport, tstbd, debug)."""
    u, v, r = vel[..., 0], vel[..., 1], vel[..., 2]
    psi = pose[..., 2]

    beta = jnp.arcsin(v / (0.001 + jnp.hypot(u, v)))
    psi_d = wrap_angle(psi + heading_offset + beta)

    f_u, f_psi, g_u, g_psi = surge_yaw_model_terms(vparams, u, v, r)

    e_psi = wrap_angle(psi_d - psi)
    e_psi_dot = -r

    e_u = u_d - u
    e_u_int = 0.5 * dt * (e_u + state.e_u_last) + state.e_u_int
    e_u_dot = (e_u - state.e_u_last) / dt

    ua_u = gains.kp_u * e_u + gains.ki_u * e_u_int + gains.kd_u * e_u_dot
    ua_psi = gains.kp_psi * e_psi + gains.kd_psi * e_psi_dot

    tx = (-f_u + ua_u) / g_u
    tz = (-f_psi + ua_psi) / g_psi

    tport = jnp.clip(tx / 2.0 + tz / vparams.B, -gains.thrust_limit, gains.thrust_limit)
    tstbd = jnp.clip(
        tx / (2.0 * vparams.c) - tz / (vparams.B * vparams.c),
        -gains.thrust_limit,
        gains.thrust_limit,
    )

    new_e_u_last = state.e_u_last if gains.freeze_e_u_last else e_u
    new_state = PidState(e_u_last=new_e_u_last, e_u_int=e_u_int)
    debug = {
        "psi_d": psi_d, "e_psi": e_psi, "e_u": e_u, "u_d": u_d,
        "tport": tport, "tstbd": tstbd,
    }
    return new_state, tport, tstbd, debug


@struct.dataclass
class PidLoopState:
    ctrl: PidState
    dyn: DynamicsState
    perturb_step: jnp.ndarray


def pid_compute(
    gains: PidGains,
    vparams: VehicleParams,
    loop: PidLoopState,
    action,
    do_perturb=False,  # kept for API symmetry; the reference never applies it
    n_substeps: int = 10,
    dt: float = 0.01,
):
    """N substeps of {PID -> dynamics} — reference ``UsvPID.compute`` (:55-213)."""
    del do_perturb  # reference computes but never applies the force (:167)
    u_d = action[..., 0]
    heading_offset = action[..., 1]

    def substep(carry: PidLoopState, _):
        ctrl, tport, tstbd, debug = pid_control(
            gains, vparams, carry.ctrl, u_d, heading_offset,
            carry.dyn.pose, carry.dyn.vel, dt,
        )
        dyn = dynamics_step(vparams, carry.dyn, tport, tstbd, dt)
        return PidLoopState(ctrl=ctrl, dyn=dyn, perturb_step=carry.perturb_step + 1), debug

    loop, history = jax.lax.scan(substep, loop, None, length=n_substeps)
    return loop, history
