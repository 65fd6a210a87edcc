"""Adaptive sliding-mode controller (ASMC) for surge speed + heading.

TPU-native re-design of the reference's pure-Python ``UsvAsmc``
(``control/usv_asmc.py:53-244``) and of the C++ ``usv_libs`` ASMC it mirrors.
The controller is a pure function ``(gains, state, action, pose, vel) ->
(state, tport, tstbd, debug)``; the combined 10-substep controller+dynamics
loop of the reference's ``compute`` is a ``lax.scan`` (:func:`asmc_compute`),
which XLA compiles to a native on-device loop — the TPU analog of the C++
inner loop. Everything is elementwise and batch-transparent under ``vmap``.

Replicated semantics (float tolerance): sideslip-compensated heading setpoint
(reference :72-77), second-order reference filter producing r_d (:84-92),
single-branch heading-error wrap (:119-120), adaptive gain law with dead-zone
mu and floor kmin (:137-147), sqrt-sigma reaching law (:150-151), control
allocation without thruster saturation (:154-159 — the clip is commented out
in the reference), and the perturbation force counter advancing once per
substep (:199).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from usv_tpu.core.angles import wrap_angle, wrap_angle_once
from usv_tpu.physics.dynamics import (
    DynamicsState,
    dynamics_step,
    surge_yaw_model_terms,
    perturbation_force,
)
from usv_tpu.physics.params import VehicleParams


@struct.dataclass
class AsmcGains:
    """ASMC gains; defaults per reference control/usv_asmc.py:26-41."""

    k_u: float = 0.1
    k_psi: float = 0.2
    kmin_u: float = 0.05
    kmin_psi: float = 0.2
    k2_u: float = 0.02
    k2_psi: float = 0.1
    mu_u: float = 0.05
    mu_psi: float = 0.1
    lambda_u: float = 0.001
    lambda_psi: float = 1.0
    # Second-order reference filter (r_d) coefficients
    f1: float = 2.0
    f2: float = 2.0
    f3: float = 2.0


@struct.dataclass
class AsmcState:
    """Controller memory: reference filter, integrators, adaptive gains.

    Field-for-field equivalent of the reference's packed arrays
    ``so_filter`` (7), ``last[6:9]`` and ``aux_vars`` (control/usv_asmc.py:43-47),
    unpacked into named scalars (each may carry a batch shape).
    """

    # Note: the reference's so_filter packs o_last/o_dot_last separately
    # (control/usv_asmc.py:90-92), but they are always written equal to
    # o/o_dot at iteration end, so they are not stored twice here.
    psi_d_last: jnp.ndarray
    o: jnp.ndarray
    o_dot: jnp.ndarray
    o_dot_dot_last: jnp.ndarray
    e_u_last: jnp.ndarray
    e_u_int: jnp.ndarray
    ka_u: jnp.ndarray
    ka_psi: jnp.ndarray
    ka_dot_u_last: jnp.ndarray
    ka_dot_psi_last: jnp.ndarray


def init_asmc(batch_shape=(), dtype=jnp.float32) -> AsmcState:
    z = jnp.zeros(batch_shape, dtype=dtype)
    return AsmcState(
        psi_d_last=z, o=z, o_dot=z, o_dot_dot_last=z,
        e_u_last=z, e_u_int=z, ka_u=z, ka_psi=z,
        ka_dot_u_last=z, ka_dot_psi_last=z,
    )


def asmc_control(
    gains: AsmcGains,
    vparams: VehicleParams,
    state: AsmcState,
    u_d,
    heading_offset,
    pose,
    vel,
    dt=0.01,
    absolute_heading: bool = False,
):
    """One 100 Hz control update: returns (state, tport, tstbd, debug dict).

    ``u_d`` is the surge-speed setpoint (reference action[0]), and
    ``heading_offset`` the course-offset setpoint added to the sideslip-
    compensated course (reference action[1]). With ``absolute_heading`` the
    setpoint is a world-frame heading instead (the C++ ``ASMCSetpoint.heading``
    contract used by the CA env, usv_asmc_ca_env.py:196-198, where the action
    denormalizes to an absolute angle in [-pi, pi]).
    """
    u, v, r = vel[..., 0], vel[..., 1], vel[..., 2]
    psi = pose[..., 2]

    if absolute_heading:
        psi_d = heading_offset
    else:
        # Sideslip-compensated desired heading (reference :72-77)
        beta = jnp.arcsin(v / (0.001 + jnp.hypot(u, v)))
        psi_d = psi + beta + heading_offset

    # Second-order filter for the desired yaw rate r_d (reference :84-92).
    # In absolute mode the setpoint lives on the circle: wrap the finite
    # difference, or a setpoint crossing the +-pi seam (3.1 -> -3.1, a
    # 0.08 rad turn) injects a ~2*pi/dt spike into the desired yaw rate.
    psi_d_diff = psi_d - state.psi_d_last
    if absolute_heading:
        psi_d_diff = wrap_angle(psi_d_diff)
    r_d_raw = psi_d_diff / dt
    o_dot_dot = ((r_d_raw - state.o) * gains.f1 - gains.f3 * state.o_dot) * gains.f2
    o_dot = 0.5 * dt * (o_dot_dot + state.o_dot_dot_last) + state.o_dot
    o = 0.5 * dt * (o_dot + state.o_dot) + state.o
    r_d = o

    # Simplified surge/yaw model terms f, g (reference :110-116)
    f_u, f_psi, g_u, g_psi = surge_yaw_model_terms(vparams, u, v, r)

    # Errors (reference :119-129); single-branch wrap kept for parity with
    # the Python reference in offset mode. In absolute mode psi is unbounded
    # (nothing wraps the dynamics' pose), so the total atan2 wrap is required
    # — wrap_once is wrong by 2*pi multiples once |psi| exceeds 3*pi.
    if absolute_heading:
        e_psi = wrap_angle(psi_d - psi)
    else:
        e_psi = wrap_angle_once(psi_d - psi)
    e_psi_dot = r_d - r
    e_u = u_d - u
    e_u_int = 0.5 * dt * (e_u + state.e_u_last) + state.e_u_int

    # Sliding surfaces (reference :133-134)
    sigma_u = e_u + gains.lambda_u * e_u_int
    sigma_psi = e_psi_dot + gains.lambda_psi * e_psi

    # Adaptive gain law (reference :137-147)
    ka_dot_u = jnp.where(
        state.ka_u > gains.kmin_u,
        gains.k_u * jnp.sign(jnp.abs(sigma_u) - gains.mu_u),
        gains.kmin_u,
    )
    ka_dot_psi = jnp.where(
        state.ka_psi > gains.kmin_psi,
        gains.k_psi * jnp.sign(jnp.abs(sigma_psi) - gains.mu_psi),
        gains.kmin_psi,
    )
    ka_u = 0.5 * dt * (ka_dot_u + state.ka_dot_u_last) + state.ka_u
    ka_psi = 0.5 * dt * (ka_dot_psi + state.ka_dot_psi_last) + state.ka_psi

    # Reaching law + equivalent control (reference :150-155)
    ua_u = -ka_u * jnp.sqrt(jnp.abs(sigma_u)) * jnp.sign(sigma_u) - gains.k2_u * sigma_u
    ua_psi = (
        -ka_psi * jnp.sqrt(jnp.abs(sigma_psi)) * jnp.sign(sigma_psi)
        - gains.k2_psi * sigma_psi
    )
    tx = (gains.lambda_u * e_u - f_u - ua_u) / g_u
    tz = (gains.lambda_psi * e_psi - f_psi - ua_psi) / g_psi

    # Thruster mixing — unsaturated, as in the reference (:158-162)
    tport = tx / 2.0 + tz / vparams.B
    tstbd = tx / (2.0 * vparams.c) - tz / (vparams.B * vparams.c)

    new_state = AsmcState(
        psi_d_last=psi_d,
        o=o, o_dot=o_dot, o_dot_dot_last=o_dot_dot,
        e_u_last=e_u, e_u_int=e_u_int,
        ka_u=ka_u, ka_psi=ka_psi,
        ka_dot_u_last=ka_dot_u, ka_dot_psi_last=ka_dot_psi,
    )
    debug = {
        "psi_d": psi_d, "u_d": u_d, "e_u": e_u, "e_psi": e_psi,
        "sigma_u": sigma_u, "sigma_psi": sigma_psi,
        "ka_u": ka_u, "ka_psi": ka_psi,
        "tport": tport, "tstbd": tstbd, "tx": tx, "tz": tz,
    }
    return new_state, tport, tstbd, debug


@struct.dataclass
class AsmcLoopState:
    """Combined controller + vehicle state for the 10-substep compute loop."""

    ctrl: AsmcState
    dyn: DynamicsState
    perturb_step: jnp.ndarray  # int32; advances once per substep


def init_asmc_loop(x=0.0, y=0.0, psi=0.0, batch_shape=(), dtype=jnp.float32):
    from usv_tpu.physics.dynamics import init_dynamics

    dyn = init_dynamics(x, y, psi, dtype=dtype)
    if batch_shape:
        dyn = DynamicsState(
            pose=jnp.broadcast_to(dyn.pose, batch_shape + (3,)),
            vel=jnp.broadcast_to(dyn.vel, batch_shape + (3,)),
            accel_last=jnp.broadcast_to(dyn.accel_last, batch_shape + (3,)),
            eta_dot_last=jnp.broadcast_to(dyn.eta_dot_last, batch_shape + (3,)),
        )
    return AsmcLoopState(
        ctrl=init_asmc(batch_shape, dtype=dtype),
        dyn=dyn,
        perturb_step=jnp.zeros(batch_shape, dtype=jnp.int32),
    )


def asmc_compute(
    gains: AsmcGains,
    vparams: VehicleParams,
    loop: AsmcLoopState,
    action,
    do_perturb=False,
    n_substeps: int = 10,
    dt: float = 0.01,
    perturb_freq: float = 10.0,
    perturb_magnitude: float = 5.0,
    absolute_heading: bool = False,
    unroll: int = 1,
):
    """N substeps of {ASMC @100 Hz -> dynamics integrate} — ``UsvAsmc.compute``.

    Equivalent of reference control/usv_asmc.py:53-244 (and of the C++
    ``update_controller_and_model_n`` driver, usv_asmc_ca_env.py:199).
    ``action`` is ``(..., 2)`` = (u_d, heading offset). Returns the advanced
    loop state plus the per-substep debug history, time-stacked on axis 0.
    """
    import jax

    u_d = action[..., 0]
    heading_offset = action[..., 1]

    def substep(carry: AsmcLoopState, _):
        ctrl, tport, tstbd, debug = asmc_control(
            gains, vparams, carry.ctrl, u_d, heading_offset,
            carry.dyn.pose, carry.dyn.vel, dt,
            absolute_heading=absolute_heading,
        )
        if do_perturb:
            px, py = perturbation_force(
                carry.dyn.pose[..., 2], carry.perturb_step.astype(jnp.float32),
                dt, perturb_freq, perturb_magnitude,
            )
        else:
            px = py = 0.0
        dyn = dynamics_step(vparams, carry.dyn, tport, tstbd, dt, px, py)
        new = AsmcLoopState(ctrl=ctrl, dyn=dyn, perturb_step=carry.perturb_step + 1)
        # post-integration model state rides the history too — the per-
        # substep "model_history" the reference's C++ helper returns
        # (usv_asmc_ca_env.py:199); unused entries are DCE'd by XLA
        return new, {**debug, "pose": dyn.pose, "vel": dyn.vel}

    # unroll: each substep is ~150 scalar flops per env — at wide batches
    # the scan's per-iteration fixed cost dominates, and unrolling lets XLA
    # fuse consecutive substeps into one kernel (docs/PERFORMANCE.md,
    # asmc-simple attribution; semantics identical, pinned by tests)
    loop, history = jax.lax.scan(
        substep, loop, None, length=n_substeps, unroll=unroll
    )
    return loop, history
