"""AITSMC — adaptive integral terminal sliding-mode controller (u, r channels).

The reference drives this controller through the non-vendored C++
``usv_libs_py.controller.AITSMC`` (call sites: ``simple_env_aitsmc.py:77-111``),
so only its interface contract is recoverable from the reference:

* setpoint: ``{u, r, dot_u, dot_r}``      (simple_env_aitsmc.py:57-60, 83-84)
* update(state, setpoint) -> thrusters    (ibid.:87-90)
* debug: ``{e_u, e_r, Ka_u, Ka_r}``       (ibid.:105-111)
* params incl. ``k_r, kmin_r, mu_r, mu_u`` (notebook plot_agent_aitsmc_vec
  cell 2, which overrides k_r=0.75, kmin_r=0.001, mu_r=0.025, mu_u=0.01)

The control law here is therefore a reconstruction: a standard adaptive
integral terminal SMC for first-order surge-speed and yaw-rate tracking on
the same Fossen model (see PAPERS.md, adaptive/terminal sliding-mode
references), matching the reference's observable structure — per-channel
adaptive gains Ka with dead-zone mu and floor kmin, integral-terminal sliding
surfaces, and the shared thruster allocation. Flagged in SURVEY.md §7.3 as the
largest correctness risk; validated by property tests (setpoint tracking, gain
adaptation) rather than bit parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from usv_tpu.physics.dynamics import (
    DynamicsState,
    dynamics_step,
    surge_yaw_model_terms,
)
from usv_tpu.physics.params import VehicleParams


def _sig_pow(x, p):
    """|x|^p * sign(x) — the 'sig' function of terminal SMC papers."""
    return jnp.power(jnp.abs(x), p) * jnp.sign(x)


@struct.dataclass
class AitsmcGains:
    """Adaptation/surface gains; the C++ ``AITSMC.defaultParams()`` analog."""

    # adaptation rates
    k_u: float = 0.1
    k_r: float = 0.2
    # adaptive-gain floors
    kmin_u: float = 0.05
    kmin_r: float = 0.05
    # dead-zone half-widths on |sigma|
    mu_u: float = 0.05
    mu_r: float = 0.1
    # linear reaching terms
    k2_u: float = 0.02
    k2_r: float = 0.1
    # integral-terminal surface weights and exponent
    lambda_u: float = 0.1
    lambda_r: float = 0.1
    beta: float = 0.5
    # thruster saturation (asymmetric, per the published USV hardware limits;
    # cf. reference usv_asmc_env.py:182-185)
    t_min: float = -30.0
    t_max: float = 36.5


@struct.dataclass
class AitsmcSetpoint:
    """{u, r, dot_u, dot_r} — mirror of ``AITSMCSetpoint``."""

    u: jnp.ndarray
    r: jnp.ndarray
    dot_u: jnp.ndarray
    dot_r: jnp.ndarray


@struct.dataclass
class AitsmcState:
    e_u_int: jnp.ndarray  # integral of sig(e_u)^beta
    e_r_int: jnp.ndarray  # integral of sig(e_r)^beta
    e_u_last: jnp.ndarray
    e_r_last: jnp.ndarray
    ka_u: jnp.ndarray
    ka_r: jnp.ndarray
    ka_dot_u_last: jnp.ndarray
    ka_dot_r_last: jnp.ndarray

    # C++ getDebugData() exposed the last errors as (e_u, e_r, Ka_u, Ka_r);
    # e_u_last/e_r_last hold exactly those values after each update
    @property
    def e_u(self):
        return self.e_u_last

    @property
    def e_r(self):
        return self.e_r_last


def init_aitsmc(batch_shape=(), dtype=jnp.float32) -> AitsmcState:
    z = jnp.zeros(batch_shape, dtype=dtype)
    return AitsmcState(
        e_u_int=z, e_r_int=z, e_u_last=z, e_r_last=z,
        ka_u=z, ka_r=z, ka_dot_u_last=z, ka_dot_r_last=z,
    )


def aitsmc_control(
    gains: AitsmcGains,
    vparams: VehicleParams,
    state: AitsmcState,
    setpoint: AitsmcSetpoint,
    vel,
    dt=0.01,
):
    """One 100 Hz AITSMC update -> (state, tport, tstbd, debug)."""
    u, v, r = vel[..., 0], vel[..., 1], vel[..., 2]

    f_u, f_r, g_u, g_r = surge_yaw_model_terms(vparams, u, v, r)

    # Tracking errors
    e_u = setpoint.u - u
    e_r = setpoint.r - r

    # Integral-terminal sliding surfaces:
    #   sigma = e + lambda * ∫ sig(e)^beta dτ   (trapezoidal integral)
    e_u_int = 0.5 * dt * (_sig_pow(e_u, gains.beta) + _sig_pow(state.e_u_last, gains.beta)) + state.e_u_int
    e_r_int = 0.5 * dt * (_sig_pow(e_r, gains.beta) + _sig_pow(state.e_r_last, gains.beta)) + state.e_r_int
    sigma_u = e_u + gains.lambda_u * e_u_int
    sigma_r = e_r + gains.lambda_r * e_r_int

    # Adaptive gain law (same family as the ASMC's: dead zone mu, floor kmin)
    ka_dot_u = jnp.where(
        state.ka_u > gains.kmin_u,
        gains.k_u * jnp.sign(jnp.abs(sigma_u) - gains.mu_u),
        gains.kmin_u,
    )
    ka_dot_r = jnp.where(
        state.ka_r > gains.kmin_r,
        gains.k_r * jnp.sign(jnp.abs(sigma_r) - gains.mu_r),
        gains.kmin_r,
    )
    ka_u = 0.5 * dt * (ka_dot_u + state.ka_dot_u_last) + state.ka_u
    ka_r = 0.5 * dt * (ka_dot_r + state.ka_dot_r_last) + state.ka_r

    # Reaching law + equivalent control; feedforward dot_u/dot_r from setpoint
    ua_u = -ka_u * jnp.sqrt(jnp.abs(sigma_u)) * jnp.sign(sigma_u) - gains.k2_u * sigma_u
    ua_r = -ka_r * jnp.sqrt(jnp.abs(sigma_r)) * jnp.sign(sigma_r) - gains.k2_r * sigma_r

    tx = (setpoint.dot_u + gains.lambda_u * _sig_pow(e_u, gains.beta) - f_u - ua_u) / g_u
    tz = (setpoint.dot_r + gains.lambda_r * _sig_pow(e_r, gains.beta) - f_r - ua_r) / g_r

    tport = jnp.clip(tx / 2.0 + tz / vparams.B, gains.t_min, gains.t_max)
    tstbd = jnp.clip(
        tx / (2.0 * vparams.c) - tz / (vparams.B * vparams.c),
        gains.t_min,
        gains.t_max,
    )

    new_state = AitsmcState(
        e_u_int=e_u_int, e_r_int=e_r_int,
        e_u_last=e_u, e_r_last=e_r,
        ka_u=ka_u, ka_r=ka_r,
        ka_dot_u_last=ka_dot_u, ka_dot_r_last=ka_dot_r,
    )
    debug = {
        "e_u": e_u, "e_r": e_r, "Ka_u": ka_u, "Ka_r": ka_r,
        "sigma_u": sigma_u, "sigma_r": sigma_r,
        "tport": tport, "tstbd": tstbd,
    }
    return new_state, tport, tstbd, debug


@struct.dataclass
class AitsmcLoopState:
    ctrl: AitsmcState
    dyn: DynamicsState


def aitsmc_compute(
    gains: AitsmcGains,
    vparams: VehicleParams,
    loop: AitsmcLoopState,
    setpoint: AitsmcSetpoint,
    perturb=None,
    n_substeps: int = 5,
    dt: float = 0.01,
):
    """N substeps of {AITSMC -> dynamics (+ external perturb force)}.

    Equivalent of the reference's per-env-step loop in simple_env_aitsmc.py:77-101,
    where ``perturb`` is the user-supplied body-force (tau_x, tau_y, tau_z)
    passed to ``model.update_with_perturb`` (:89).
    """
    if perturb is None:
        px = py = pz = 0.0
    else:
        px, py, pz = perturb[..., 0], perturb[..., 1], perturb[..., 2]

    def substep(carry: AitsmcLoopState, _):
        ctrl, tport, tstbd, debug = aitsmc_control(
            gains, vparams, carry.ctrl, setpoint, carry.dyn.vel, dt
        )
        dyn = dynamics_step(vparams, carry.dyn, tport, tstbd, dt, px, py, pz)
        return AitsmcLoopState(ctrl=ctrl, dyn=dyn), debug

    loop, history = jax.lax.scan(substep, loop, None, length=n_substeps)
    return loop, history
