"""Legacy OCEANS-2020 envs: ``usv-asmc-v0``, ``usv-pid-v0``, ``usv-asmc-ye-int-v0``.

Functional re-designs of reference ``usv_asmc_env.py`` (#6), ``usv_pid_env.py``
(#7) and ``usv_asmc_ye_int_env.py`` (#8): heading-offset action (1-D, ±pi/2),
inline controller + full Fossen dynamics at 100 Hz with ONE substep per env
step, cross-track/heading reward, old-gym termination semantics.

Legacy quirks replicated deliberately:

* single-branch "wrap once" on psi_d / e_psi / psi / psi_ak
  (usv_asmc_env.py:124,148,229-232) — differs from atan2 wrap at ±pi.
* ``e_u_last`` is read but NEVER updated (packed back unchanged,
  usv_asmc_env.py:251) — it stays 0 forever, so the speed-error integral is
  effectively trapezoid-against-zero and the PID derivative is e_u/dt.
* no second-order reference filter: ``e_psi_dot = -r`` (usv_asmc_env.py:149).
* desired speed scheduling u_d = (v_d - 0.3) * sigmoid(-10(|e_psi|2/pi - .5)) + 0.3
  (usv_asmc_env.py:153-156).
* thruster saturation asymmetric [-30, 36.5] for ASMC/ye-int AND the PID env
  (usv_asmc_env.py:182-185, usv_pid_env.py:160-163).
* termination: ASMC env on |ye|>10 or |x|>30; PID and ye-int on |ye|>10 or
  x < min_x; reward forced to -1 on termination.
* ye-int env: integral of ye with reset-on-sign-change and NON-halved
  trapezoid (ye_int += dt*(ye + ye_last); usv_asmc_ye_int_env.py:230-233),
  observed state uses ye_ss = ye + 0.001 * ye_int; its reward also differs
  from the asmc/pid form — plain exp(-k_ye*|ye|) with no sigma branch, and
  the action term added in both heading branches (:350-360).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from usv_tpu.core.angles import wrap_angle_once
from usv_tpu.envs.types import TimeStep
from usv_tpu.physics.dynamics import (
    DynamicsState,
    dynamics_step,
    hydrodynamic_coefficients,
)
from usv_tpu.physics.params import VehicleParams

_VP = VehicleParams()


@dataclasses.dataclass(frozen=True)
class LegacyConfigBase:
    integral_step: float = 0.01
    min_speed: float = 0.3
    # ASMC gains (usv_asmc_env.py:40-49)
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
    # reward shaping (usv_asmc_env.py:51-53, 77-78)
    k_ak: float = 5.72
    k_ye: float = 0.5
    sigma_ye: float = 1.0
    w_action: float = 0.2
    max_action: float = np.pi / 2
    max_ye: float = 10.0
    min_x: float = -10.0
    max_x: float = 30.0

    @property
    def c_action(self):
        return 1.0 / ((self.max_action / 2 - (-self.max_action) / 2) / self.integral_step) ** 2

    @property
    def obs_dim(self) -> int:
        return 6

    @property
    def action_dim(self) -> int:
        return 1

    @property
    def action_low(self):
        return (-float(np.pi) / 2,)

    @property
    def action_high(self):
        return (float(np.pi) / 2,)


@dataclasses.dataclass(frozen=True)
class LegacyAsmcConfig(LegacyConfigBase):
    pass


@dataclasses.dataclass(frozen=True)
class LegacyPidConfig(LegacyConfigBase):
    # PID gains (usv_pid_env.py:40-44)
    kp_u: float = 1.1
    ki_u: float = 0.2
    kd_u: float = 0.1
    kp_psi: float = 0.8
    kd_psi: float = 3.0


@dataclasses.dataclass(frozen=True)
class LegacyYeIntConfig(LegacyConfigBase):
    k_i: float = 0.001  # usv_asmc_ye_int_env.py:51


@struct.dataclass
class LegacyState:
    key: jnp.ndarray
    dyn: DynamicsState
    # target = [x_0, y_0, desired_speed, ak, x_d, y_d] (usv_asmc_env.py:296)
    target: jnp.ndarray
    e_u_int: jnp.ndarray
    ka_u: jnp.ndarray
    ka_psi: jnp.ndarray
    ka_dot_u_last: jnp.ndarray
    ka_dot_psi_last: jnp.ndarray
    action_last: jnp.ndarray
    # ye-int extension (zeros elsewhere)
    ye_int: jnp.ndarray
    ye_last: jnp.ndarray
    state_vec: jnp.ndarray  # (6,)


def _observe(vel, pose, target, ye, psi_ak, action_last):
    """state = [u, v_ak, r, ye, psi_ak, action_last] (usv_asmc_env.py:247)."""
    v_ak = jnp.sin(psi_ak) * vel[0] + jnp.cos(psi_ak) * vel[1]
    return jnp.stack([vel[0], v_ak, vel[2], ye, psi_ak, action_last]).astype(
        jnp.float32
    )


def _legacy_reset(cfg, key, pos_range, speed_range):
    ks = jax.random.split(key, 8)  # ks[7] stays unconsumed (state key)
    x = jax.random.uniform(ks[0], minval=-pos_range, maxval=pos_range)
    y = jax.random.uniform(ks[1], minval=-pos_range, maxval=pos_range)
    psi = jax.random.uniform(ks[2], minval=-np.pi, maxval=np.pi)
    x_0 = jax.random.uniform(ks[3], minval=-2.5, maxval=2.5)
    y_0 = jax.random.uniform(ks[4], minval=-2.5, maxval=2.5)
    x_d = jax.random.uniform(ks[5], minval=15.0, maxval=30.0)
    y_d = y_0
    v_d = jax.random.uniform(ks[6], minval=speed_range[0], maxval=speed_range[1])
    ak = jnp.arctan2(y_d - y_0, x_d - x_0)

    psi_ak = wrap_angle_once(psi - ak)
    ye = -(x - x_0) * jnp.sin(ak) + (y - y_0) * jnp.cos(ak)
    z = jnp.zeros((), jnp.float32)
    pose = jnp.stack([x, y, psi]).astype(jnp.float32)
    return LegacyState(
        key=ks[7],
        dyn=DynamicsState(
            pose=pose,
            vel=jnp.zeros(3, jnp.float32),
            accel_last=jnp.zeros(3, jnp.float32),
            eta_dot_last=jnp.zeros(3, jnp.float32),
        ),
        target=jnp.stack([x_0, y_0, v_d, ak, x_d, y_d]).astype(jnp.float32),
        e_u_int=z, ka_u=z, ka_psi=z,
        ka_dot_u_last=z, ka_dot_psi_last=z,
        action_last=z, ye_int=z, ye_last=z,
        state_vec=_observe(
            jnp.zeros(3), pose, None, ye, psi_ak, 0.0
        ),
    )


def _control_common(cfg, state, action):
    """Shared preamble: psi_d, model terms, errors. Returns a dict."""
    vel = state.dyn.vel
    pose = state.dyn.pose
    u, v, r = vel[0], vel[1], vel[2]
    ak = state.target[3]
    v_d = state.target[2]

    action_dot = (action - state.action_last) / cfg.integral_step
    psi_d = wrap_angle_once(action + ak)

    Xu, Xuu, _, _, _, Nr = hydrodynamic_coefficients(u, v)
    g_u = 1.0 / (_VP.m - _VP.X_u_dot)
    g_psi = 1.0 / (_VP.Iz - _VP.N_r_dot)
    f_u = ((_VP.m - _VP.Y_v_dot) * v * r + (Xuu * jnp.abs(u) + Xu * u)) * g_u
    f_psi = ((-_VP.X_u_dot + _VP.Y_v_dot) * u * v + Nr * r) * g_psi

    e_psi = wrap_angle_once(psi_d - pose[2])
    e_psi_dot = -r
    u_psi = 1.0 / (1.0 + jnp.exp(10.0 * (jnp.abs(e_psi) * (2.0 / np.pi) - 0.5)))
    u_d = (v_d - cfg.min_speed) * u_psi + cfg.min_speed
    e_u = u_d - u
    # e_u_last is frozen at 0 in the reference (see module docstring)
    e_u_int = 0.5 * cfg.integral_step * e_u + state.e_u_int
    return dict(
        action_dot=action_dot, g_u=g_u, g_psi=g_psi, f_u=f_u, f_psi=f_psi,
        e_psi=e_psi, e_psi_dot=e_psi_dot, e_u=e_u, e_u_int=e_u_int,
    )


def _asmc_law(cfg, state, c):
    sigma_u = c["e_u"] + cfg.lambda_u * c["e_u_int"]
    sigma_psi = c["e_psi_dot"] + cfg.lambda_psi * c["e_psi"]
    ka_dot_u = jnp.where(
        state.ka_u > cfg.kmin_u,
        cfg.k_u * jnp.sign(jnp.abs(sigma_u) - cfg.mu_u), cfg.kmin_u,
    )
    ka_dot_psi = jnp.where(
        state.ka_psi > cfg.kmin_psi,
        cfg.k_psi * jnp.sign(jnp.abs(sigma_psi) - cfg.mu_psi), cfg.kmin_psi,
    )
    ka_u = 0.5 * cfg.integral_step * (ka_dot_u + state.ka_dot_u_last) + state.ka_u
    ka_psi = (
        0.5 * cfg.integral_step * (ka_dot_psi + state.ka_dot_psi_last) + state.ka_psi
    )
    ua_u = -ka_u * jnp.sqrt(jnp.abs(sigma_u)) * jnp.sign(sigma_u) - cfg.k2_u * sigma_u
    ua_psi = (
        -ka_psi * jnp.sqrt(jnp.abs(sigma_psi)) * jnp.sign(sigma_psi)
        - cfg.k2_psi * sigma_psi
    )
    tx = (cfg.lambda_u * c["e_u"] - c["f_u"] - ua_u) / c["g_u"]
    tz = (cfg.lambda_psi * c["e_psi"] - c["f_psi"] - ua_psi) / c["g_psi"]
    ctrl_updates = dict(
        ka_u=ka_u, ka_psi=ka_psi,
        ka_dot_u_last=ka_dot_u, ka_dot_psi_last=ka_dot_psi,
    )
    return tx, tz, ctrl_updates


def _pid_law(cfg: LegacyPidConfig, state, c):
    e_u_dot = c["e_u"] / cfg.integral_step  # e_u_last frozen at 0
    ua_u = cfg.kp_u * c["e_u"] + cfg.ki_u * c["e_u_int"] + cfg.kd_u * e_u_dot
    ua_psi = cfg.kp_psi * c["e_psi"] + cfg.kd_psi * c["e_psi_dot"]
    tx = (-c["f_u"] + ua_u) / c["g_u"]
    tz = (-c["f_psi"] + ua_psi) / c["g_psi"]
    return tx, tz, {}


def _mix_saturate(tx, tz):
    """Asymmetric thruster saturation [-30, 36.5] (usv_asmc_env.py:179-185)."""
    tport = jnp.clip(tx / 2.0 + tz / _VP.B, -30.0, 36.5)
    tstbd = jnp.clip(tx / (2.0 * _VP.c) - tz / (_VP.B * _VP.c), -30.0, 36.5)
    return tport, tstbd


def _reward(cfg, ye_abs, psi_ak, action_dot, ye_int_mode=False):
    """usv_asmc_env.py:364-374 / usv_pid_env.py:329-338.

    The ye-int env's reward differs in TWO ways (usv_asmc_ye_int_env.py
    :350-360): ``reward_ye`` is the plain exponential ``exp(-k_ye*|ye|)``
    with no near-path sigma branch, and ``reward_action`` is added in BOTH
    branches (the asmc/pid form drops it when |psi_ak| >= pi/2).
    """
    abs_psi = jnp.abs(psi_ak)
    reward_action = cfg.w_action * jnp.tanh(-cfg.c_action * action_dot ** 2)
    reward_ak = -jnp.exp(cfg.k_ak * (abs_psi - np.pi))
    if ye_int_mode:
        reward_ye = jnp.exp(-cfg.k_ye * ye_abs)
        return reward_action + jnp.where(
            abs_psi < np.pi / 2, reward_ye, reward_ak
        )
    reward_ye = jnp.where(
        ye_abs > cfg.sigma_ye,
        jnp.exp(-cfg.k_ye * ye_abs),
        jnp.exp(-cfg.k_ye * ye_abs ** 2 / cfg.sigma_ye),
    )
    return jnp.where(abs_psi < np.pi / 2, reward_action + reward_ye, reward_ak)


def _legacy_step(cfg, state: LegacyState, action, law, done_fn, ye_int_mode=False):
    action = jnp.reshape(action, ())
    c = _control_common(cfg, state, action)
    tx, tz, ctrl_updates = law(cfg, state, c)
    tport, tstbd = _mix_saturate(tx, tz)
    dyn = dynamics_step(_VP, state.dyn, tport, tstbd, cfg.integral_step)

    psi = wrap_angle_once(dyn.pose[2])
    dyn = dyn.replace(pose=dyn.pose.at[2].set(psi))
    ak = state.target[3]
    psi_ak = wrap_angle_once(psi - ak)
    x_0, y_0 = state.target[0], state.target[1]
    ye = -(dyn.pose[0] - x_0) * jnp.sin(ak) + (dyn.pose[1] - y_0) * jnp.cos(ak)
    ye_abs = jnp.abs(ye)

    ye_int = state.ye_int
    ye_last = state.ye_last
    if ye_int_mode:
        # reset on sign change; non-halved trapezoid (ye_int_env :230-233)
        ye_int = jnp.where(jnp.sign(ye) != jnp.sign(ye_last), 0.0, ye_int)
        ye_int = cfg.integral_step * (ye + ye_last) + ye_int
        ye_last = ye
        ye_obs = ye + cfg.k_i * ye_int
    else:
        ye_obs = ye

    reward = _reward(cfg, ye_abs, psi_ak, c["action_dot"], ye_int_mode)
    done = done_fn(cfg, ye_abs, dyn.pose)
    reward = jnp.where(done, -1.0, reward)

    state_vec = _observe(dyn.vel, dyn.pose, state.target, ye_obs, psi_ak, action)
    new_state = state.replace(
        dyn=dyn,
        e_u_int=c["e_u_int"],
        action_last=action,
        ye_int=ye_int,
        ye_last=ye_last,
        state_vec=state_vec,
        **ctrl_updates,
    )
    info = {
        "position": dyn.pose, "velocity": dyn.vel,
        "ye": ye, "psi_ak": psi_ak,
        "tport": tport, "tstbd": tstbd,
    }
    return new_state, TimeStep(
        obs=state_vec, reward=reward,
        terminated=done, truncated=jnp.zeros((), bool), info=info,
    )


# ---- usv-asmc-v0 ------------------------------------------------------------

def reset_asmc(cfg: LegacyAsmcConfig, key) -> LegacyState:
    return _legacy_reset(cfg, key, pos_range=2.5, speed_range=(1.4, 2.4))


def step_asmc(cfg: LegacyAsmcConfig, state, action):
    def done_fn(cfg, ye_abs, pose):
        # |ye| > 10 or |x| > 30 (usv_asmc_env.py:241)
        return (ye_abs > cfg.max_ye) | (jnp.abs(pose[0]) > cfg.max_x)

    return _legacy_step(cfg, state, action, _asmc_law, done_fn)


def reset_obs_asmc(cfg, state):
    return state.state_vec


# ---- usv-pid-v0 -------------------------------------------------------------

def reset_pid(cfg: LegacyPidConfig, key) -> LegacyState:
    # desired_speed ~ uniform(0.4, 1.4) — usv_pid_env.py:257 (slower than the
    # ASMC env's 1.4-2.4)
    return _legacy_reset(cfg, key, pos_range=2.5, speed_range=(0.4, 1.4))


def step_pid(cfg: LegacyPidConfig, state, action):
    def done_fn(cfg, ye_abs, pose):
        # |ye| > 10 or x < min_x (usv_pid_env.py:219)
        return (ye_abs > cfg.max_ye) | (pose[0] < cfg.min_x)

    return _legacy_step(cfg, state, action, _pid_law, done_fn)


def reset_obs_pid(cfg, state):
    return state.state_vec


# ---- usv-asmc-ye-int-v0 -----------------------------------------------------

def reset_ye_int(cfg: LegacyYeIntConfig, key) -> LegacyState:
    # wider start box, slower speeds (ye_int_env :258-279)
    return _legacy_reset(cfg, key, pos_range=5.0, speed_range=(0.4, 1.4))


def step_ye_int(cfg: LegacyYeIntConfig, state, action):
    def done_fn(cfg, ye_abs, pose):
        return (ye_abs > cfg.max_ye) | (pose[0] < cfg.min_x)

    return _legacy_step(cfg, state, action, _asmc_law, done_fn, ye_int_mode=True)


def reset_obs_ye_int(cfg, state):
    return state.state_vec
