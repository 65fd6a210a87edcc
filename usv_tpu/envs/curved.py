"""``usv-curved-aitsmc`` — curved/waypoint path following with the AITSMC loop.

BASELINE.json config 2 ("UsvAsmc with AITSMC inner-loop controller +
curved/waypoint paths, randomized start states"). The reference ships the
machinery for this — ``utils/path_gen.py`` (PCHIP waypoint paths, obstacle
placement along the path, ``simplified_lookahead``) — but never wires it into
an environment; it is exercised only from notebooks/legacy experiments
(SURVEY.md component #17). This env completes that capability TPU-natively:

* reset generates a random PCHIP waypoint path on device
  (``utils/path_gen.generate_path`` semantics) plus obstacles jittered along
  it (``place_obstacles`` semantics), per env under vmap;
* guidance uses the reference's ``simplified_lookahead`` (target = path point
  at x + lookahead; path_gen.py:50-54) and vertical cross-track error
  ``ye = path(x) - y``;
* each step runs the AITSMC controller + Fossen dynamics substep loop
  (the usv-aitsmc-simple inner loop) with the policy action as (u, r)
  setpoints, EMA-filtered like simple_env_aitsmc.py:58;
* observation/reward follow the simple-env shaping in FORM (exp-of-ye,
  heading alignment, velocity tracking, action smoothness, collision) but
  with constants tuned for the curved task: ``ye_k`` defaults to 0.5 (the
  simple env uses 0.075) and the ye term is a single exponential rather
  than the simple env's max-of-exponentials.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from usv_tpu.control.aitsmc import (
    AitsmcGains,
    AitsmcLoopState,
    AitsmcSetpoint,
    AitsmcState,
    aitsmc_compute,
    init_aitsmc,
)
from usv_tpu.core.angles import wrap_angle
from usv_tpu.envs.types import TimeStep
from usv_tpu.ops.dispatch import sensor_raycast
from usv_tpu.physics.dynamics import DynamicsState
from usv_tpu.physics.params import VehicleParams
from usv_tpu.utils.path_gen import PchipPath, pchip_eval, pchip_fit


@dataclasses.dataclass(frozen=True)
class CurvedEnvConfig:
    num_waypoints: int = 8
    # waypoint polar sampling (reference path_gen.py:6-8)
    angle_std: float = 0.5
    length_mean: float = 3.0
    length_std: float = 0.1
    lookahead: float = 1.0
    # obstacles along the path (reference path_gen.py:17-38)
    obstacle_cap: int = 16
    obs_pos_std: float = 4.0
    obs_rad_mean: float = 0.8
    obs_rad_std: float = 0.1
    sensor_count: int = 32
    sensor_max_range: float = 100.0
    sensor_span: float = (2.0 / 3.0) * 2.0 * np.pi
    strict_compat_raycast: bool = True
    raycast_backend: str = "auto"  # see SimpleEnvConfig.raycast_backend
    # AITSMC substep loop
    n_substeps: int = 5
    substep_dt: float = 0.01
    # setpoint scaling: action in [-1,1]^2 -> u in [0, max_u], r in +-max_r
    max_u: float = 1.0
    max_r: float = 1.5
    reference_velocity: float = 0.5
    max_episode_steps: int = 1000
    max_ye: float = 10.0
    ye_k: float = 0.5
    collision_penalty: float = -20.0

    @property
    def obs_dim(self) -> int:
        # vel(3) + [angle, dist, ye, ref_vel](4) + last setpoint(2) + sensors
        return 9 + self.sensor_count

    @property
    def action_dim(self) -> int:
        return 2

    @property
    def action_low(self):
        return (-1.0, -1.0)

    @property
    def action_high(self):
        return (1.0, 1.0)


@struct.dataclass
class CurvedEnvState:
    key: jnp.ndarray
    ctrl: AitsmcState
    dyn: DynamicsState
    path: PchipPath                # per-env PCHIP path y(x)
    waypoints: jnp.ndarray         # (W, 2)
    obs_xy: jnp.ndarray            # (K, 2)
    obs_r: jnp.ndarray             # (K,)
    obs_mask: jnp.ndarray          # (K,)
    last_setpoint: jnp.ndarray     # (2,) EMA-filtered (u, r)
    sensor_dist: jnp.ndarray       # (R,)
    step_count: jnp.ndarray        # () int32


def reset(cfg: CurvedEnvConfig, key) -> CurvedEnvState:
    ks = jax.random.split(key, 9)  # ks[8] stays unconsumed (state key)

    # random polar waypoints -> cumsum (path_gen.py:6-12 semantics)
    angles = jnp.clip(
        cfg.angle_std * jax.random.normal(ks[0], (cfg.num_waypoints,)),
        -np.pi / 2 + 0.1, np.pi / 2 - 0.1,
    )
    lengths = cfg.length_mean + cfg.length_std * jax.random.normal(
        ks[1], (cfg.num_waypoints,)
    )
    steps = lengths[:, None] * jnp.stack([jnp.cos(angles), jnp.sin(angles)], -1)
    steps = steps.at[0].set(jnp.zeros(2))
    waypoints = jnp.cumsum(steps, axis=0)
    # strictly increasing x is required for the interpolant: cos(angle) > 0
    # by the clip above, so cumsum x is monotone.
    path = pchip_fit(waypoints[:, 0], waypoints[:, 1])

    # randomized start: at the first waypoint with heading jitter
    psi0 = jax.random.uniform(ks[2], minval=-np.pi / 4, maxval=np.pi / 4)
    pose = jnp.stack([waypoints[0, 0], waypoints[0, 1], psi0])

    # obstacles jittered along the path (path_gen.py:17-38 semantics)
    K = cfg.obstacle_cap
    base_x = jax.random.uniform(
        ks[3], (K,), minval=waypoints[0, 0], maxval=waypoints[-1, 0]
    )
    displacement = cfg.obs_pos_std * jax.random.normal(ks[4], (K,))
    off_angle = jax.random.uniform(ks[5], (K,), minval=np.pi, maxval=2 * np.pi)
    on_path = jnp.stack([base_x, pchip_eval(path, base_x)], -1)
    obs_xy = on_path + displacement[:, None] * jnp.stack(
        [jnp.cos(off_angle), jnp.sin(off_angle)], -1
    )
    obs_r = cfg.obs_rad_mean + cfg.obs_rad_std * jax.random.normal(ks[6], (K,))
    # valid: positive radius, and not within 1.5 m of the start
    d_start = jnp.hypot(obs_xy[:, 0] - pose[0], obs_xy[:, 1] - pose[1]) - obs_r
    n_obs = jax.random.randint(ks[7], (), 4, K)
    obs_mask = (obs_r > 0.05) & (d_start > 1.5) & (jnp.arange(K) < n_obs)

    return CurvedEnvState(
        key=ks[8],
        ctrl=init_aitsmc(),
        dyn=DynamicsState(
            pose=pose.astype(jnp.float32),
            vel=jnp.zeros(3, jnp.float32),
            accel_last=jnp.zeros(3, jnp.float32),
            eta_dot_last=jnp.zeros(3, jnp.float32),
        ),
        path=path,
        waypoints=waypoints.astype(jnp.float32),
        obs_xy=obs_xy.astype(jnp.float32),
        obs_r=obs_r.astype(jnp.float32),
        obs_mask=obs_mask,
        last_setpoint=jnp.zeros(2, jnp.float32),
        sensor_dist=jnp.full(cfg.sensor_count, cfg.sensor_max_range, jnp.float32),
        step_count=jnp.zeros((), jnp.int32),
    )


def _lookahead_target(cfg, state):
    """simplified_lookahead (path_gen.py:50-54): x + lookahead, clamped."""
    x = jnp.maximum(
        state.dyn.pose[0] + cfg.lookahead, state.waypoints[0, 0]
    )
    x = jnp.minimum(x, state.waypoints[-1, 0])
    return jnp.stack([x, pchip_eval(state.path, x)])


def _observe(cfg, state, target):
    pose, vel = state.dyn.pose, state.dyn.vel
    delta = target - pose[:2]
    angle = wrap_angle(jnp.arctan2(delta[1], delta[0]) - pose[2])
    dist = jnp.hypot(delta[0], delta[1])
    ye = pchip_eval(state.path, pose[0]) - pose[1]
    return jnp.concatenate([
        vel / 10.0,
        jnp.stack([
            angle / np.pi, dist / 10.0, ye / 10.0,
            jnp.asarray(cfg.reference_velocity, jnp.float32) / 10.0,
        ]),
        state.last_setpoint,
        state.sensor_dist / cfg.sensor_max_range,
    ]).astype(jnp.float32)


def reset_obs(cfg: CurvedEnvConfig, state: CurvedEnvState):
    return _observe(cfg, state, _lookahead_target(cfg, state))


def step(
    cfg: CurvedEnvConfig,
    state: CurvedEnvState,
    action,
    gains: AitsmcGains = AitsmcGains(),
    vparams: VehicleParams = VehicleParams(),
):
    # EMA setpoint filter (simple_env_aitsmc.py:58 semantics), scaled
    raw = jnp.stack([
        (action[0] + 1.0) * 0.5 * cfg.max_u,  # u in [0, max_u]
        action[1] * cfg.max_r,
    ])
    setpoint_vals = 0.8 * state.last_setpoint + 0.2 * raw
    setpoint = AitsmcSetpoint(
        u=setpoint_vals[0], r=setpoint_vals[1],
        dot_u=jnp.zeros(()), dot_r=jnp.zeros(()),
    )

    loop = AitsmcLoopState(ctrl=state.ctrl, dyn=state.dyn)
    loop, hist = aitsmc_compute(
        gains, vparams, loop, setpoint,
        n_substeps=cfg.n_substeps, dt=cfg.substep_dt,
    )
    state = state.replace(ctrl=loop.ctrl, dyn=loop.dyn)
    pose, vel = loop.dyn.pose, loop.dyn.vel

    # sensors over the path obstacles
    boundary = (
        jnp.hypot(state.obs_xy[:, 0] - pose[0], state.obs_xy[:, 1] - pose[1])
        - state.obs_r
    )
    sensor_dist = sensor_raycast(
        pose, state.obs_xy, state.obs_r, state.obs_mask, boundary,
        cfg.sensor_count, cfg.sensor_max_range, cfg.sensor_span,
        strict_compat=cfg.strict_compat_raycast,
        backend=cfg.raycast_backend,
    )
    state = state.replace(sensor_dist=sensor_dist)

    target = _lookahead_target(cfg, state)
    delta = target - pose[:2]
    angle = wrap_angle(jnp.arctan2(delta[1], delta[0]) - pose[2])
    ye = pchip_eval(state.path, pose[0]) - pose[1]

    min_boundary = jnp.min(jnp.where(state.obs_mask, boundary, jnp.inf))
    collision = min_boundary < 0.05

    ye_reward = jnp.exp(-jnp.abs(ye / cfg.ye_k))
    angle_reward = jnp.exp(-jnp.abs(angle))
    speed = jnp.hypot(vel[0], vel[1])
    velocity_track_reward = jnp.exp(
        -jnp.abs(speed - cfg.reference_velocity)
    ) * 0.05
    delta_action_reward = -0.5 * 0.15 * jnp.sum(
        jnp.abs(setpoint_vals - state.last_setpoint)
    )
    collision_reward = jnp.where(collision, cfg.collision_penalty, 0.0)
    reward = (
        ye_reward + angle_reward + velocity_track_reward
        + delta_action_reward + collision_reward
    )

    arrived = pose[0] >= state.waypoints[-1, 0]
    off_track = jnp.abs(ye) > cfg.max_ye
    terminated = collision | arrived | off_track
    step_count = state.step_count + 1
    truncated = step_count >= cfg.max_episode_steps

    state = state.replace(
        last_setpoint=setpoint_vals.astype(jnp.float32),
        step_count=step_count,
    )
    obs = _observe(cfg, state, target)
    info = {
        "position": pose,
        "velocity": vel,
        "ye": ye,
        "angle_to_target": angle,
        "arrived": arrived,
        "collision": collision,
        "left_thruster": hist["tport"][-1],
        "right_thruster": hist["tstbd"][-1],
        "e_u": loop.ctrl.e_u,
        "e_r": loop.ctrl.e_r,
        "Ka_u": loop.ctrl.ka_u,
        "Ka_r": loop.ctrl.ka_r,
        "ye_reward": ye_reward,
        "angle_to_target_reward": angle_reward,
        "velocity_track_reward": velocity_track_reward,
        "delta_action_reward": delta_action_reward,
        "reward": reward,
    }
    return state, TimeStep(
        obs=obs, reward=reward,
        terminated=terminated, truncated=truncated, info=info,
    )
