"""``usv-asmc-ca-v0`` — collision-avoidance env with the full-dynamics ASMC.

Functional re-design of reference ``gym_usv/envs/usv_asmc_ca_env.py`` (#5 in
SURVEY.md §2): per 10 Hz env step, 10 substeps of {ASMC @ 100 Hz -> Fossen
dynamics} (the C++ ``update_controller_and_model_n`` path, :199), analytic
collision test (:229-246), 16-ray lidar (:249-259), body-frame tracking error
(:261-270), and the velocity-biased tracking reward (:485-498).

Replicated semantics:

* action denormalization [-1,1] -> ([-1,1], [-pi,pi]) (:160-163); the heading
  channel is an ABSOLUTE world heading handed to the ASMC setpoint (:196-198).
* optional moving-average action filter window (:165-171; off by default :94).
* action history of length 1 whose mean (i.e. the previous action) enters the
  state BEFORE the current action is appended (:283-293).
* termination ladder (:295-310): arrived (<1.5 m) -> terminated; collision ->
  truncated; tracking error > 40 m -> terminated with reward -100; |pose|>100
  -> terminated AND truncated.
* reset draws start/target/obstacles, prunes obstacles near start AND target
  (:376-398), then takes one real step with action [-1, 0] to produce the
  initial observation (:402) — the returned state embeds that step.
* ``perturb_range`` is accepted and the do_perturb window is tracked, but the
  force is never applied in the live ASMC branch (the C++ driver takes no
  perturb argument, :199; only the dead "PID"/"kinematic" branches used it) —
  faithfully inert here too.

Divergence: fixed obstacle capacity (16) with validity mask instead of
np.delete; num_obs ~ uniform(2,10) as in :349.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from usv_tpu.control.asmc import (
    AsmcGains,
    AsmcLoopState,
    AsmcState,
    asmc_compute,
    init_asmc,
)
from usv_tpu.core.angles import wrap_angle
from usv_tpu.core.geometry import denormalize_val
from usv_tpu.envs.types import TimeStep
from usv_tpu.ops.dispatch import sensor_raycast
from usv_tpu.physics.dynamics import DynamicsState
from usv_tpu.physics.params import VehicleParams


@dataclasses.dataclass(frozen=True)
class CaEnvConfig:
    sensor_num: int = 16
    sensor_span: float = (2.0 / 3.0) * 2.0 * np.pi
    sensor_max_range: float = 100.0
    obstacle_cap: int = 16
    boat_radius: float = 0.1
    safety_radius: float = 0.3
    # Map limits (reference :59-63)
    min_x: float = -10.0
    max_x: float = 30.0
    min_y: float = -10.0
    max_y: float = 10.0
    # Normalization (reference :80-86)
    max_u: float = 2.5 / 2.0
    max_r: float = 3.5
    max_episode_steps: int = 5000  # gym_usv/__init__.py:19-22
    n_substeps: int = 10
    substep_dt: float = 0.01
    place_obstacles: bool = True
    strict_compat_raycast: bool = True
    raycast_backend: str = "auto"  # see SimpleEnvConfig.raycast_backend
    # moving-average action filter (reference :94-97,165-171)
    filter_action: bool = False
    filter_window_size: int = 5
    # perturbation window — tracked but inert in the ASMC branch (see module
    # docstring); kept for API parity (reference ctor :24)
    perturb_range: tuple = (0, 0)
    # Expose the full per-substep controller/model history in info as
    # fixed-shape (n_substeps, ...) arrays — the reference's
    # controller_history/model_history entries (usv_asmc_ca_env.py:312-323,
    # filled by usv_libs_py.utils.update_controller_and_model_n :199).
    debug_history: bool = False

    @property
    def obs_dim(self) -> int:
        return 7 + self.sensor_num

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
class CaEnvState:
    key: jnp.ndarray
    ctrl: AsmcState
    dyn: DynamicsState
    target_point: jnp.ndarray     # (2,)
    obs_xy: jnp.ndarray           # (K, 2)
    obs_r: jnp.ndarray            # (K,)
    obs_mask: jnp.ndarray         # (K,)
    action_history: jnp.ndarray   # (2,) previous action (history length 1)
    filter_window: jnp.ndarray    # (W, 2)
    filter_window_i: jnp.ndarray  # () int32
    sensor_dist: jnp.ndarray      # (R,)
    state_vec: jnp.ndarray        # (7 + R,) last observation
    perturb_step: jnp.ndarray     # () int32
    step_count: jnp.ndarray       # () int32


def _build_core(cfg: CaEnvConfig, key) -> CaEnvState:
    """Sample start/target/obstacles — reference reset :327-398 (pre-step).

    Round 5: one threefry sweep for every draw (the same fusion that cut
    the simple env's autoreset increment — the branch-free autoreset
    re-runs this per step per env); distributions unchanged (Box-Muller
    normals, affine uniforms), stream differs from rounds 1-4.
    """
    K = cfg.obstacle_cap
    key, state_key = jax.random.split(key)
    # layout: [0] x, [1] y, [2] theta, [3:5] target, [5] num_obs,
    # [6:6+K] obs_r, [6+K:6+3K] Box-Muller uniforms for (K, 2) normals
    u = jax.random.uniform(key, (6 + 3 * K,), dtype=jnp.float32)
    x = cfg.min_x + u[0] * (cfg.max_x - cfg.min_x)
    y = cfg.min_y + u[1] * 5.0
    theta = (u[2] - 0.5) * (np.pi / 2)
    pose = jnp.stack([x, y, theta])

    target = (
        jnp.asarray([cfg.min_x, cfg.max_y - 5.0])
        + u[3:5] * jnp.asarray([cfg.max_x - 10.0 - cfg.min_x, 4.0])
    )

    num_obs = (2.0 + 8.0 * u[5]).astype(jnp.int32)
    if not cfg.place_obstacles:
        num_obs = jnp.zeros((), jnp.int32)
    center = 0.5 * (pose[:2] + target)
    obs_r = 1.0 + u[6:6 + K]
    u1 = u[6 + K:6 + 2 * K]
    u2 = u[6 + 2 * K:6 + 3 * K]
    r_bm = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-38)))
    normals = jnp.stack(
        [r_bm * jnp.cos(2.0 * np.pi * u2), r_bm * jnp.sin(2.0 * np.pi * u2)],
        axis=-1,
    )
    obs_xy = center + normals * 10.0
    mask = jnp.arange(K) < num_obs

    # Prune obstacles near start and near target (:376-398)
    margin = cfg.boat_radius + cfg.safety_radius + 0.35
    d_start = jnp.hypot(obs_xy[:, 0] - pose[0], obs_xy[:, 1] - pose[1]) - obs_r - margin
    d_tgt = jnp.hypot(obs_xy[:, 0] - target[0], obs_xy[:, 1] - target[1]) - obs_r - margin
    mask = mask & (d_start >= 0) & (d_tgt >= 0)

    return CaEnvState(
        key=state_key,
        ctrl=init_asmc(),
        dyn=DynamicsState(
            pose=pose.astype(jnp.float32),
            vel=jnp.zeros(3, jnp.float32),
            accel_last=jnp.zeros(3, jnp.float32),
            eta_dot_last=jnp.zeros(3, jnp.float32),
        ),
        target_point=target.astype(jnp.float32),
        obs_xy=obs_xy.astype(jnp.float32),
        obs_r=obs_r.astype(jnp.float32),
        obs_mask=mask,
        action_history=jnp.zeros(2, jnp.float32),
        filter_window=jnp.zeros((cfg.filter_window_size, 2), jnp.float32),
        filter_window_i=jnp.zeros((), jnp.int32),
        sensor_dist=jnp.full(cfg.sensor_num, cfg.sensor_max_range, jnp.float32),
        state_vec=jnp.zeros(cfg.obs_dim, jnp.float32),
        perturb_step=jnp.zeros((), jnp.int32),
        step_count=jnp.zeros((), jnp.int32),
    )


def bootstrap(cfg: CaEnvConfig, state: CaEnvState) -> CaEnvState:
    """The reference reset's trailing real step with action [-1, 0]
    (usv_asmc_ca_env.py:402); exposed separately so scene injection
    (compat/seed_replay.apply_ca_scene) can rebuild a pre-bootstrap state
    and then run the exact same bootstrap."""
    state, _ts = step(cfg, state, jnp.asarray([-1.0, 0.0], jnp.float32))
    # the bootstrap step must not consume episode budget or perturb window
    return state.replace(
        step_count=jnp.zeros((), jnp.int32),
        perturb_step=jnp.zeros((), jnp.int32),
    )


def reset(cfg: CaEnvConfig, key) -> CaEnvState:
    """Sample a scene, then take one step with action [-1, 0] (reference :402)."""
    return bootstrap(cfg, _build_core(cfg, key))


def reset_obs(cfg: CaEnvConfig, state: CaEnvState):
    return state.state_vec


def step(
    cfg: CaEnvConfig,
    state: CaEnvState,
    action_in,
    gains: AsmcGains = AsmcGains(),
    vparams: VehicleParams = VehicleParams(),
):
    """One 10 Hz step — reference ``step`` :146-325, same op order."""
    action = jnp.stack([
        denormalize_val(action_in[0], -1.0, 1.0),
        denormalize_val(action_in[1], -np.pi, np.pi),
    ])

    filter_window = state.filter_window
    filter_window_i = state.filter_window_i
    if cfg.filter_action:
        filter_window = filter_window.at[filter_window_i].set(action)
        filter_window_i = (filter_window_i + 1) % cfg.filter_window_size
        action = jnp.mean(filter_window, axis=0)

    perturb_step = state.perturb_step + 1
    # do_perturb window tracked for parity; force inert in the ASMC branch.

    loop = AsmcLoopState(
        ctrl=state.ctrl, dyn=state.dyn, perturb_step=jnp.zeros((), jnp.int32)
    )
    loop, _hist = asmc_compute(
        gains, vparams, loop, action,
        n_substeps=cfg.n_substeps, dt=cfg.substep_dt,
        absolute_heading=True,
    )
    dyn = loop.dyn
    pose, vel = dyn.pose, dyn.vel
    psi = pose[2]

    # Analytic collision vs obstacle boundaries (:229-246)
    boundary = (
        jnp.hypot(state.obs_xy[:, 0] - pose[0], state.obs_xy[:, 1] - pose[1])
        - state.obs_r - cfg.boat_radius
    )
    masked_boundary = jnp.where(state.obs_mask, boundary, jnp.inf)
    any_obs = jnp.any(state.obs_mask)
    collision = any_obs & (jnp.min(masked_boundary) < 0.0)

    # Lidar (:249-259); ordering key is the boundary distance
    sensor_dist = sensor_raycast(
        pose, state.obs_xy, state.obs_r, state.obs_mask, boundary,
        cfg.sensor_num, cfg.sensor_max_range, cfg.sensor_span,
        strict_compat=cfg.strict_compat_raycast,
        backend=cfg.raycast_backend,
    )
    sensors_norm = sensor_dist / cfg.sensor_max_range

    # Guidance errors (:261-270)
    distance_to_target = jnp.hypot(
        pose[0] - state.target_point[0], pose[1] - state.target_point[1]
    )
    angle_to_target = wrap_angle(
        jnp.arctan2(
            state.target_point[1] - pose[1], state.target_point[0] - pose[0]
        ) - psi
    )
    c, s = jnp.cos(psi), jnp.sin(psi)
    delta = jnp.concatenate([state.target_point, jnp.zeros(1)]) - pose
    tracking_error = jnp.stack([
        c * delta[0] + s * delta[1],
        -s * delta[0] + c * delta[1],
        wrap_angle(angle_to_target),
    ])
    div_fac = cfg.max_x ** 2 + cfg.max_y ** 2
    normalized_te = tracking_error / jnp.asarray([div_fac, div_fac, np.pi])

    arrived = distance_to_target < 1.5

    # Reward (:275-281, 485-498)
    r_tracking_error = (
        -jnp.hypot(tracking_error[0], tracking_error[1]) / 75.0
        - jnp.abs(angle_to_target / np.pi)
    )
    r_velocity = jnp.hypot(vel[0], vel[1])
    reward = r_tracking_error + r_velocity * 0.5

    # State vector (:283-288): mean of the PREVIOUS action history
    state_vec = jnp.concatenate([
        jnp.stack([vel[0] / cfg.max_u, vel[2] / cfg.max_r]),
        normalized_te,
        state.action_history / jnp.maximum(1.0, np.pi),
        sensors_norm,
    ]).astype(jnp.float32)

    # Termination ladder (:295-310)
    terminated = arrived
    truncated = collision
    far = jnp.hypot(tracking_error[0], tracking_error[1]) > 40.0
    terminated = terminated | far
    reward = jnp.where(far, reward - 100.0, reward)
    oob = jnp.max(jnp.abs(pose)) > 100.0
    terminated = terminated | oob
    truncated = truncated | oob

    step_count = state.step_count + 1
    truncated = truncated | (step_count >= cfg.max_episode_steps)

    info = {
        "action": action,
        "position": pose,
        "velocity": vel,
        "action_in": action_in,
        "target": state.target_point,
        "distance_to_target": distance_to_target,
        "arrived": arrived,
        "collision": collision,
        "r_tracking_error": r_tracking_error,
        "left_thruster": _hist["tport"][-1],
        "right_thruster": _hist["tstbd"][-1],
    }
    if cfg.debug_history:
        # Full per-substep history as fixed-shape (n_substeps, ...) arrays —
        # the reference's info["controller_history"]/["model_history"]
        # struct lists (usv_asmc_ca_env.py:312-323), with the C++ binding's
        # field names (heading_error/heading_gain/heading_sigma/Tz etc.).
        info["controller_history"] = {
            "left_thruster": _hist["tport"],
            "right_thruster": _hist["tstbd"],
            "speed_error": _hist["e_u"],
            "heading_error": _hist["e_psi"],
            "speed_gain": _hist["ka_u"],
            "heading_gain": _hist["ka_psi"],
            "speed_sigma": _hist["sigma_u"],
            "heading_sigma": _hist["sigma_psi"],
            "Tx": _hist["tx"],
            "Tz": _hist["tz"],
        }
        info["model_history"] = {
            "pose": _hist["pose"],
            "vel": _hist["vel"],
        }

    new_state = state.replace(
        ctrl=loop.ctrl,
        dyn=dyn,
        action_history=action.astype(jnp.float32),
        filter_window=filter_window,
        filter_window_i=filter_window_i,
        sensor_dist=sensor_dist,
        state_vec=state_vec,
        perturb_step=perturb_step,
        step_count=step_count,
    )
    return new_state, TimeStep(
        obs=state_vec,
        reward=reward,
        terminated=terminated,
        truncated=truncated,
        info=info,
    )
