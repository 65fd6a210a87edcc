"""``usv-simple`` — the modern main environment, as a pure functional core.

TPU-native re-design of reference ``gym_usv/envs/simple_env.py`` (349 LoC,
component #2 of SURVEY.md §2): first-order kinematic boat, 128-ray sensor,
straight start->end path with monotone progress, dense shaped reward, and
fully domain-randomized resets — all on-device via ``jax.random``, with
fixed-capacity masked obstacle arrays instead of dynamic deletes.

Replicated semantics (reference line cites inline): EMA action smoothing
(:317), acceleration-clipped velocity update (:320-324), lookahead'd
closest-point progress (:139-148), the reward's effective terms including the
dead overwrites' final values (:150-201 — three ``ye_reward`` assignments of
which the max-of-exponentials wins, ``delta_action_reward`` linear form wins,
``angle_action_reward`` zeroed), observation built from the *previous*
action (:338), termination on boundary-distance < 0.05 (:334) and
out-of-bounds truncation (:336).

Known deliberate divergences (documented, not bugs):

* RNG: ``jax.random`` streams replace the NumPy Generator — identical
  distributions, different bit streams. Parity with the reference is defined
  at fixed-initial-state trajectory level (SURVEY.md §7.3).
* Reset sensor data: the reference's ``reset`` reuses whatever ``sensor_data``
  array the object held (zeros on a fresh env, stale on reuse; simple_env.py
  :47,:302); here reset always behaves like a fresh env (zeros).
* Obstacle count: uniform over [15, 30) at cap 32, mask-padded; the
  "delete near start/target" pass invalidates mask bits instead of shrinking
  the array (:260-268), and the "add one back if none survive" branch
  re-enables slot 0 at a fresh uniform position (:270-274).
* With ``path_obstacles > 0`` the last ``path_obstacles`` capacity slots are
  reserved, so the random count is clipped to ``obstacle_cap -
  path_obstacles``; the reference appends path obstacles on top of the full
  random draw (raise ``obstacle_cap`` to recover the reference's counts).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from usv_tpu.core.angles import wrap_angle
from usv_tpu.core.geometry import closest_point_on_segment, cross_track_error
from usv_tpu.envs.types import TimeStep
from usv_tpu.ops.dispatch import sensor_raycast


@dataclasses.dataclass(frozen=True)
class SimpleEnvConfig:
    """Static configuration (hashable; baked into the jit)."""

    sensor_count: int = 128
    sensor_max_range: float = 100.0
    sensor_span: float = (2.0 / 3.0) * 2.0 * np.pi
    obstacle_cap: int = 32
    env_bound: float = 20.0  # world is [0, env_bound]^2 (reference :56)
    dt: float = 1.0 / 25.0
    max_episode_steps: int = 500  # TimeLimit (gym_usv/__init__.py:27)
    ignore_obstacles: bool = False
    # Reference raycast reduction (sorted-first-hit, :439-461) vs true min.
    strict_compat_raycast: bool = True
    # "auto" picks "pallas" (fused VMEM kernel, 1.7x step speedup at 4096
    # envs on v5e) on TPU backends and "xla" (masked min-reductions)
    # elsewhere; single-env calls always lower to XLA via custom_vmap.
    raycast_backend: str = "auto"
    # Reward constants (reference :150-186)
    ye_k: float = 0.075
    collision_penalty: float = -20.0
    collision_sensor_threshold: float = 0.2
    # Number of extra obstacles placed along the path at reset
    # (reset option 'place_obstacles_on_path', reference :276-288). Static.
    path_obstacles: int = 0

    @property
    def obs_dim(self) -> int:
        return 15 + self.sensor_count

    @property
    def action_dim(self) -> int:
        return 2

    @property
    def action_low(self):
        # dU in [0.2, 1], dR in [-1, 1] (reference simple_env.py:30)
        return (0.2, -1.0)

    @property
    def action_high(self):
        return (1.0, 1.0)


@struct.dataclass
class SimpleEnvState:
    key: jnp.ndarray
    position: jnp.ndarray          # (3,) x, y, psi
    velocity: jnp.ndarray          # (3,) u, v, r
    last_action: jnp.ndarray       # (3,) smoothed [u, 0, r] action
    path_start: jnp.ndarray        # (2,)
    path_end: jnp.ndarray          # (2,)
    progress: jnp.ndarray          # ()
    target_position: jnp.ndarray   # (2,)
    max_action: jnp.ndarray        # (3,)
    max_acceleration: jnp.ndarray  # (3,)
    reference_velocity: jnp.ndarray  # ()
    obs_xy: jnp.ndarray            # (K, 2)
    obs_r: jnp.ndarray             # (K,)
    obs_mask: jnp.ndarray          # (K,) bool
    sensor_dist: jnp.ndarray       # (R,) last raycast distances
    step_count: jnp.ndarray        # () int32


def _sensor_sweep(cfg: SimpleEnvConfig, state: SimpleEnvState):
    """Boundary distances + raycast — reference :203-226.

    Returns (min boundary distance, per-ray distances).
    """
    n = state.obs_xy - state.position[:2]
    boundary = jnp.hypot(n[..., 0], n[..., 1]) - state.obs_r
    masked_boundary = jnp.where(state.obs_mask, boundary, jnp.inf)

    dist = sensor_raycast(
        state.position, state.obs_xy, state.obs_r, state.obs_mask, boundary,
        cfg.sensor_count, cfg.sensor_max_range, cfg.sensor_span,
        strict_compat=cfg.strict_compat_raycast,
        backend=cfg.raycast_backend,
    )

    if cfg.ignore_obstacles:
        # reference :222-224: distances forced clear
        return jnp.asarray(1.0, dist.dtype), jnp.full_like(dist, cfg.sensor_max_range)
    return jnp.min(masked_boundary), dist


def _angle_to_target(state: SimpleEnvState):
    delta = state.target_position - state.position[:2]
    return wrap_angle(jnp.arctan2(delta[1], delta[0]) - state.position[2])


def _target_state(cfg: SimpleEnvConfig, state: SimpleEnvState):
    """[angle, distance, ye, ref_vel] / norms — reference :72-80."""
    distance = jnp.hypot(
        state.position[0] - state.target_position[0],
        state.position[1] - state.target_position[1],
    )
    angle = _angle_to_target(state)
    ye = cross_track_error(state.position[:2], state.path_start, state.path_end)
    norm = jnp.asarray(
        [np.pi, float(np.hypot(cfg.env_bound, cfg.env_bound)), 10.0, 10.0],
        dtype=jnp.float32,
    )
    return jnp.stack([angle, distance, ye, state.reference_velocity]) / norm


def observe(cfg: SimpleEnvConfig, state: SimpleEnvState, action3) -> jnp.ndarray:
    """Build the (15 + R,) observation — reference ``_get_obs`` :91-96."""
    sensor_state = state.sensor_dist / cfg.sensor_max_range
    target_state = _target_state(cfg, state)
    # static element picks (no gather in the hot loop)
    action_state = jnp.stack([action3[..., 0], action3[..., 2]], axis=-1) / jnp.stack(
        [state.max_action[..., 0], state.max_action[..., 2]], axis=-1
    )
    kinem = jnp.concatenate([state.max_action / 10.0, state.max_acceleration / 10.0])
    return jnp.concatenate(
        [state.velocity / 10.0, target_state, action_state, kinem, sensor_state]
    ).astype(jnp.float32)


def compute_reward(cfg: SimpleEnvConfig, state: SimpleEnvState, action3):
    """Dense shaped reward — reference ``_get_reward`` :150-201.

    Only the *effective* terms survive here; the reference's dead overwrites
    are resolved to their final values (ye: max-of-exponentials form :167-170;
    delta_action: linear form :176; angle_action: zero :178).
    """
    min_sensor = jnp.min(state.sensor_dist)
    colision_reward = jnp.where(
        (min_sensor < cfg.collision_sensor_threshold) & (not cfg.ignore_obstacles),
        cfg.collision_penalty,
        0.0,
    )

    delta_action = jnp.abs(state.last_action - action3)
    angle = _angle_to_target(state)
    ye = cross_track_error(state.position[:2], state.path_start, state.path_end)

    ye_reward = jnp.maximum(
        jnp.exp(-jnp.abs(ye / cfg.ye_k)),
        jnp.exp(-jnp.square(ye / cfg.ye_k)),
    )
    angle_to_target_reward = jnp.exp(-jnp.abs(angle))
    delta_action_reward = -(jnp.sum(delta_action) / 2.0) * 0.15
    velocity_track_reward = (
        jnp.exp(
            -jnp.abs(
                jnp.hypot(state.velocity[0], state.velocity[1])
                - state.reference_velocity
            )
        )
        * 0.05
    )

    reward = (
        colision_reward
        + ye_reward
        + angle_to_target_reward
        + velocity_track_reward
        + delta_action_reward
    )
    reward_info = {
        "ye_reward": ye_reward,
        "angle_to_target_reward": angle_to_target_reward,
        "angle_action_reward": jnp.zeros_like(ye_reward),  # zeroed, ref :178
        "delta_action_reward": delta_action_reward,
        "delta_action": jnp.sum(delta_action),
        "velocity_track_reward": velocity_track_reward,
        "reference_velocity": state.reference_velocity,
        "reward_velocity": state.last_action[0],
        "reference_velocity_error": state.last_action[0] - state.reference_velocity,
    }
    return reward, reward_info


def _info(cfg: SimpleEnvConfig, state: SimpleEnvState, reward, action3):
    """Fixed-shape analog of reference ``_get_info`` :102-115."""
    return {
        "position": state.position,
        "velocity": state.velocity,
        "path_start": state.path_start,
        "path_end": state.path_end,
        "reward": reward,
        "action0": action3[0],
        "action1": action3[2],
        "left_thruster": jnp.zeros(()),
        "right_thruster": jnp.zeros(()),
        "ye": cross_track_error(state.position[:2], state.path_start, state.path_end),
        "angle_to_target": _target_state(cfg, state)[0],
    }


def reset_info(cfg: SimpleEnvConfig, state: SimpleEnvState):
    """Post-reset info dict — the reference reset returns
    ``_get_info(-1, np.zeros(3))`` (simple_env.py:303-308)."""
    return _info(cfg, state, jnp.float32(-1.0), jnp.zeros(3, jnp.float32))


def reset(cfg: SimpleEnvConfig, key) -> SimpleEnvState:
    """Domain-randomized reset — reference ``reset`` :228-308, on-device.

    Distributions match the reference; draws use independent jax.random
    bits rather than a serial NumPy stream. Round 5: every draw comes from
    ONE threefry sweep — a single ``uniform(key, (N,))`` block sliced into
    the individual quantities (Box-Muller for the normals, a floored
    uniform for the obstacle-count randint, affine maps for the rest).
    The rounds-1-4 form made 13 key splits + ~14 separate draw calls
    (~88 threefry blocks/env); under the branch-free autoreset this reset
    runs EVERY step for EVERY env, and the fused sweep cut the measured
    autoreset increment from 41 to 27 µs at the 4096-env bench protocol
    (reset-math share 36 -> 20 µs; +11% on the headline — same-session
    bench A/B/A 31.3/28.3/31.6 M, docs/PERFORMANCE.md roofline section).
    Distributions are unchanged; the raw stream differs from rounds 1-4
    (nothing pins it: parity vs the reference uses host-side seed replay,
    and the golden tests override every sampled field).
    """
    half = cfg.env_bound / 2.0
    two_pi = 2.0 * np.pi
    K = cfg.obstacle_cap
    P = cfg.path_obstacles
    n_random = K - P

    key, state_key = jax.random.split(key)
    # layout: [0:14] scalars, [14:14+2K] obs_xy, [14+2K:14+3K] obs_r,
    # [14+3K:16+3K] fallback position, then P magnitudes + 2P jitter
    # uniforms for the path obstacles (when enabled)
    n_draw = 16 + 3 * K + 3 * P
    u = jax.random.uniform(key, (n_draw,), dtype=jnp.float32)

    def box_muller(u1, u2):
        # exact standard normals from a uniform pair; u1 in [0, 1) guarded
        # away from log(0)
        r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-38)))
        return r * jnp.cos(two_pi * u2), r * jnp.sin(two_pi * u2)

    n0, n1 = box_muller(u[0], u[1])
    path_start = jnp.stack([n0, n1]) * 0.5 + half
    heading = u[2] * two_pi - np.pi
    position = jnp.concatenate([path_start, heading[None]])

    angle = u[3] * two_pi - np.pi
    dist = 100.0 + 10.0 * u[4]
    path_end = path_start + jnp.stack([jnp.cos(angle), jnp.sin(angle)]) * dist

    target_position = u[5:7] * cfg.env_bound
    velocity = u[7:10] * 0.15

    max_action = jnp.stack(
        [1.5 + 1.5 * u[10], jnp.zeros(()), 3.0 + 3.0 * u[11]]
    )
    reference_velocity = 0.75 + u[12] * (max_action[0] - 0.75)
    max_acceleration = jnp.asarray([1.75, 0.0, 3.0], dtype=jnp.float32)

    # randint(15, 30): floor of uniform over 15 values (u < 1 so <= 29)
    obstacle_n = 15 + jnp.floor(u[13] * 15.0).astype(jnp.int32)
    obs_xy = u[14:14 + 2 * K].reshape(K, 2) * cfg.env_bound
    obs_r = 0.15 + 0.35 * u[14 + 2 * K:14 + 3 * K]
    fallback_xy = u[14 + 3 * K:16 + 3 * K] * cfg.env_bound
    slot = jnp.arange(K)
    obs_mask = slot < jnp.minimum(obstacle_n, n_random)

    if P > 0:
        # reset option 'place_obstacles_on_path' (reference :276-288):
        # normally-jittered points along the path direction. bound is
        # np.hypot(*env_bounds) = hypot(0, env_bound) = env_bound
        # (reference simple_env.py:281 with env_bounds=(0, 20))
        base = 16 + 3 * K
        mag = u[base:base + P] * cfg.env_bound
        j0, j1 = box_muller(u[base + P:base + 2 * P],
                            u[base + 2 * P:base + 3 * P])
        line = path_start + jnp.stack([jnp.cos(angle), jnp.sin(angle)], -1) * mag[:, None]
        path_obs = line + jnp.stack([j0, j1], axis=-1)
        obs_xy = obs_xy.at[n_random:].set(path_obs)
        obs_mask = obs_mask | (slot >= n_random)

    # Invalidate obstacles within 0.5 m of the start or the (sampled) target
    # (reference :260-268). The path obstacles are exempt in the reference
    # (placed after the delete pass) — keep that.
    d_pos = jnp.hypot(obs_xy[:, 0] - position[0], obs_xy[:, 1] - position[1])
    d_tgt = jnp.hypot(
        obs_xy[:, 0] - target_position[0], obs_xy[:, 1] - target_position[1]
    )
    near = (d_pos < 0.5) | (d_tgt < 0.5)
    keep = obs_mask & ~(near & (slot < n_random))
    # "Place one obstacle back in" if every random obstacle got deleted
    # (reference :270-274: the check runs BEFORE path obstacles are placed
    # and draws a fresh uniform position — re-enable slot 0 likewise, at a
    # fresh position rather than its pruned one)
    no_random = ~jnp.any(keep & (slot < n_random))
    obs_xy = jnp.where(
        (no_random & (slot == 0))[:, None], fallback_xy[None, :], obs_xy
    )
    keep = keep | (no_random & (slot == 0))

    return SimpleEnvState(
        key=state_key,
        position=position.astype(jnp.float32),
        velocity=velocity.astype(jnp.float32),
        last_action=jnp.zeros(3, dtype=jnp.float32),
        path_start=path_start.astype(jnp.float32),
        path_end=path_end.astype(jnp.float32),
        progress=jnp.zeros((), dtype=jnp.float32),
        target_position=target_position.astype(jnp.float32),
        max_action=max_action.astype(jnp.float32),
        max_acceleration=max_acceleration,
        reference_velocity=reference_velocity.astype(jnp.float32),
        obs_xy=obs_xy.astype(jnp.float32),
        obs_r=obs_r.astype(jnp.float32),
        obs_mask=keep,
        sensor_dist=jnp.zeros(cfg.sensor_count, dtype=jnp.float32),
        step_count=jnp.zeros((), dtype=jnp.int32),
    )


def reset_obs(cfg: SimpleEnvConfig, state: SimpleEnvState) -> jnp.ndarray:
    """The observation the reference returns from reset (:302): built with a
    zero action and the pre-step (uniform-sampled) target position."""
    return observe(cfg, state, jnp.zeros(3, dtype=jnp.float32))


def step(
    cfg: SimpleEnvConfig,
    state: SimpleEnvState,
    action,
    update_position: bool = True,
):
    """One 25 Hz env step — reference ``step`` :310-346, same op order.

    ``action`` is (2,) = (dU, dR) in the reference's action space. Returns
    ``(new_state, TimeStep)``.
    """
    action3 = jnp.stack([action[0], jnp.zeros_like(action[0]), action[1]])
    action3 = state.max_action * action3

    if update_position:
        action3 = 0.8 * state.last_action + 0.2 * action3
        delta_v = jnp.clip(
            action3 - state.velocity, -state.max_acceleration, state.max_acceleration
        )
        velocity = jnp.clip(
            state.velocity + delta_v, -state.max_action, state.max_action
        )
        theta = state.position[2]
        rotated_vel = jnp.stack(
            [velocity[0] * jnp.cos(theta), velocity[0] * jnp.sin(theta), velocity[2]]
        )
        position = state.position + rotated_vel * cfg.dt
        state = state.replace(position=position, velocity=velocity)

    # Guidance: lookahead'd closest point with monotone progress (:328, :139-148)
    target_position, progress = closest_point_on_segment(
        state.position[:2], state.path_start, state.path_end,
        state.progress, (0.005 / 10.0) * cfg.env_bound,
    )
    state = state.replace(target_position=target_position, progress=progress)

    # Sensors (:329)
    min_boundary, sensor_dist = _sensor_sweep(cfg, state)
    state = state.replace(sensor_dist=sensor_dist)

    terminated = (min_boundary < 0.05) & (not cfg.ignore_obstacles)
    truncated = jnp.any(
        (state.position[:2] > cfg.env_bound) | (state.position[:2] < 0.0)
    )
    # TimeLimit (max_episode_steps=500, gym_usv/__init__.py:27)
    step_count = state.step_count + 1
    truncated = truncated | (step_count >= cfg.max_episode_steps)

    # Observation uses the PREVIOUS action (reference :338)
    obs = observe(cfg, state, state.last_action)
    reward, reward_info = compute_reward(cfg, state, action3)
    info = _info(cfg, state, reward, action3)
    info.update(reward_info)

    state = state.replace(last_action=action3, step_count=step_count)
    return state, TimeStep(
        obs=obs,
        reward=reward,
        terminated=terminated,
        truncated=truncated,
        info=info,
    )
