"""Gymnasium adapter: the reference's class/env-ID surface over the
functional cores.

A user of the reference package (``gym_usv``) interacts through
``gymnasium.make('usv-simple')`` etc. (gym_usv/__init__.py:3-40) and the env
classes exported from ``gym_usv.envs`` (envs/__init__.py:1-7). This module
reproduces that surface 1:1 on top of the jit-compiled functional cores: each
adapter owns a single-env state pytree, steps it on device, and converts
observations/rewards to NumPy at the boundary — the same contract SB3 and the
reference tools expect (5-tuple step for the modern envs, 4-tuple for the
legacy trio).

Reset ``options`` supported (reference simple_env.py:276-300,
usv_asmc_ca_env.py:358-372): ``place_obstacles_on_path`` (rebuilds the env
with that many path obstacles), ``run_custom_experiment``/``experiment`` and
``obs_x/obs_y/obs_r/target_point/start_position`` (scripted scenes — state
overrides after reset), ``params`` (AITSMC gains), ``perturb_func``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium
    from gymnasium import spaces

    _HAS_GYMNASIUM = True
except ImportError:  # pragma: no cover
    gymnasium = None
    _HAS_GYMNASIUM = False

from usv_tpu.envs import make as make_functional


class GymUsvEnv(gymnasium.Env if _HAS_GYMNASIUM else object):
    """Generic adapter: one functional env instance behind the gym API."""

    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": 30}

    #: subclasses set these
    env_id: str = "usv-simple"
    legacy_api: bool = False  # old-gym 4-tuple step / obs-only reset

    def __init__(self, render_mode: Optional[str] = "rgb_array", options: Optional[dict] = None,
                 reference_reset_sampling: bool = False,
                 stale_reset_carryover: bool = False,
                 **config_overrides):
        self.options = options or {}
        self.render_mode = render_mode
        # exact-seed parity mode: reset(seed=s) replays the reference's
        # NumPy reset draws for s on the host and injects the scene, so the
        # episode matches the reference env bit-for-stream
        # (usv_tpu/compat/seed_replay.py; simple family + legacy trio)
        self.reference_reset_sampling = reference_reset_sampling
        # Reference quirk (found by tools/fuzz_parity.py): the simple
        # family's reset never clears last_action/sensor_data
        # (simple_env.py:228-308 re-samples the scene but not those), so
        # every episode after the first starts with the PREVIOUS episode's
        # final sensor readings in the reset obs and a stale EMA seed for
        # the first step's action filter (:317). Our default is a stateless
        # fresh reset; opt in here to replicate the reuse behavior.
        self.stale_reset_carryover = stale_reset_carryover
        self._config_overrides = dict(config_overrides)
        self._build(self._config_overrides)
        if stale_reset_carryover:
            # only the simple family has the quirk's carrier fields; fail
            # fast instead of silently no-opping on CA/legacy/curved
            shape = jax.eval_shape(
                lambda k: self.handle.reset(self.handle.cfg, k),
                jax.random.key(0),
            )
            base = getattr(shape, "base", shape)
            if not (hasattr(base, "last_action")
                    and hasattr(base, "sensor_dist")):
                raise ValueError(
                    f"stale_reset_carryover is not supported for "
                    f"{self.env_id}: its state has no last_action/"
                    f"sensor_dist to carry (the quirk is specific to the "
                    f"reference simple family, simple_env.py:228-308)"
                )
        self._seed_counter = 0
        self._state = None
        self._renderer = None

        obs_dim = self.handle.cfg.obs_dim
        act_dim = self.handle.cfg.action_dim
        if _HAS_GYMNASIUM:
            self.observation_space = self._make_observation_space(obs_dim)
            self.action_space = self._make_action_space(act_dim)

    # -- overridable space definitions ---------------------------------

    def _make_observation_space(self, obs_dim):
        return spaces.Box(-1.0, 1.0, shape=(obs_dim,), dtype=np.float32)

    def _make_action_space(self, act_dim):
        cfg = self.handle.cfg
        low = np.asarray(cfg.action_low, np.float32)
        high = np.asarray(cfg.action_high, np.float32)
        return spaces.Box(low, high, shape=(act_dim,), dtype=np.float32)

    # -- machinery ------------------------------------------------------

    def _build(self, overrides):
        self.handle = make_functional(self.env_id, **overrides)
        cfg = self.handle.cfg
        self._jit_reset = jax.jit(lambda k: self.handle.reset(cfg, k))
        self._jit_reset_obs = jax.jit(lambda s: self.handle.reset_obs(cfg, s))
        self._jit_step = jax.jit(lambda s, a: self.handle.step(cfg, s, a))
        self._jit_reset_info = (
            jax.jit(lambda s: self.handle.reset_info(cfg, s))
            if self.handle.reset_info is not None else None
        )

    def _next_key(self, seed):
        if seed is None:
            self._seed_counter += 1
            seed = self._seed_counter + np.random.randint(0, 2**31 - 1)
        return jax.random.key(seed)

    def _apply_reset_options(self, state, options):
        """Scripted-scene overrides; subclasses extend."""
        return state

    def _apply_reference_seed(self, state, seed, options):
        """Replay the reference's reset RNG for ``seed`` and inject the
        scene (``reference_reset_sampling=True``; seed_replay.py).

        Returns ``(state, consumed)`` where ``consumed`` lists the option
        keys the replay already honored (reference order: draws -> option
        overrides -> prune -> bootstrap) so :meth:`reset` does not apply
        them a second time post-bootstrap."""
        from usv_tpu.compat import seed_replay

        env_id = self.handle.env_id
        if env_id in ("usv-simple", "usv-asmc-simple", "usv-aitsmc-simple"):
            ov = seed_replay.simple_scene_from_seed(
                self.handle.cfg, seed, options
            )
            # (usv-aitsmc-simple keeps the SAMPLED reference_velocity here:
            # the reference only overwrites it to 0.5 after the reset obs is
            # built, which our core now replicates inside step —
            # envs/simple_aitsmc.py)
            return seed_replay.apply_simple_overrides(state, ov), ()
        if env_id in seed_replay._LEGACY_RANGES:
            pose, target = seed_replay.legacy_scene_from_seed(env_id, seed)
            return seed_replay.apply_legacy_scene(state, pose, target), ()
        if env_id == "usv-asmc-ca-v0":
            # the CA env draws from the GLOBAL np.random stream like the
            # legacy trio (usv_asmc_ca_env.py:331-356); scripted-scene
            # options are injected between the draws and the prune passes,
            # exactly as the reference does (:358-398), then the bootstrap
            # step re-runs — so they must NOT be re-applied afterwards
            # (the second prune/bootstrap would use the post-bootstrap pose)
            scene = seed_replay.ca_scene_from_seed(
                self.handle.cfg, seed, options
            )
            state = seed_replay.apply_ca_scene(self.handle.cfg, state, scene)
            return state, seed_replay.CA_SCENE_OPTION_KEYS
        raise NotImplementedError(
            f"reference_reset_sampling not supported for {env_id}"
        )

    # -- gym API --------------------------------------------------------

    @staticmethod
    def _carry_stale_fields(new_state, old_state):
        """Copy the reference's non-reset fields (last_action, sensor_dist)
        from the previous episode's final state into a fresh reset state —
        the ``stale_reset_carryover`` quirk path."""
        nb = getattr(new_state, "base", None)
        if nb is not None:
            ob = getattr(old_state, "base", old_state)
            return new_state.replace(base=nb.replace(
                last_action=ob.last_action, sensor_dist=ob.sensor_dist))
        if hasattr(new_state, "last_action") and hasattr(new_state, "sensor_dist"):
            return new_state.replace(
                last_action=old_state.last_action,
                sensor_dist=old_state.sensor_dist)
        return new_state

    def reset(self, seed=None, options=None):
        prev_state = self._state
        if _HAS_GYMNASIUM:
            # seed gymnasium's np_random (API contract; our randomization
            # itself runs on-device from the jax key below)
            super().reset(seed=seed)
        options = options or {}
        # per-reset option, like the reference (simple_env.py:276-288): it
        # applies ONLY to resets that pass it (directly or via ctor options)
        merged = {**self.options, **options}
        n = int(merged.get("place_obstacles_on_path") or 0)
        current = self._config_overrides.get("path_obstacles", 0)
        if n != current and (n or getattr(self, "_path_obs_from_option", False)):
            if n:
                self._config_overrides["path_obstacles"] = n
                self._path_obs_from_option = True
            else:
                self._config_overrides.pop("path_obstacles", None)
                self._path_obs_from_option = False
            self._build(self._config_overrides)
        self._state = self._jit_reset(self._next_key(seed))
        consumed = ()
        if self.reference_reset_sampling and seed is not None:
            self._state, consumed = self._apply_reference_seed(
                self._state, seed, merged
            )
        self._state = self._apply_reset_options(
            self._state, {k: v for k, v in merged.items() if k not in consumed}
        )
        if self.stale_reset_carryover and prev_state is not None:
            self._state = self._carry_stale_fields(self._state, prev_state)
        obs = np.asarray(self._jit_reset_obs(self._state))
        if self.legacy_api:
            return obs
        # reference reset info where the family defines one
        # (simple_env.py:303-308 returns _get_info(-1, zeros); the CA env
        # returns {}, usv_asmc_ca_env.py:403)
        info = {}
        if self._jit_reset_info is not None:
            info = {
                k: np.asarray(v)
                for k, v in self._jit_reset_info(self._state).items()
            }
        return obs, info

    def step(self, action):
        action = jnp.asarray(action, dtype=jnp.float32).reshape(
            (self.handle.cfg.action_dim,)
        )
        self._state, ts = self._jit_step(self._state, action)
        obs = np.asarray(ts.obs)
        reward = float(ts.reward)
        terminated = bool(ts.terminated)
        truncated = bool(ts.truncated)

        def to_np(v):  # history entries are nested dicts of arrays
            if isinstance(v, dict):
                return {k: to_np(x) for k, x in v.items()}
            return np.asarray(v)

        info = {k: to_np(v) for k, v in ts.info.items()}
        if self.legacy_api:
            return obs, reward, terminated, info
        return obs, reward, terminated, truncated, info

    def render(self):
        frame = self._render_frame()
        if self.render_mode == "rgb_array":
            return frame
        return None

    def _render_frame(self):
        from usv_tpu.utils.viz import SimpleEnvRenderer

        if self._renderer is None:
            self._renderer = SimpleEnvRenderer(render_mode=self.render_mode)
        return self._renderer.render_state(self.handle.cfg, self._state)

    def close(self):
        if self._renderer is not None:
            self._renderer.close()
            self._renderer = None


class UsvSimpleEnv(GymUsvEnv):
    """Adapter for reference ``UsvSimpleEnv`` (simple_env.py:7-349)."""

    env_id = "usv-simple"

    def _apply_reset_options(self, state, options):
        if options.get("run_custom_experiment"):
            exp = options["experiment"]
            cap = self.handle.cfg.obstacle_cap
            n = len(exp["obstacle_radius"])
            obs_xy = np.zeros((cap, 2), np.float32)
            obs_r = np.full((cap,), 0.1, np.float32)
            mask = np.zeros((cap,), bool)
            obs_xy[:n] = np.asarray(exp["obstacle_positions"], np.float32)[:cap]
            obs_r[:n] = np.asarray(exp["obstacle_radius"], np.float32)[:cap]
            mask[:n] = True
            path_start = np.asarray(exp["path_start"], np.float32)
            angle = float(exp["angle"])
            path_end = path_start + np.array(
                [np.cos(angle), np.sin(angle)], np.float32
            ) * 100.0
            state = state.replace(
                obs_xy=jnp.asarray(obs_xy),
                obs_r=jnp.asarray(obs_r),
                obs_mask=jnp.asarray(mask),
                path_start=jnp.asarray(path_start),
                path_end=jnp.asarray(path_end),
                position=jnp.asarray(np.asarray(exp["position"], np.float32)),
            )
        return state


class UsvSimpleASMCEnv(UsvSimpleEnv):
    env_id = "usv-asmc-simple"


class UsvSimpleAITSMCEnv(UsvSimpleEnv):
    """Adapter for ``UsvSimpleAITSMCEnv`` (simple_env_aitsmc.py).

    ``options['params']`` (AITSMC gains) and ``options['perturb_func']``
    become config-level settings; a python ``perturb_func`` is wrapped so it
    must be jnp-traceable (pure function of the step index).
    """

    env_id = "usv-aitsmc-simple"

    def __init__(self, render_mode=None, options=None, **config_overrides):
        options = options or {}
        if "perturb_func" in options:
            config_overrides.setdefault("perturb_fn", options["perturb_func"])
        self._aitsmc_params = options.get("params")
        super().__init__(render_mode=render_mode, options=options, **config_overrides)

    def step(self, action):
        if self._aitsmc_params is not None:
            if not hasattr(self, "_jit_gains_step"):
                # built once — a fresh jit per step would retrace/recompile
                # every call (seconds each on a remote TPU)
                self._jit_gains_step = jax.jit(
                    lambda s, a: self.handle.step(
                        self.handle.cfg, s, a, gains=self._aitsmc_params
                    )
                )
            action = jnp.asarray(action, dtype=jnp.float32).reshape((2,))
            self._state, ts = self._jit_gains_step(self._state, action)
            return (
                np.asarray(ts.obs), float(ts.reward),
                bool(ts.terminated), bool(ts.truncated),
                {k: np.asarray(v) for k, v in ts.info.items()},
            )
        return super().step(action)


class UsvAsmcCaEnv(GymUsvEnv):
    """Adapter for ``UsvAsmcCaEnv`` (usv_asmc_ca_env.py:21-519)."""

    env_id = "usv-asmc-ca-v0"
    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": 60}

    def _apply_reset_options(self, state, options):
        updates = {}
        if "obs_x" in options:
            cap = self.handle.cfg.obstacle_cap
            ox = np.asarray(options["obs_x"], np.float32).reshape(-1)[:cap]
            oy = np.asarray(options["obs_y"], np.float32).reshape(-1)[:cap]
            orr = np.asarray(options["obs_r"], np.float32).reshape(-1)[:cap]
            n = len(ox)
            obs_xy = np.zeros((cap, 2), np.float32)
            obs_r = np.full((cap,), 1.0, np.float32)
            mask = np.zeros((cap,), bool)
            obs_xy[:n, 0] = ox
            obs_xy[:n, 1] = oy
            obs_r[:n] = orr
            mask[:n] = True
            updates.update(
                obs_xy=jnp.asarray(obs_xy), obs_r=jnp.asarray(obs_r),
                obs_mask=jnp.asarray(mask),
            )
        if "target_point" in options:
            updates["target_point"] = jnp.asarray(
                np.asarray(options["target_point"], np.float32)[:2]
            )
        if "start_position" in options:
            pose = jnp.asarray(np.asarray(options["start_position"], np.float32))
            updates["dyn"] = state.dyn.replace(pose=pose)
        if updates:
            from usv_tpu.control.asmc import init_asmc

            state = state.replace(**updates)
            cfg = self.handle.cfg
            # reference order (:358-402): apply overrides -> prune obstacles
            # near start/target -> bootstrap step. Controller/vehicle state
            # restarts fresh (the pre-override bootstrap is discarded).
            margin = cfg.boat_radius + cfg.safety_radius + 0.35
            pose = state.dyn.pose
            d_start = (
                jnp.hypot(state.obs_xy[:, 0] - pose[0], state.obs_xy[:, 1] - pose[1])
                - state.obs_r - margin
            )
            d_tgt = (
                jnp.hypot(
                    state.obs_xy[:, 0] - state.target_point[0],
                    state.obs_xy[:, 1] - state.target_point[1],
                )
                - state.obs_r - margin
            )
            z3 = jnp.zeros(3, jnp.float32)
            state = state.replace(
                obs_mask=state.obs_mask & (d_start >= 0) & (d_tgt >= 0),
                ctrl=init_asmc(),
                dyn=state.dyn.replace(
                    vel=z3, accel_last=z3, eta_dot_last=z3
                ),
                action_history=jnp.zeros(2, jnp.float32),
                filter_window=jnp.zeros_like(state.filter_window),
                filter_window_i=jnp.zeros((), jnp.int32),
                sensor_dist=jnp.full(
                    cfg.sensor_num, cfg.sensor_max_range, jnp.float32
                ),
                state_vec=jnp.zeros(cfg.obs_dim, jnp.float32),
            )
            # re-run the bootstrap step on the scripted scene (reference :402)
            state, _ = self._jit_step(
                state, jnp.asarray([-1.0, 0.0], jnp.float32)
            )
            state = state.replace(
                step_count=jnp.zeros((), jnp.int32),
                perturb_step=jnp.zeros((), jnp.int32),
            )
        return state

    def _render_frame(self):
        from usv_tpu.utils.viz import CaEnvRenderer

        if self._renderer is None:
            self._renderer = CaEnvRenderer(render_mode=self.render_mode)
        return self._renderer.render_state(self.handle.cfg, self._state)


class UsvCurvedAitsmcEnv(GymUsvEnv):
    """Adapter for ``usv-curved-aitsmc`` (beyond-reference: curved/waypoint
    PCHIP paths + AITSMC inner loop, BASELINE config 2)."""

    env_id = "usv-curved-aitsmc"

    def _make_observation_space(self, obs_dim):
        # velocities/ye/sensor distances are not normalized to [-1, 1]
        return spaces.Box(-np.inf, np.inf, shape=(obs_dim,), dtype=np.float32)

    def _render_frame(self):
        from usv_tpu.utils.viz import CurvedEnvRenderer

        if self._renderer is None:
            self._renderer = CurvedEnvRenderer(render_mode=self.render_mode)
        return self._renderer.render_state(self.handle.cfg, self._state)


class UsvAsmcEnv(GymUsvEnv):
    """Adapter for legacy ``UsvAsmcEnv`` (old-gym API)."""

    env_id = "usv-asmc-v0"
    legacy_api = True

    def _render_frame(self):
        from usv_tpu.utils.viz import LegacyEnvRenderer

        if self._renderer is None:
            self._renderer = LegacyEnvRenderer(render_mode=self.render_mode)
        return self._renderer.render_state(self.handle.cfg, self._state)

    def _make_observation_space(self, obs_dim):
        # [u, v_ak, r, ye, psi_ak, action_last] bounds per the reference
        # (usv_asmc_env.py:80-96)
        low = np.array(
            [-1.5, -1.5, -1.0, -10.0, -np.pi, -np.pi / 2], np.float32
        )
        high = np.array(
            [1.5, 1.5, 1.0, 10.0, np.pi, np.pi / 2], np.float32
        )
        return spaces.Box(low=low, high=high, dtype=np.float32)


class UsvPidEnv(UsvAsmcEnv):
    env_id = "usv-pid-v0"


class UsvAsmcYeIntEnv(UsvAsmcEnv):
    env_id = "usv-asmc-ye-int-v0"


def register_gymnasium_envs(prefix: str = ""):
    """Register the 7 reference env IDs with gymnasium
    (mirrors gym_usv/__init__.py:3-40, incl. max_episode_steps)."""
    if not _HAS_GYMNASIUM:
        raise ImportError("gymnasium is not available")
    specs = [
        ("usv-asmc-v0", UsvAsmcEnv, None),
        ("usv-pid-v0", UsvPidEnv, None),
        ("usv-asmc-ye-int-v0", UsvAsmcYeIntEnv, None),
        ("usv-asmc-ca-v0", UsvAsmcCaEnv, 5000),
        ("usv-simple", UsvSimpleEnv, 500),
        ("usv-asmc-simple", UsvSimpleASMCEnv, 1000),
        ("usv-aitsmc-simple", UsvSimpleAITSMCEnv, 150),
        # beyond-reference curved/waypoint-path env (BASELINE config 2)
        ("usv-curved-aitsmc", UsvCurvedAitsmcEnv, 1000),
    ]
    for env_id, cls, max_steps in specs:
        full_id = prefix + env_id
        if full_id in gymnasium.registry:
            continue
        gymnasium.register(
            id=full_id,
            entry_point=f"{cls.__module__}:{cls.__name__}",
            max_episode_steps=max_steps,
        )
