"""``usv-aitsmc-simple`` — simple env with the AITSMC inner loop.

Functional re-design of reference ``gym_usv/envs/simple_env_aitsmc.py`` (#4 in
SURVEY.md §2): per env step, 5 substeps of {AITSMC controller -> dynamic model
with external perturbation}, then observation/reward/termination from the base
simple env with ``update_position=False``.

Replicated semantics: EMA setpoint filtering 0.8/0.2 on (u, r) against the
*previous* setpoint (reference ``filter_action`` :49-61 — the IIR branch after
the early return is dead and stays dead here), the setpoint being constant
across the 5 substeps (it is recomputed from the unchanged ``last_action``,
:77-84), ``reference_velocity = 0.5`` at reset (:41), ``max_action`` forced to
ones before the base step (:103), ``last_action`` rewritten to the setpoint
values after the base step (:118), controller debug {e_u, e_r, Ka_u, Ka_r}
exposed in info (:105-111), and the user perturbation being a pure function of
the env-step index (:31-35, 74-75) evaluated once per step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from usv_tpu.control.aitsmc import (
    AitsmcGains,
    AitsmcLoopState,
    AitsmcSetpoint,
    AitsmcState,
    aitsmc_compute,
    init_aitsmc,
)
from usv_tpu.envs import simple
from usv_tpu.envs.simple import SimpleEnvConfig, SimpleEnvState
from usv_tpu.envs.types import TimeStep
from usv_tpu.physics.dynamics import DynamicsState
from usv_tpu.physics.params import VehicleParams


def _zero_perturb(step):
    return jnp.zeros(3, dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class SimpleAitsmcEnvConfig(SimpleEnvConfig):
    max_episode_steps: int = 150   # gym_usv/__init__.py:36-40
    n_substeps: int = 5            # simple_env_aitsmc.py:77
    substep_dt: float = 0.01
    # Pure function of the env-step index -> body-frame (tau_x, tau_y, tau_z);
    # the 'perturb_func' reset option (simple_env_aitsmc.py:31-35).
    perturb_fn: Callable = _zero_perturb


@struct.dataclass
class SimpleAitsmcEnvState:
    base: SimpleEnvState
    ctrl: AitsmcState
    accel_last: jnp.ndarray
    eta_dot_last: jnp.ndarray
    # the C++ model's own velocity: the reference recreates DynamicModel at
    # the drawn pose with ZERO velocity (simple_env_aitsmc.py:43) — the base
    # reset's sampled velocity reaches only the reset obs, never the model
    model_vel: jnp.ndarray
    perturb_step: jnp.ndarray  # () int32


def reset(cfg: SimpleAitsmcEnvConfig, key) -> SimpleAitsmcEnvState:
    """Base reset; fresh controller+model (ref :39-47).

    The reference sets ``reference_velocity = 0.5`` AFTER ``super().reset``
    has already built the reset obs/info (simple_env_aitsmc.py:40-41), so
    the reset observation carries the *sampled* value and every subsequent
    step uses 0.5 — replicated here by forcing 0.5 inside :func:`step`
    rather than at reset."""
    base = simple.reset(cfg, key)
    return SimpleAitsmcEnvState(
        base=base,
        ctrl=init_aitsmc(),
        accel_last=jnp.zeros(3, dtype=jnp.float32),
        eta_dot_last=jnp.zeros(3, dtype=jnp.float32),
        model_vel=jnp.zeros(3, dtype=jnp.float32),
        perturb_step=jnp.zeros((), dtype=jnp.int32),
    )


def reset_obs(cfg: SimpleAitsmcEnvConfig, state: SimpleAitsmcEnvState):
    return simple.reset_obs(cfg, state.base)


def reset_info(cfg: SimpleAitsmcEnvConfig, state: SimpleAitsmcEnvState):
    """Reference reset returns ``super().reset()``'s info
    (simple_env_aitsmc.py:39-47 -> simple_env.py:303)."""
    return simple.reset_info(cfg, state.base)


def step(
    cfg: SimpleAitsmcEnvConfig,
    state: SimpleAitsmcEnvState,
    action,
    gains: AitsmcGains = AitsmcGains(),
    vparams: VehicleParams = VehicleParams(),
):
    """5 x {AITSMC -> model(+perturb)} then base step (ref :67-120)."""
    perturb = cfg.perturb_fn(state.perturb_step)

    # EMA setpoint against the previous setpoint-valued last_action (:58)
    filt = 0.8 * jnp.stack(
        [state.base.last_action[0], state.base.last_action[2]]
    ) + 0.2 * action
    setpoint = AitsmcSetpoint(
        u=filt[0], r=filt[1],
        dot_u=jnp.zeros(()), dot_r=jnp.zeros(()),
    )

    loop = AitsmcLoopState(
        ctrl=state.ctrl,
        dyn=DynamicsState(
            pose=state.base.position,
            vel=state.model_vel,
            accel_last=state.accel_last,
            eta_dot_last=state.eta_dot_last,
        ),
    )
    loop, hist = aitsmc_compute(
        gains, vparams, loop, setpoint, perturb,
        n_substeps=cfg.n_substeps, dt=cfg.substep_dt,
    )

    base = state.base.replace(
        position=loop.dyn.pose,
        velocity=loop.dyn.vel,
        max_action=jnp.ones(3, dtype=jnp.float32),  # ref :103
        # ref :41 — every post-reset step runs with reference_velocity 0.5
        # (the sampled value only ever reaches the reset obs/info)
        reference_velocity=jnp.asarray(0.5, jnp.float32),
    )
    base, ts = simple.step(cfg, base, action, update_position=False)

    # Rewrite last_action to the setpoint values (ref :118)
    base = base.replace(
        last_action=jnp.stack([setpoint.u, jnp.zeros(()), setpoint.r]).astype(
            jnp.float32
        )
    )

    info = dict(ts.info)
    info.update(
        left_thruster=hist["tport"][-1],
        right_thruster=hist["tstbd"][-1],
        e_u=loop.ctrl.e_u,
        e_r=loop.ctrl.e_r,
        Ka_u=loop.ctrl.ka_u,
        Ka_r=loop.ctrl.ka_r,
        action0=action[0],
        action1=action[1],
        setpoint_u=setpoint.u,
        setpoint_r=setpoint.r,
        perturb=perturb,
    )

    new_state = SimpleAitsmcEnvState(
        base=base,
        ctrl=loop.ctrl,
        accel_last=loop.dyn.accel_last,
        eta_dot_last=loop.dyn.eta_dot_last,
        model_vel=loop.dyn.vel,
        perturb_step=state.perturb_step + 1,
    )
    return new_state, TimeStep(
        obs=ts.obs, reward=ts.reward,
        terminated=ts.terminated, truncated=ts.truncated, info=info,
    )
