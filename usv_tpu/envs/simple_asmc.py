"""``usv-asmc-simple`` — simple env driven by the full ASMC + hydrodynamics.

Functional re-design of reference ``gym_usv/envs/simple_env_asmc.py`` (#3 in
SURVEY.md §2): each env step runs TWO ``UsvAsmc.compute`` calls (2 x 10
substeps at 100 Hz), then defers observation/reward/termination to the base
simple env.

Reference quirk replicated by default (``double_integrate_compat=True``):
``super().step(np.zeros(2))`` is called with ``update_position=True``
(simple_env_asmc.py:27), so the kinematic EMA update *also* moves the boat on
top of the hydrodynamic integration. Set the flag False for the physically
clean variant.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from usv_tpu.control.asmc import (
    AsmcGains,
    AsmcLoopState,
    AsmcState,
    asmc_compute,
    init_asmc,
)
from usv_tpu.envs import simple
from usv_tpu.envs.simple import SimpleEnvConfig, SimpleEnvState
from usv_tpu.physics.dynamics import DynamicsState
from usv_tpu.physics.params import VehicleParams


@dataclasses.dataclass(frozen=True)
class SimpleAsmcEnvConfig(SimpleEnvConfig):
    max_episode_steps: int = 1000  # gym_usv/__init__.py:30-34
    n_compute_calls: int = 2       # simple_env_asmc.py:19
    n_substeps: int = 10           # control/usv_asmc.py:56
    substep_dt: float = 0.01
    double_integrate_compat: bool = True
    # lax.scan unroll factor for the 20-substep inner loop (semantics
    # identical; docs/PERFORMANCE.md asmc-simple attribution). The call
    # boundary carries no state, so the 2x10 nested loop is run as one
    # flat 20-substep scan.
    substep_unroll: int = 1


@struct.dataclass
class SimpleAsmcEnvState:
    base: SimpleEnvState
    ctrl: AsmcState
    accel_last: jnp.ndarray     # (3,) dynamics trapezoid memory
    eta_dot_last: jnp.ndarray   # (3,)


def reset(cfg: SimpleAsmcEnvConfig, key) -> SimpleAsmcEnvState:
    """Base reset + fresh controller/integrator (simple_env_asmc.py:14-16)."""
    base = simple.reset(cfg, key)
    return SimpleAsmcEnvState(
        base=base,
        ctrl=init_asmc(),
        accel_last=jnp.zeros(3, dtype=jnp.float32),
        eta_dot_last=jnp.zeros(3, dtype=jnp.float32),
    )


def reset_obs(cfg: SimpleAsmcEnvConfig, state: SimpleAsmcEnvState):
    return simple.reset_obs(cfg, state.base)


def reset_info(cfg: SimpleAsmcEnvConfig, state: SimpleAsmcEnvState):
    """Reference reset defers to ``SimpleEnv.reset`` (simple_env_asmc.py:14-16),
    whose info is ``_get_info(-1, zeros)`` (simple_env.py:303)."""
    return simple.reset_info(cfg, state.base)


def step(
    cfg: SimpleAsmcEnvConfig,
    state: SimpleAsmcEnvState,
    action,
    gains: AsmcGains = AsmcGains(),
    vparams: VehicleParams = VehicleParams(),
):
    """2 x {10 ASMC substeps} then base step with zero action (ref :18-27)."""
    loop = AsmcLoopState(
        ctrl=state.ctrl,
        dyn=DynamicsState(
            pose=state.base.position,
            vel=state.base.velocity,
            accel_last=state.accel_last,
            eta_dot_last=state.eta_dot_last,
        ),
        perturb_step=jnp.zeros((), dtype=jnp.int32),
    )

    # The reference runs n_compute_calls x {n_substeps} (:18-27); the call
    # boundary carries no controller/model state, so one flat scan of
    # n_compute_calls * n_substeps substeps is exactly equivalent (pinned
    # by tests/test_reference_env_parity.py) and exposes the unroll lever.
    loop, _ = asmc_compute(
        gains, vparams, loop, action,
        do_perturb=False,
        n_substeps=cfg.n_compute_calls * cfg.n_substeps,
        dt=cfg.substep_dt,
        unroll=cfg.substep_unroll,
    )

    base = state.base.replace(position=loop.dyn.pose, velocity=loop.dyn.vel)
    base, ts = simple.step(
        cfg, base, jnp.zeros(2, dtype=jnp.float32),
        update_position=cfg.double_integrate_compat,
    )
    new_state = SimpleAsmcEnvState(
        base=base,
        ctrl=loop.ctrl,
        accel_last=loop.dyn.accel_last,
        eta_dot_last=loop.dyn.eta_dot_last,
    )
    return new_state, ts
