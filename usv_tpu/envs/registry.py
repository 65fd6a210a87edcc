"""Environment registry — functional analog of the reference's gymnasium
registrations (``gym_usv/__init__.py:3-40``).

Each entry bundles the config class and the pure functions of one env family.
``make(env_id)`` returns an :class:`EnvHandle`; kwargs override config fields.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional


class EnvHandle(NamedTuple):
    env_id: str
    cfg: Any
    reset: Callable   # (cfg, key) -> state
    step: Callable    # (cfg, state, action) -> (state, TimeStep)
    reset_obs: Callable  # (cfg, state) -> obs
    # (cfg, state) -> info dict for the post-reset state, for families whose
    # reference reset returns an info dict (simple_env.py:303-308 returns
    # _get_info(-1, zeros)); None where the reference returns obs-only / {}
    reset_info: Optional[Callable] = None


_REGISTRY: Dict[str, Dict[str, Any]] = {}


def register(env_id: str, config_cls, reset, step, reset_obs,
             reset_info=None):
    _REGISTRY[env_id] = dict(
        config_cls=config_cls, reset=reset, step=step, reset_obs=reset_obs,
        reset_info=reset_info,
    )


def registered_ids():
    return sorted(_REGISTRY)


def make(env_id: str, **config_overrides) -> EnvHandle:
    if env_id not in _REGISTRY:
        raise KeyError(
            f"unknown env id {env_id!r}; registered: {registered_ids()}"
        )
    entry = _REGISTRY[env_id]
    cfg = entry["config_cls"](**config_overrides)
    return EnvHandle(
        env_id=env_id,
        cfg=cfg,
        reset=entry["reset"],
        step=entry["step"],
        reset_obs=entry["reset_obs"],
        reset_info=entry["reset_info"],
    )


def _register_builtin():
    from usv_tpu.envs import simple, simple_aitsmc, simple_asmc

    register(
        "usv-simple",
        simple.SimpleEnvConfig, simple.reset, simple.step, simple.reset_obs,
        reset_info=simple.reset_info,
    )
    register(
        "usv-asmc-simple",
        simple_asmc.SimpleAsmcEnvConfig,
        simple_asmc.reset, simple_asmc.step, simple_asmc.reset_obs,
        reset_info=simple_asmc.reset_info,
    )
    register(
        "usv-aitsmc-simple",
        simple_aitsmc.SimpleAitsmcEnvConfig,
        simple_aitsmc.reset, simple_aitsmc.step, simple_aitsmc.reset_obs,
        reset_info=simple_aitsmc.reset_info,
    )
    from usv_tpu.envs import asmc_ca

    register(
        "usv-asmc-ca-v0",
        asmc_ca.CaEnvConfig, asmc_ca.reset, asmc_ca.step, asmc_ca.reset_obs,
    )
    from usv_tpu.envs import curved

    register(
        "usv-curved-aitsmc",
        curved.CurvedEnvConfig, curved.reset, curved.step, curved.reset_obs,
    )
    from usv_tpu.envs import legacy

    register(
        "usv-asmc-v0",
        legacy.LegacyAsmcConfig, legacy.reset_asmc, legacy.step_asmc,
        legacy.reset_obs_asmc,
    )
    register(
        "usv-pid-v0",
        legacy.LegacyPidConfig, legacy.reset_pid, legacy.step_pid,
        legacy.reset_obs_pid,
    )
    register(
        "usv-asmc-ye-int-v0",
        legacy.LegacyYeIntConfig, legacy.reset_ye_int, legacy.step_ye_int,
        legacy.reset_obs_ye_int,
    )


_register_builtin()
