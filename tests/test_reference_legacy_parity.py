"""Env-level trajectory parity vs the reference legacy envs (actual code).

Companion to tests/test_reference_env_parity.py for the legacy trio
``usv-asmc-v0`` / ``usv-pid-v0`` / ``usv-asmc-ye-int-v0``
(usv_asmc_env.py / usv_pid_env.py / usv_asmc_ye_int_env.py): the reference
classes are pure NumPy but import the removed old ``gym`` package and the
removed ``np.math`` alias — both shimmed here — and sample their resets
from the GLOBAL ``np.random`` (usv_asmc_env.py:260-279), so a fixed
``np.random.seed`` makes the reference reset deterministic. That reset
state is injected into our functional ``LegacyState`` and both sides are
driven through the same heading-offset action sequence, comparing the
6-dim observation, reward, and done flag per step.

The reference integrates the full Fossen dynamics (M/C/D assembly with a
matrix inverse per step) in mixed float64/float32 (several matrices are
explicitly float32 there); ours is float32 throughout. Measured max drift
over 150 steps is 4.5e-6 obs / 2.1e-6 reward across all six (env, seed)
runs; the 1e-4 gates are ~20x margin. This parity caught a real divergence
the golden tests missed: the ye-int env's distinct reward form.
"""

from __future__ import annotations

import math
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from usv_tpu.envs import make

_REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not _REF.exists(), reason="reference checkout not available"
)


def _install_stubs():
    """Old-``gym`` + ``np.math`` shims and the synthetic gym_usv package."""
    if not hasattr(np, "math"):
        np.math = math  # numpy<2 alias the reference relies on
    if "gym" not in sys.modules:
        gym = types.ModuleType("gym")

        class Env:
            pass

        class Box:
            def __init__(self, low=None, high=None, shape=None, dtype=None,
                         **kw):
                if shape is None and low is not None:
                    shape = np.asarray(low).shape
                self.shape = shape

        gym.Env = Env
        gym.error = types.ModuleType("gym.error")
        spaces = types.ModuleType("gym.spaces")
        spaces.Box = Box
        gym.spaces = spaces
        utils = types.ModuleType("gym.utils")
        utils.seeding = types.ModuleType("gym.utils.seeding")
        gym.utils = utils
        sys.modules["gym"] = gym
        sys.modules["gym.error"] = gym.error
        sys.modules["gym.spaces"] = spaces
        sys.modules["gym.utils"] = utils
        sys.modules["gym.utils.seeding"] = utils.seeding
    if "gym_usv" not in sys.modules:
        pkg = types.ModuleType("gym_usv")
        pkg.__path__ = [str(_REF / "gym_usv")]
        sys.modules["gym_usv"] = pkg
        envs = types.ModuleType("gym_usv.envs")
        envs.__path__ = [str(_REF / "gym_usv/envs")]
        sys.modules["gym_usv.envs"] = envs


_REF_MODULES = {
    "usv-asmc-v0": "usv_asmc_env.UsvAsmcEnv",
    "usv-pid-v0": "usv_pid_env.UsvPidEnv",
    "usv-asmc-ye-int-v0": "usv_asmc_ye_int_env.UsvAsmcYeIntEnv",
}


def _reference_env(env_id, seed):
    _install_stubs()
    import importlib

    mod_name, cls_name = _REF_MODULES[env_id].split(".")
    mod = importlib.import_module(f"gym_usv.envs.{mod_name}")
    env = getattr(mod, cls_name)()
    np.random.seed(seed)  # the legacy resets sample the global stream
    env.reset()
    return env


def _inject_state(handle, ref, ye_int_mode):
    state = handle.reset(handle.cfg, jax.random.key(0))
    last = np.asarray(ref.last, np.float32)
    aux = np.asarray(ref.aux_vars, np.float32)
    f32 = lambda v: jnp.asarray(np.float32(v))
    return state.replace(
        dyn=state.dyn.replace(
            pose=jnp.asarray(ref.position, jnp.float32),
            vel=jnp.asarray(ref.velocity, jnp.float32),
            eta_dot_last=jnp.asarray(last[0:3]),
            accel_last=jnp.asarray(last[3:6]),
        ),
        target=jnp.asarray(ref.target, jnp.float32),
        e_u_int=f32(aux[0]), ka_u=f32(aux[1]), ka_psi=f32(aux[2]),
        ka_dot_u_last=f32(last[7]), ka_dot_psi_last=f32(last[8]),
        action_last=f32(ref.state[5]),
        ye_int=f32(aux[3]) if ye_int_mode else f32(0.0),
        ye_last=f32(last[9]) if ye_int_mode else f32(0.0),
        state_vec=jnp.asarray(ref.state, jnp.float32),
    )


def _run_parity(env_id, seed, n_steps=150, obs_atol=1e-4, reward_atol=1e-4):
    ref = _reference_env(env_id, seed)
    handle = make(env_id)
    step = jax.jit(lambda s, a: handle.step(handle.cfg, s, a))
    state = _inject_state(handle, ref, ye_int_mode=env_id.endswith("ye-int-v0"))

    t = np.arange(n_steps)
    actions = (0.3 * np.sin(0.05 * t) + 0.2 * np.sin(0.013 * t + 0.7)).astype(
        np.float32
    )
    max_obs_err = max_rew_err = 0.0
    for i in range(n_steps):
        ref_obs, ref_rew, ref_done, _ = ref.step(float(actions[i]))
        state, ts = step(state, jnp.asarray(actions[i]))
        obs_err = float(np.max(np.abs(np.asarray(ts.obs) - ref_obs)))
        rew_err = abs(float(ts.reward) - float(ref_rew))
        max_obs_err = max(max_obs_err, obs_err)
        max_rew_err = max(max_rew_err, rew_err)
        assert obs_err < obs_atol, f"{env_id} step {i}: obs err {obs_err}"
        assert rew_err < reward_atol, f"{env_id} step {i}: reward err {rew_err}"
        assert bool(ts.terminated) == bool(ref_done), f"{env_id} step {i}: done"
        if ref_done:
            break
    return max_obs_err, max_rew_err


@pytest.mark.parametrize("env_id", sorted(_REF_MODULES))
def test_legacy_trajectory_parity(env_id):
    _run_parity(env_id, seed=11)


@pytest.mark.parametrize("env_id", sorted(_REF_MODULES))
def test_legacy_trajectory_parity_second_seed(env_id):
    _run_parity(env_id, seed=99)
