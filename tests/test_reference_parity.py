"""Trajectory parity against the ACTUAL reference implementation.

The reference's pure-Python controller+dynamics (``gym_usv/control``) runs in
this sandbox (its C++/numba parts do not), so the strongest possible parity
evidence is direct: step the reference's own ``UsvAsmc``/``UsvPID`` next to
the JAX kernels from identical initial state and compare trajectories.
(The reference uses the removed ``np.math`` alias — shimmed before import.)
"""

import importlib.util
import math
import types
from pathlib import Path

import numpy as np
import pytest

np.math = math  # reference control/usv_asmc.py:72 uses the removed np.math

import jax
import jax.numpy as jnp

from usv_tpu.control.asmc import AsmcGains, asmc_compute, init_asmc_loop
from usv_tpu.control.pid import PidGains, PidLoopState, init_pid, pid_compute
from usv_tpu.physics.dynamics import init_dynamics
from usv_tpu.physics.params import VehicleParams

_REF = Path("/root/reference/gym_usv/control")


def _load_ref(name):
    """Load a reference controller module by file path WITHOUT executing the
    gym_usv package __init__ (which registers the reference's env ids with
    gymnasium and would shadow ours)."""
    spec = importlib.util.spec_from_file_location(f"_ref_{name}", _REF / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


if not _REF.exists():  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)

gym_usv_control = types.SimpleNamespace(
    UsvAsmc=_load_ref("usv_asmc").UsvAsmc,
    UsvPID=_load_ref("usv_pid").UsvPID,
)

VP = VehicleParams()


def test_asmc_matches_reference_trajectory():
    ref = gym_usv_control.UsvAsmc()
    ref_pos = np.zeros(3)
    ref_vel = np.zeros(3)

    loop = init_asmc_loop()
    action = jnp.asarray([1.5, 0.3], jnp.float32)
    run = jax.jit(lambda l: asmc_compute(AsmcGains(), VP, l, action)[0])

    for i in range(100):  # 100 compute calls = 1000 substeps = 10 s sim
        ref_pos, ref_vel, _ = ref.compute(
            np.array([1.5, 0.3]), ref_pos, ref_vel, do_perturb=False
        )
        loop = run(loop)

    np.testing.assert_allclose(
        np.asarray(loop.dyn.pose), np.asarray(ref_pos), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(loop.dyn.vel), np.asarray(ref_vel), rtol=2e-3, atol=2e-3
    )


def test_asmc_matches_reference_with_perturbation():
    ref = gym_usv_control.UsvAsmc()
    ref_pos = np.zeros(3)
    ref_vel = np.zeros(3)
    loop = init_asmc_loop()
    action = jnp.asarray([1.0, 0.0], jnp.float32)
    run = jax.jit(
        lambda l: asmc_compute(AsmcGains(), VP, l, action, do_perturb=True)[0]
    )
    for i in range(50):
        ref_pos, ref_vel, _ = ref.compute(
            np.array([1.0, 0.0]), ref_pos, ref_vel, do_perturb=True
        )
        loop = run(loop)
    np.testing.assert_allclose(
        np.asarray(loop.dyn.pose), np.asarray(ref_pos), rtol=5e-3, atol=5e-3
    )


def test_asmc_reference_controller_internals():
    # After a rollout the adaptive-gain state must match the reference's
    # aux_vars = [e_u_int, ka_u, ka_psi] (control/usv_asmc.py:242).
    ref = gym_usv_control.UsvAsmc()
    ref_pos = np.zeros(3)
    ref_vel = np.zeros(3)
    loop = init_asmc_loop()
    action = jnp.asarray([2.0, -0.4], jnp.float32)
    run = jax.jit(lambda l: asmc_compute(AsmcGains(), VP, l, action)[0])
    for i in range(30):
        ref_pos, ref_vel, _ = ref.compute(
            np.array([2.0, -0.4]), ref_pos, ref_vel, do_perturb=False
        )
        loop = run(loop)
    e_u_int, ka_u, ka_psi = ref.aux_vars
    np.testing.assert_allclose(float(loop.ctrl.e_u_int), e_u_int, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(float(loop.ctrl.ka_u), ka_u, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(float(loop.ctrl.ka_psi), ka_psi, rtol=2e-3, atol=1e-4)


def test_pid_matches_reference_trajectory():
    ref = gym_usv_control.UsvPID()
    ref_pos = np.zeros(3)
    ref_vel = np.zeros(3)
    loop = PidLoopState(
        ctrl=init_pid(), dyn=init_dynamics(),
        perturb_step=jnp.zeros((), jnp.int32),
    )
    action = jnp.asarray([1.0, 0.2], jnp.float32)
    run = jax.jit(lambda l: pid_compute(PidGains(), VP, l, action)[0])
    for i in range(100):
        ref_pos, ref_vel, _ = ref.compute(
            np.array([1.0, 0.2]), ref_pos, ref_vel, do_perturb=False
        )
        loop = run(loop)
    np.testing.assert_allclose(
        np.asarray(loop.dyn.pose), np.asarray(ref_pos), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(loop.dyn.vel), np.asarray(ref_vel), rtol=2e-3, atol=2e-3
    )


def test_reference_test_suite_properties_hold():
    """The reference's own test intents (tests/test_usv_asmc.py:6-37), run
    against OUR kernels with the fixed signature."""
    # no movement
    loop = init_asmc_loop()
    run0 = jax.jit(lambda l: asmc_compute(AsmcGains(), VP, l, jnp.zeros(2))[0])
    for _ in range(100):
        loop = run0(loop)
    assert np.allclose(np.asarray(loop.dyn.pose), 0, atol=1e-4)
