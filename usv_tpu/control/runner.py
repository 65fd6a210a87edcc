"""Generic controller+model substep driver.

TPU-native equivalent of the C++ ``usv_libs_py.utils.update_controller_and_model_n``
(call site: reference ``usv_asmc_ca_env.py:199``): run N substeps of
{controller -> dynamics integrate} under ``lax.scan`` and return both the final
state and the full per-substep history (the analog of the reference's
``model_history`` / ``controller_history`` lists, but as fixed-shape stacked
pytrees that never leave the device).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax

from usv_tpu.physics.dynamics import DynamicsState, dynamics_step
from usv_tpu.physics.params import VehicleParams

# control_fn(ctrl_state, dyn_state) -> (ctrl_state, tport, tstbd, debug)
ControlFn = Callable[[Any, DynamicsState], Tuple[Any, Any, Any, Any]]


def run_controller_and_model(
    control_fn: ControlFn,
    vparams: VehicleParams,
    ctrl_state,
    dyn_state: DynamicsState,
    n_substeps: int,
    dt: float = 0.01,
):
    """Returns (ctrl_state, dyn_state, model_history, controller_history)."""

    def substep(carry, _):
        ctrl, dyn = carry
        ctrl, tport, tstbd, debug = control_fn(ctrl, dyn)
        dyn = dynamics_step(vparams, dyn, tport, tstbd, dt)
        model_hist = {"pose": dyn.pose, "vel": dyn.vel}
        return (ctrl, dyn), (model_hist, debug)

    (ctrl_state, dyn_state), (model_history, controller_history) = jax.lax.scan(
        substep, (ctrl_state, dyn_state), None, length=n_substeps
    )
    return ctrl_state, dyn_state, model_history, controller_history
