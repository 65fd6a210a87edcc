from usv_tpu.physics.params import VehicleParams
from usv_tpu.physics.dynamics import (
    DynamicsState,
    init_dynamics,
    hydrodynamic_coefficients,
    fossen_acceleration,
    thruster_allocation,
    dynamics_step,
    perturbation_force,
)
