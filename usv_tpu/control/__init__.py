from usv_tpu.control.asmc import (
    AsmcGains,
    AsmcState,
    init_asmc,
    asmc_control,
    asmc_compute,
)
from usv_tpu.control.pid import (
    PidGains,
    PidState,
    init_pid,
    pid_control,
    pid_compute,
)
from usv_tpu.control.aitsmc import (
    AitsmcGains,
    AitsmcLoopState,
    AitsmcState,
    AitsmcSetpoint,
    init_aitsmc,
    aitsmc_control,
    aitsmc_compute,
)
from usv_tpu.control.runner import run_controller_and_model
