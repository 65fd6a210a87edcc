from usv_tpu.envs.types import TimeStep
from usv_tpu.envs.registry import EnvHandle, make, register, registered_ids
from usv_tpu.envs.autoreset import make_autoreset_step
