from usv_tpu.compat.gym_adapter import (
    GymUsvEnv,
    UsvSimpleEnv,
    UsvSimpleASMCEnv,
    UsvSimpleAITSMCEnv,
    UsvAsmcCaEnv,
    UsvAsmcEnv,
    UsvPidEnv,
    UsvAsmcYeIntEnv,
    UsvCurvedAitsmcEnv,
    register_gymnasium_envs,
)
from usv_tpu.compat.vector_env import UsvVectorEnv
