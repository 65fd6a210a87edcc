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


def install_usv_libs_py():
    """Place a native-oracle-backed ``usv_libs_py`` in ``sys.modules`` so
    reference-era scripts (`import usv_libs_py`) run unmodified — see
    usv_tpu/compat/usv_libs_stub.py and docs/MIGRATION.md. Imported lazily:
    the stub needs the compiled C++ oracle (g++ on first use)."""
    from usv_tpu.compat import usv_libs_stub

    return usv_libs_stub.install()
