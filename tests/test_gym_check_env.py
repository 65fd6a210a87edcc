"""Official gymnasium API-contract validation of the adapter classes."""

import os

import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

from gymnasium.utils.env_checker import check_env

from usv_tpu.compat import (
    UsvAsmcCaEnv,
    UsvCurvedAitsmcEnv,
    UsvSimpleAITSMCEnv,
    UsvSimpleASMCEnv,
    UsvSimpleEnv,
)


@pytest.mark.parametrize(
    "cls",
    [UsvSimpleEnv, UsvSimpleASMCEnv, UsvSimpleAITSMCEnv, UsvAsmcCaEnv,
     UsvCurvedAitsmcEnv],
)
def test_check_env(cls):
    env = cls(render_mode="rgb_array")
    try:
        check_env(env, skip_render_check=True)
    finally:
        env.close()
