"""Throughput benchmark — the reference protocol at TPU batch width.

Protocol: zero-action steps of ``usv-simple`` (reference tools/profile_env.py:
1-8) at 4096 vmapped lockstep envs (BASELINE.json config 4), fully on-device
under lax.scan. Prints ONE JSON line.

Baseline: the reference publishes no numbers; the only measured figure is
270 env-steps/s for a single env in this sandbox (BASELINE.md — numba stubbed).
``vs_baseline`` is aggregate steps/s divided by that measured figure.
"""

import json
import sys
import time

NUM_ENVS = 4096
N_STEPS = 2048
BASELINE_STEPS_PER_S = 270.0  # measured reference, BASELINE.md row 3


def main():
    import jax

    from usv_tpu.envs import make
    from usv_tpu.vector import throughput

    handle = make("usv-simple")
    out = throughput(handle, num_envs=NUM_ENVS, n_steps=N_STEPS, repeats=3)
    result = {
        "metric": "usv-simple env-steps/s (4096 vmapped envs, zero-action protocol)",
        "value": round(out["steps_per_second"], 1),
        "unit": "env-steps/s",
        "vs_baseline": round(out["steps_per_second"] / BASELINE_STEPS_PER_S, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
