"""Throughput benchmark — the reference protocol at TPU batch width.

Protocol: zero-action steps of ``usv-simple`` (reference tools/profile_env.py:
1-8) at 4096 vmapped lockstep envs (BASELINE.json config 4), fully on-device
under lax.scan. Prints ONE JSON line.

Baseline: the reference publishes no numbers. Measured in this sandbox: 270
env-steps/s single-env with numba unavailable (raycast interpreted);
BASELINE.md row 5 estimates 2,000-10,000 steps/s with numba active.
``vs_baseline`` divides by the TOP of that estimate (10k) — the honest,
conservative factor (the raw numba-stubbed measurement would inflate it 37x).
"""

import json
import sys
import time

NUM_ENVS = 4096
N_STEPS = 2048
# top of the numba-active estimate (BASELINE.md row 5), NOT the 270
# numba-stubbed measurement — conservative on purpose
BASELINE_STEPS_PER_S = 10_000.0


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
