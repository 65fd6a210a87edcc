"""Device profiling: capture a jax.profiler trace of the hot paths.

The aux-subsystem upgrade over the reference's profile_env.py (SURVEY.md §5
— it had no tracer). Produces a TensorBoard-loadable trace directory plus the
throughput line.

Usage: python tools/profile_trace.py --envs 4096 --steps 512 --out /tmp/trace
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=4096)
    p.add_argument("--steps", type=int, default=512)
    p.add_argument("--env", default="usv-simple")
    p.add_argument("--out", default="/tmp/usv_tpu_trace")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (fast local iteration; the "
                        "env-var override does not work in this sandbox)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from usv_tpu.envs import make
    from usv_tpu.vector.rollout import rollout_scan

    handle = make(args.env)
    run = rollout_scan(handle, args.envs, args.steps)
    # compile outside the trace; sync via the reward_sum scalar
    # (run() returns (state, obs, reward_sum, done_count))
    float(run(jax.random.key(0))[2])

    with jax.profiler.trace(args.out):
        out = run(jax.random.key(1))
        float(out[2])

    print(json.dumps({"trace_dir": args.out, "envs": args.envs, "steps": args.steps}))
    print("load with: tensorboard --logdir", args.out)


if __name__ == "__main__":
    main()
