"""Throughput microbench — direct equivalent of reference tools/profile_env.py.

10,000 zero-action steps of ``usv-simple``; here both the reference's
single-env protocol and the batched variant are reported.

Usage: python tools/profile_env.py [--envs N] [--steps N]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=1)
    p.add_argument("--steps", type=int, default=10_000)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    from usv_tpu.envs import make
    from usv_tpu.vector import throughput

    handle = make("usv-simple")
    out = throughput(
        handle, num_envs=args.envs, n_steps=args.steps, repeats=args.repeats
    )
    print(json.dumps({"num_envs": args.envs, **out}))


if __name__ == "__main__":
    main()
