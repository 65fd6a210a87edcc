"""Throughput for every env family — regenerates the docs/PERFORMANCE.md table.

Usage: python tools/bench_all.py [--envs 4096] [--steps 256]
Prints one JSON line per family (plus a closing summary line).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=4096)
    p.add_argument("--steps", type=int, default=2048)  # amortize tunnel dispatch
    p.add_argument("--families", nargs="*", default=None)
    args = p.parse_args()

    from usv_tpu.envs import registered_ids, make
    from usv_tpu.vector import throughput

    results = []
    for env_id in args.families or sorted(registered_ids()):
        # the shared protocol path (rollout_scan): obs assembly, reward
        # and done consumption are all forced alive — see the
        # dead-tuple-elimination warning in docs/PERFORMANCE.md
        out = throughput(
            make(env_id), num_envs=args.envs, n_steps=args.steps, repeats=3
        )
        rec = dict(
            env=env_id,
            ms_per_step=round(1e3 * args.envs / out["steps_per_second"], 3),
            steps_per_second=round(out["steps_per_second"]),
        )
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print(json.dumps({"num_envs": args.envs, "families": results}))


if __name__ == "__main__":
    main()
