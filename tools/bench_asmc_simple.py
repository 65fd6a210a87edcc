"""Cost attribution + unroll A/B for the slowest family (usv-asmc-simple).

Measures, in ONE session (tunnel drift makes cross-session numbers soft):
  - usv-simple (same-session scale reference)
  - usv-asmc-simple, substep_unroll in {1, 4, 20} (flat 20-substep scan)
  - usv-asmc-simple with ignore_obstacles=True (sensor share)
  - usv-simple with ignore_obstacles=True (base-env-minus-sensor share)

Attribution: substep-scan cost = asmc(ignore) - simple(ignore);
sensor cost = asmc(default) - asmc(ignore). docs/PERFORMANCE.md section
"usv-asmc-simple attribution".

Usage: python tools/bench_asmc_simple.py [--envs 4096] [--steps 2048]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=4096)
    p.add_argument("--steps", type=int, default=2048)
    p.add_argument("--unrolls", type=int, nargs="*", default=[1, 4, 20])
    args = p.parse_args()

    from usv_tpu.envs import make
    from usv_tpu.vector import throughput

    def run(tag, **kw):
        env_id = "usv-simple" if tag.startswith("usv-simple") \
            else "usv-asmc-simple"
        out = throughput(
            make(env_id, **kw),
            num_envs=args.envs, n_steps=args.steps, repeats=3,
        )
        print(json.dumps({
            "config": tag,
            "ms_per_batched_step":
                round(1e3 * args.envs / out["steps_per_second"], 4),
            "steps_per_second": round(out["steps_per_second"], 1),
        }), flush=True)

    run("usv-simple")
    run("usv-simple ignore_obstacles", ignore_obstacles=True)
    for u in args.unrolls:
        run(f"usv-asmc-simple unroll={u}", substep_unroll=u)
    run("usv-asmc-simple ignore_obstacles", ignore_obstacles=True)


if __name__ == "__main__":
    main()
