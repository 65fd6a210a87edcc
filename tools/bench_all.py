"""Throughput for every env family — regenerates the docs/PERFORMANCE.md table.

Usage: python tools/bench_all.py [--envs 4096] [--steps 2048] [--out FILE]
Prints one JSON line per family (plus a closing summary line). With
``--out`` (or ``--round N``) the sweep is also written as a JSON artifact —
all families measured in ONE dispatch session, so round-over-round
comparisons are free of the cross-session tunnel drift (±25%) documented in
docs/PERFORMANCE.md. Per-round artifacts live in
``docs/artifacts/bench_families_rNN.json`` (VERDICT r2 next-#7).
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
    p.add_argument("--out", default=None,
                   help="write the sweep as a JSON artifact to this path")
    p.add_argument("--round", type=int, default=None,
                   help="shorthand: write docs/artifacts/bench_families_r<NN>.json")
    args = p.parse_args()

    out_path = args.out
    if out_path is None and args.round is not None:
        out_path = str(
            Path(__file__).resolve().parent.parent
            / "docs" / "artifacts" / f"bench_families_r{args.round:02d}.json"
        )

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

    summary = {
        "num_envs": args.envs,
        "steps": args.steps,
        "protocol": "rollout_scan, obs/reward/done alive, best of 3, "
                    "same-session single dispatch stream",
        "families": results,
    }
    print(json.dumps(summary))
    if out_path:
        import platform
        import subprocess
        import time

        summary["recorded_unix"] = int(time.time())
        summary["host"] = platform.node()
        try:
            rev = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, check=True,
                cwd=Path(__file__).resolve().parent,
            )
            summary["git"] = rev.stdout.strip()
        except (OSError, subprocess.CalledProcessError):
            pass  # omit provenance rather than record an empty string
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        Path(out_path).write_text(json.dumps(summary, indent=1))
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
