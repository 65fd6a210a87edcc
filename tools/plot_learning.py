"""Plot learning curves from one or more training runs' metrics.jsonl.

The reference's equivalent is the wandb dashboard; here runs log JSONL
(usv_tpu/train/metrics.py) and this renders them side by side.

Usage:
    python tools/plot_learning.py runs/sac_a runs/sac_b \
        --metric eval_reward_per_step --out docs/artifacts/compare.png
Labels default to the run directory names.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json


def load_metric(run_dir: Path, metric: str, x_key: str = "env_steps"):
    xs, ys = [], []
    with open(run_dir / "metrics.jsonl") as f:
        for line in f:
            row = json.loads(line)
            if metric in row:
                xs.append(row.get(x_key, row.get("step", 0)))
                ys.append(row[metric])
    return xs, ys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+", help="run directories with metrics.jsonl")
    p.add_argument("--metric", default="eval_reward_per_step")
    p.add_argument("--x", default="env_steps", choices=["env_steps", "wall_s"],
                   help="x axis: env steps or wall-clock seconds since start")
    p.add_argument("--labels", nargs="*", default=None)
    p.add_argument("--out", default=None, help="output png (default: show)")
    p.add_argument("--title", default=None)
    args = p.parse_args()

    import matplotlib

    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = args.labels or [Path(r).name for r in args.runs]
    if len(labels) != len(args.runs):
        p.error(f"--labels got {len(labels)} labels for {len(args.runs)} runs")
    fig, ax = plt.subplots(figsize=(8, 5))
    for run, label in zip(args.runs, labels):
        xs, ys = load_metric(Path(run), args.metric, args.x)
        if not xs:
            print(f"warning: no '{args.metric}' rows in {run}", flush=True)
            continue
        ax.plot(xs, ys, marker="o", markersize=3, label=label)
    ax.set_xlabel("wall-clock seconds" if args.x == "wall_s" else "env steps")
    ax.set_ylabel(args.metric)
    ax.set_title(args.title or args.metric)
    ax.grid(alpha=0.3)
    ax.legend()
    fig.tight_layout()
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(args.out, dpi=110)
        print(f"wrote {args.out}", flush=True)
    else:
        plt.show()


if __name__ == "__main__":
    main()
