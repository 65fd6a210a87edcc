"""Multi-invocation band study of ``--recipe robust`` for EITHER learner.

VERDICT r4 next-#3 (SAC robust band + budget curve) and next-#7 (CA robust
to 5 invocations + the arrivals/collisions trade): run N invocations of
``run_{sac,ppo} --recipe robust`` with disjoint base seeds, re-evaluate
every exported winner bundle with the standard protocol across
``--eval-seeds`` keys, and write per-invocation walls, eval stats (ALL
scalar stats — arrivals AND collisions on the CA env), and the exported
per-candidate selection tables (for the trade curve) to ``--artifact``.

Usage (TPU, run alone — one TPU process at a time):
    python tools/study_robust_band.py --learner sac --invocations 3 \
        --total-steps 400e6 --artifact docs/artifacts/sac_robust_study_r5.json
    python tools/study_robust_band.py --learner ppo --env usv-asmc-ca-v0 \
        --best-metric arrivals --eval-steps 5000 --total-steps 200e6 \
        --invocations 2 --base-seed-start 8300 \
        --artifact docs/artifacts/ppo_ca_robust_r5_ext.json
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--learner", choices=["sac", "ppo"], required=True)
    p.add_argument("--env", default="usv-simple")
    p.add_argument("--invocations", type=int, default=3)
    p.add_argument("--total-steps", type=float, default=400e6)
    p.add_argument("--base-seed-start", type=int, default=9000,
                   help="invocation i uses base seed start + 100*i "
                        "(populations of 4 consume base..base+3 — disjoint)")
    p.add_argument("--best-metric", choices=["reward", "arrivals"],
                   default="reward")
    p.add_argument("--eval-steps", type=int, default=1000)
    p.add_argument("--eval-episodes", type=int, default=16)
    p.add_argument("--eval-seeds", type=int, default=3)
    p.add_argument("--train-arg", action="append", default=[])
    p.add_argument("--outdir", default="runs/robust_band_r5")
    p.add_argument("--artifact", required=True)
    args = p.parse_args()

    if args.learner == "sac":
        from usv_tpu.train import run_sac as runner
    else:
        from usv_tpu.train import run_ppo as runner
    from usv_tpu.train.evaluate import bundle_eval

    score_key = (
        "arrival_rate" if args.best_metric == "arrivals" else "reward_per_step"
    )
    invocations = []
    for i in range(args.invocations):
        base = args.base_seed_start + 100 * i
        logdir = f"{args.outdir}/{args.learner}_{args.env}_b{base}"
        t0 = time.time()
        runner.main([
            "--recipe", "robust",
            "--env", args.env,
            "--total-steps", str(args.total_steps),
            "--seed", str(base),
            "--best-metric", args.best_metric,
            "--eval-steps", str(args.eval_steps),
            "--logdir", logdir,
        ] + args.train_arg)
        wall = time.time() - t0

        bundle = Path(logdir) / "policy_best"
        meta = json.loads((bundle / "policy.json").read_text())
        pop = meta.get("population", {})
        evals = [
            bundle_eval(args.env, str(bundle), best_metric=args.best_metric,
                        steps=args.eval_steps, episodes=args.eval_episodes,
                        seed=es)
            for es in range(args.eval_seeds)
        ]
        rec = dict(
            base_seed=base,
            winner_seed=pop.get("winner_seed"),
            wall_seconds=round(wall, 1),
            evals=[{k: round(v, 4) for k, v in e.items()} for e in evals],
            selection=pop.get("selection"),
        )
        for k in evals[0]:
            rec[f"{k}_mean"] = round(
                float(np.mean([e[k] for e in evals])), 4)
        invocations.append(rec)
        print(json.dumps({k: v for k, v in rec.items() if k != "selection"}),
              flush=True)

    key = f"{score_key}_mean"
    means = [r[key] for r in invocations]
    out = dict(
        command=(f"run_{args.learner} --recipe robust --env {args.env} "
                 f"--total-steps {args.total_steps:g} --seed <base> "
                 f"--best-metric {args.best_metric} "
                 f"--eval-steps {args.eval_steps} "
                 + " ".join(args.train_arg)),
        env=args.env,
        learner=args.learner,
        total_steps_per_seed=args.total_steps,
        invocations=invocations,
        score_key=score_key,
        mean=round(float(np.mean(means)), 4),
        std=round(float(np.std(means, ddof=1)) if len(means) > 1 else 0.0, 4),
        floor=round(min(means), 4),
        max_wall_seconds=max(r["wall_seconds"] for r in invocations),
        protocol=(f"winner bundle via evaluate.bundle_eval, "
                  f"{args.eval_episodes} envs x {args.eval_steps} "
                  f"deterministic steps, {args.eval_seeds} eval seeds"),
    )
    Path(args.artifact).write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {args.artifact}: {key} mean {out['mean']} ± {out['std']} "
          f"floor {out['floor']}")


if __name__ == "__main__":
    main()
