"""Multi-seed quality study of a PPO recipe on any env family.

VERDICT r2 next-#6 introduced this driver for the usv-simple at-scale (k4)
claim; VERDICT r3 next-#6 generalizes it to the CA family: ``--env
usv-asmc-ca-v0 --best-metric arrivals --eval-steps 5000`` runs >= 5 seeds of
the recipe end to end on the TPU, re-evaluates each exported ``policy_best``
bundle with the standard deterministic protocol (``--eval-episodes`` envs x
``--eval-steps`` steps via the shared ``evaluate.batch_policy_metrics``),
and writes the per-seed and mean +- std numbers (reward/step, or
arrival/collision rates for ``--best-metric arrivals``) to ``--artifact``.

Usage:
    python tools/study_ppo_k4_seeds.py [--seeds 5] [--total-steps 100e6]
    python tools/study_ppo_k4_seeds.py --env usv-asmc-ca-v0 \
        --best-metric arrivals --eval-steps 5000 --total-steps 200e6 \
        --artifact docs/artifacts/ppo_ca_at_scale_seed_study_r4.json

(~2-4 min/seed on a v5e chip; run alone — one TPU process at a time.)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--seed-offset", type=int, default=0,
                   help="first seed (extend an existing study without "
                        "re-running its seeds)")
    p.add_argument("--total-steps", type=float, default=100e6)
    p.add_argument("--env", default="usv-simple")
    p.add_argument("--recipe", default="at-scale")
    p.add_argument("--best-metric", choices=["reward", "arrivals"],
                   default="reward")
    p.add_argument("--eval-steps", type=int, default=1000,
                   help="bundle re-eval rollout length (CA episodes run to "
                        "5000 steps — size accordingly)")
    p.add_argument("--eval-episodes", type=int, default=16)
    p.add_argument("--eval-seeds", type=int, default=3,
                   help="re-eval each bundle across this many eval seeds")
    p.add_argument("--train-arg", action="append", default=[],
                   help="extra run_ppo flag, repeatable (e.g. "
                        "--train-arg=--shuffle-groups --train-arg=8 to "
                        "study the pod sampling restriction on one chip)")
    p.add_argument("--outdir", default="runs/ppo_seed_study")
    p.add_argument("--artifact",
                   # deliberately NOT a committed docs/artifacts/ name: a
                   # default invocation must never clobber a quoted artifact
                   default=None)
    args = p.parse_args()
    if args.artifact is None:
        # offset runs get their own default so an extension never
        # silently overwrites the base study's summary
        suffix = f"_offset{args.seed_offset}" if args.seed_offset else ""
        args.artifact = f"runs/ppo_seed_study/summary{suffix}.json"

    from usv_tpu.train import run_ppo

    score_key = (
        "arrival_rate" if args.best_metric == "arrivals" else "reward_per_step"
    )
    results = []
    for seed in range(args.seed_offset, args.seed_offset + args.seeds):
        logdir = f"{args.outdir}/seed{seed}"
        t0 = time.time()
        run_ppo.main([
            "--recipe", args.recipe,
            "--env", args.env,
            "--total-steps", str(args.total_steps),
            "--seed", str(seed),
            "--best-metric", args.best_metric,
            "--eval-steps", str(args.eval_steps),
            "--logdir", logdir,
            "--checkpoint-every-iters", "0",
            "--video-every-iters", "0",
        ] + args.train_arg)
        train_s = time.time() - t0
        bundle = f"{logdir}/policy_best"
        if not Path(bundle, "policy.json").exists():
            # short smoke runs may end before the first in-run eval fires
            bundle = f"{logdir}/policy"
        from usv_tpu.train.evaluate import bundle_eval

        evals = [
            bundle_eval(args.env, bundle, best_metric=args.best_metric,
                        steps=args.eval_steps, episodes=args.eval_episodes,
                        seed=es)
            for es in range(args.eval_seeds)
        ]
        rec = dict(
            seed=seed,
            train_seconds=round(train_s, 1),
            evals=[{k: round(v, 4) for k, v in e.items()} for e in evals],
        )
        for k in evals[0]:
            rec[f"{k}_mean"] = round(sum(e[k] for e in evals) / len(evals), 4)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    means = [r[f"{score_key}_mean"] for r in results]
    mu = sum(means) / len(means)
    sd = (sum((m - mu) ** 2 for m in means) / max(1, len(means) - 1)) ** 0.5
    summary = dict(
        recipe=args.recipe,
        train_arg=args.train_arg,
        env=args.env,
        best_metric=args.best_metric,
        total_steps=args.total_steps,
        seeds=args.seeds,
        seed_offset=args.seed_offset,
        seed_range=f"{args.seed_offset}..{args.seed_offset + args.seeds - 1}",
        note=("EXTENSION artifact: mean/std/floor cover ONLY this seed "
              "range — combine per_seed with the base artifact before "
              "quoting study-level statistics"
              if args.seed_offset else None),
        per_seed=results,
        score_key=score_key,
        mean=round(mu, 4),
        std=round(sd, 4),
        floor=round(min(means), 4),
        protocol=f"best-eval export bundle, {args.eval_episodes} envs x "
                 f"{args.eval_steps} deterministic steps, mean over "
                 f"{args.eval_seeds} eval seeds",
    )
    print(json.dumps(summary), flush=True)
    Path(args.artifact).parent.mkdir(parents=True, exist_ok=True)
    Path(args.artifact).write_text(json.dumps(summary, indent=1))
    print(f"wrote {args.artifact}")


if __name__ == "__main__":
    main()
