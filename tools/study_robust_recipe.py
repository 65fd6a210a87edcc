"""Validation study of ``--recipe robust`` (VERDICT r3 next-#1).

Done-criterion: one CLI command whose exported bundle matches or beats the
manual best-of-5 (>= 1.55 mean-equivalent) with a measured floor >= 1.3
across 5 invocations, at wall-clock <= a single-seed round-1-recipe run.

This driver:
1. (optional, ``--baseline``) times ONE single-seed round-1-recipe run
   (256 envs, batch 2048, k1, per-epoch reshuffle, lr anneal — the recipe
   behind the 1.57 +- 0.23 / floor 1.31 reference band) in the same session;
2. runs N invocations of ``--recipe robust`` with disjoint base seeds;
3. re-evaluates every exported winner bundle with the standard protocol
   (16 envs x 1000 deterministic steps x 3 eval seeds, the same
   ``evaluate.batch_policy_metrics`` the other studies quote);
4. writes per-invocation walls + evals and the mean/floor summary to
   ``--artifact``.

Usage (TPU, run alone):
    python tools/study_robust_recipe.py --invocations 5 --baseline \
        --artifact docs/artifacts/robust_recipe_study_r4.json
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--invocations", type=int, default=5)
    p.add_argument("--env", default="usv-simple")
    p.add_argument("--total-steps", type=float, default=100e6)
    p.add_argument("--population", type=int, default=4)
    p.add_argument("--cull-at-frac", type=float, default=0.0)
    p.add_argument("--cull-keep", type=int, default=None)
    p.add_argument("--baseline", action="store_true",
                   help="also time one single-seed round-1-recipe run "
                        "(the wall-clock budget the robust runs must meet)")
    p.add_argument("--outdir", default="runs/r4_robust_study")
    p.add_argument("--artifact",
                   default="docs/artifacts/robust_recipe_study_r4.json")
    args = p.parse_args()

    from usv_tpu.train import run_ppo
    from usv_tpu.train.evaluate import bundle_eval as _bundle_eval

    def bundle_eval(env_id, policy_dir, seed=0):
        return _bundle_eval(env_id, policy_dir, steps=1000, episodes=16,
                            seed=seed)["reward_per_step"]

    out = dict(env=args.env, total_steps=args.total_steps,
               population=args.population,
               cull_at_frac=args.cull_at_frac, cull_keep=args.cull_keep)

    if args.baseline:
        logdir = f"{args.outdir}/baseline_round1"
        t0 = time.time()
        run_ppo.main([
            "--recipe", "at-scale", "--update-fusion", "1",
            "--no-single-shuffle",
            "--env", args.env, "--total-steps", str(args.total_steps),
            "--seed", "0", "--logdir", logdir,
            "--checkpoint-every-iters", "0", "--video-every-iters", "0",
        ])
        base_wall = time.time() - t0
        base_evals = [
            bundle_eval(args.env, f"{logdir}/policy_best", seed=es)
            for es in range(3)
        ]
        out["baseline"] = dict(
            recipe="round-1 (256 envs, batch 2048, k1, reshuffle, anneal)",
            wall_seconds=round(base_wall, 1),
            bundle_evals=[round(e, 3) for e in base_evals],
            bundle_eval_mean=round(sum(base_evals) / 3, 3),
        )
        print(json.dumps(out["baseline"]), flush=True)

    runs = []
    for inv in range(args.invocations):
        base_seed = 1000 * (inv + 1)  # disjoint from every study so far
        logdir = f"{args.outdir}/inv{inv}"
        cmd = [
            "--recipe", "robust", "--env", args.env,
            "--population", str(args.population),
            "--total-steps", str(args.total_steps),
            "--seed", str(base_seed), "--logdir", logdir,
            "--checkpoint-every-iters", "0", "--video-every-iters", "0",
        ]
        if args.cull_at_frac:
            cmd += ["--cull-at-frac", str(args.cull_at_frac)]
            if args.cull_keep:
                cmd += ["--cull-keep", str(args.cull_keep)]
        t0 = time.time()
        run_ppo.main(cmd)
        wall = time.time() - t0
        bundle = f"{logdir}/policy_best"
        meta = json.loads(Path(bundle, "policy.json").read_text())
        evals = [bundle_eval(args.env, bundle, seed=es) for es in range(3)]
        rec = dict(
            invocation=inv, base_seed=base_seed,
            wall_seconds=round(wall, 1),
            winner_seed=meta["population"]["winner_seed"],
            selection=[
                {k: (round(v, 3) if isinstance(v, float) else v)
                 for k, v in s.items()}
                for s in meta["population"]["selection"]
            ],
            bundle_evals=[round(e, 3) for e in evals],
            bundle_eval_mean=round(sum(evals) / 3, 3),
        )
        runs.append(rec)
        print(json.dumps(rec), flush=True)

    means = [r["bundle_eval_mean"] for r in runs]
    mu = sum(means) / len(means)
    sd = (sum((m - mu) ** 2 for m in means) / max(1, len(means) - 1)) ** 0.5
    out.update(
        invocations=runs,
        mean=round(mu, 3),
        std=round(sd, 3),
        floor=round(min(means), 3),
        max_wall_seconds=round(max(r["wall_seconds"] for r in runs), 1),
        protocol="winner bundle, 16 envs x 1000 deterministic steps, "
                 "mean over 3 eval seeds",
    )
    print(json.dumps({k: v for k, v in out.items() if k != "invocations"}),
          flush=True)
    Path(args.artifact).parent.mkdir(parents=True, exist_ok=True)
    Path(args.artifact).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.artifact}")


if __name__ == "__main__":
    main()
