"""Seed-parallel population training demo (SAC or PPO).

Trains S independent learners (distinct seeds) in ONE device program per
block and prints per-seed eval rewards — the TPU-native answer to "train 8
seeds and report mean +/- std" (the reference trains one SB3 model per
process). Each seed's best-evaluating policy is tracked on the host, so a
seed-fragile setup (e.g. at-scale PPO, where some seeds plateau and
constant-lr seeds collapse late — docs/PERFORMANCE.md "At-scale PPO
quality") yields its best policy rather than its last one; pass
``--export-best DIR`` to save the best policy across all seeds as a
standalone bundle.

Usage:
    python examples/population_sweep.py --seeds 4 --total-steps 1000000
    python examples/population_sweep.py --algo ppo --seeds 4 \
        --num-envs 128 --total-steps 24e6 --export-best runs/pop_best
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="usv-simple")
    p.add_argument("--algo", choices=["sac", "ppo"], default="sac")
    p.add_argument("--seeds", type=int, default=4)
    p.add_argument("--total-steps", type=float, default=1e6,
                   help="env steps per seed")
    p.add_argument("--num-envs", type=int, default=256, help="envs per seed")
    p.add_argument("--buffer-size", type=int, default=50_000,
                   help="replay capacity per seed (SAC)")
    p.add_argument("--learning-starts", type=int, default=20_000)
    p.add_argument("--rounds-per-block", type=int, default=100,
                   help="SAC train rounds (or PPO iterations) per eval block")
    p.add_argument("--batch-size", type=int, default=2048,
                   help="PPO minibatch size (per seed)")
    p.add_argument("--n-steps", type=int, default=2048,
                   help="PPO rollout horizon per env (per seed); the rollout "
                        "buffer is seeds x n_steps x num_envs — size it to HBM")
    p.add_argument("--lr-decay-updates", type=int, default=0,
                   help="PPO linear lr anneal over this many gradient "
                        "updates (0 = constant)")
    p.add_argument("--export-best", default=None,
                   help="export the best policy across all seeds to this dir")
    args = p.parse_args()

    import jax
    import numpy as np

    from usv_tpu.envs import make

    handle = make(args.env)
    if args.algo == "sac":
        from usv_tpu.train.sac import SacConfig, SacLearner

        cfg = SacConfig(
            num_envs=args.num_envs,
            buffer_size=args.buffer_size,
            learning_starts=args.learning_starts,
            learning_rate=3e-4,
            # partial fusion keeps sample efficiency (full fusion collapses
            # it — docs/PERFORMANCE.md "Fusion vs sample efficiency")
            gradient_steps=64,
            update_fusion=8,
        )
        learner = SacLearner(handle, cfg)
        steps_per_block = args.rounds_per_block * cfg.train_freq * cfg.num_envs

        def train_block(ts):
            ts, _ = learner.train_rounds_many(ts, args.rounds_per_block)
            return ts

        def params_of(ts):
            return ts.actor_params
    else:
        from usv_tpu.train.ppo import PpoConfig, PpoLearner

        cfg = PpoConfig(
            num_envs=args.num_envs,
            n_steps=args.n_steps,
            batch_size=args.batch_size,
            lr_decay_updates=args.lr_decay_updates or None,
        )
        learner = PpoLearner(handle, cfg)
        steps_per_block = args.rounds_per_block * cfg.n_steps * cfg.num_envs

        def train_block(ts):
            for _ in range(args.rounds_per_block):
                ts, _ = learner.train_iteration_many(ts)
            return ts

        def params_of(ts):
            return ts.params

    ts = learner.init_many(list(range(args.seeds)))

    best_eval = np.full(args.seeds, -np.inf)
    best_params = [None] * args.seeds
    done_steps = 0
    t0 = time.time()
    while done_steps < args.total_steps:
        ts = train_block(ts)
        done_steps += steps_per_block
        evals = learner.eval_policy_many(ts, n_steps=200, num_envs=8)
        for i, e in enumerate(np.asarray(evals)):
            if e > best_eval[i]:
                best_eval[i] = e
                best_params[i] = jax.device_get(
                    jax.tree.map(lambda x: x[i], params_of(ts))
                )
        rate = args.seeds * done_steps / max(1e-9, time.time() - t0)
        print(
            f"steps/seed {done_steps:>9,}  aggregate {rate/1e6:5.2f}M steps/s  "
            f"eval per seed {[round(float(e), 3) for e in evals]}  "
            f"mean {np.mean(evals):.3f} +/- {np.std(evals):.3f}",
            flush=True,
        )

    print(
        f"best per seed {[round(float(e), 3) for e in best_eval]}  "
        f"best overall {best_eval.max():.3f} (seed {int(best_eval.argmax())})",
        flush=True,
    )
    if args.export_best:
        from usv_tpu.train.policy import export_policy

        i = int(best_eval.argmax())
        if best_params[i] is None:
            # no seed ever recorded a finite eval (diverged to NaN, or a
            # zero-round run) — don't substitute None into the train state
            print(
                "no finite eval recorded on any seed; skipping --export-best",
                flush=True,
            )
            return
        if args.algo == "sac":
            one = ts.replace(actor_params=best_params[i])
        else:
            one = ts.replace(params=best_params[i])
        path = export_policy(learner, one, args.export_best)
        print(f"exported best policy (seed {i}) to {path}", flush=True)


if __name__ == "__main__":
    main()
