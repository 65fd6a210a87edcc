"""Seed-parallel population training demo.

Trains S independent SAC learners (distinct seeds) in ONE device program
per block and prints per-seed eval rewards — the TPU-native answer to
"train 8 seeds and report mean +/- std" (the reference trains one SB3
model per process).

Usage:
    python examples/population_sweep.py --seeds 4 --total-steps 1000000
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="usv-simple")
    p.add_argument("--seeds", type=int, default=4)
    p.add_argument("--total-steps", type=float, default=1e6,
                   help="env steps per seed")
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--buffer-size", type=int, default=50_000)
    p.add_argument("--learning-starts", type=int, default=20_000)
    p.add_argument("--rounds-per-block", type=int, default=100)
    args = p.parse_args()

    import numpy as np

    from usv_tpu.envs import make
    from usv_tpu.train.sac import SacConfig, SacLearner

    cfg = SacConfig(
        num_envs=args.num_envs,
        buffer_size=args.buffer_size,
        learning_starts=args.learning_starts,
        learning_rate=3e-4,
        # partial fusion keeps sample efficiency (full fusion collapses it —
        # docs/PERFORMANCE.md "Fusion vs sample efficiency")
        gradient_steps=64,
        update_fusion=8,
    )
    learner = SacLearner(make(args.env), cfg)
    ts = learner.init_many(list(range(args.seeds)))

    steps_per_block = args.rounds_per_block * cfg.train_freq * cfg.num_envs
    done_steps = 0
    t0 = time.time()
    while done_steps < args.total_steps:
        ts, rewards = learner.train_rounds_many(ts, args.rounds_per_block)
        done_steps += steps_per_block
        evals = learner.eval_policy_many(ts, n_steps=200, num_envs=8)
        rate = args.seeds * done_steps / max(1e-9, time.time() - t0)
        print(
            f"steps/seed {done_steps:>9,}  aggregate {rate/1e6:5.2f}M steps/s  "
            f"eval per seed {[round(float(e), 3) for e in evals]}  "
            f"mean {np.mean(evals):.3f} +/- {np.std(evals):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
