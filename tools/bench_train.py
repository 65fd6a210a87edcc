"""SAC training-throughput bench: default vs fused-update vs bf16 modes.

Measures env-steps/s *including* gradient updates for the SB3-matching cycle
({train_freq env steps -> gradient_steps updates}, reference
train_test/config.py:25-26) across the TPU throughput options
(SacConfig.fused_updates / compute_dtype — docs/PERFORMANCE.md "Training
throughput" section).

Usage: python tools/bench_train.py [--envs 2048] [--rounds 200] \
           [--modes default fused fused_bf16 bf16]
Prints one JSON line per mode.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import dataclasses
import json
import time

MODES = {
    "default": dict(),
    "bf16": dict(compute_dtype="bfloat16"),
    "fused": dict(fused_updates=True),
    "fused_bf16": dict(fused_updates=True, compute_dtype="bfloat16"),
    "fusion8": dict(update_fusion=8),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=2048)
    p.add_argument("--rounds", type=int, default=200)
    p.add_argument("--train-freq", type=int, default=8)
    p.add_argument("--gradient-steps", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--env", default="usv-simple")
    p.add_argument("--modes", nargs="*", default=list(MODES))
    args = p.parse_args()

    import jax

    from usv_tpu.envs import make
    from usv_tpu.train.sac import SacConfig, SacLearner

    handle = make(args.env)
    base = SacConfig(
        num_envs=args.envs,
        train_freq=args.train_freq,
        gradient_steps=args.gradient_steps,
        batch_size=args.batch_size,
        learning_starts=0,  # measure the steady state (updates every round)
    )
    steps_per_block = args.rounds * base.train_freq * args.envs

    for mode in args.modes:
        cfg = dataclasses.replace(base, **MODES[mode])
        learner = SacLearner(handle, cfg)
        ts = learner.init(seed=0)
        # warm up + compile
        ts, _ = learner.train_rounds(ts, args.rounds)
        float(ts.log_alpha)  # sync (block_until_ready unreliable on axon)
        t0 = time.time()
        ts, _ = learner.train_rounds(ts, args.rounds)
        float(ts.log_alpha)
        dt = time.time() - t0
        print(json.dumps({
            "mode": mode,
            "env": args.env,
            "num_envs": args.envs,
            "steps_per_second": round(steps_per_block / dt, 1),
            "ms_per_round": round(1e3 * dt / args.rounds, 3),
            "grad_steps": int(ts.grad_steps),
        }), flush=True)


if __name__ == "__main__":
    main()
