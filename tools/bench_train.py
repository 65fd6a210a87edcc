"""Training-throughput bench: SAC (fusion/bf16 modes) and PPO (batch sizes).

Measures env-steps/s *including* gradient updates for the SB3-matching
cycles (SAC: {train_freq env steps -> gradient_steps updates}, reference
train_test/config.py:25-26; PPO: {n_steps rollout -> n_epochs x minibatch
updates}, config.py:7-8) across the TPU throughput options
(docs/PERFORMANCE.md "Training throughput" section).

Usage: python tools/bench_train.py [--envs 2048] [--rounds 200] \
           [--modes default fused fused_bf16 bf16 fusion8]
       python tools/bench_train.py --algo ppo --envs 16 \
           [--ppo-batch-sizes 64 512 2048]
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
    # NOTE: since the use_sde default flipped to True (reference config_sac
    # parity), "default" includes gSDE collection; "nosde" is the previous
    # rounds' baseline for historical comparison.
    "default": dict(),
    "nosde": dict(use_sde=False),
    "bf16": dict(compute_dtype="bfloat16"),
    "fused": dict(fused_updates=True),
    "fused_bf16": dict(fused_updates=True, compute_dtype="bfloat16"),
    "fusion8": dict(update_fusion=8),
}


def bench_ppo(args):
    """PPO throughput across (batch_size, update_fusion) settings, with a
    rollout/update phase attribution (docs/PERFORMANCE.md PPO study): the
    rollout phase is timed separately via a collect-only program, so
    update-phase ms = iteration ms - rollout ms."""
    import jax
    import jax.numpy as jnp

    from usv_tpu.envs import make
    from usv_tpu.train.ppo import PpoConfig, PpoLearner

    handle = make(args.env)

    def timed(fn, *a):
        out = fn(*a)
        jax.tree.leaves(out)
        float(jax.tree.leaves(out)[0].ravel()[0])  # sync
        t0 = time.time()
        out = fn(*a)
        float(jax.tree.leaves(out)[0].ravel()[0])
        return out, time.time() - t0

    shuffle_opts = ([True, False] if args.sweep_shuffle
                    else [not args.single_shuffle])
    for bs in args.ppo_batch_sizes:
        for fusion in args.ppo_fusions:
          for reshuffle in shuffle_opts:
            cfg = PpoConfig(num_envs=args.envs, batch_size=bs,
                            update_fusion=fusion,
                            reshuffle_epochs=reshuffle,
                            compute_dtype="bfloat16" if args.bf16
                            else "float32")
            learner = PpoLearner(handle, cfg)
            ts = learner.init(seed=0)
            steps_per_iter = cfg.n_steps * cfg.num_envs

            # phase attribution: collect-only program. Consume EVERY float
            # in the trajectory — returning only raw_reward lets XLA
            # dead-code the value-net forward out of the loop and
            # under-report the rollout phase (docs/PERFORMANCE.md,
            # dead-tuple-elimination warning).
            collect = jax.jit(
                lambda t, k: sum(
                    jnp.sum(x) for x in jax.tree.leaves(
                        learner._collect(t, k)[1])
                    if jnp.issubdtype(x.dtype, jnp.floating)
                )
            )
            _, dt_collect = timed(collect, ts, jax.random.key(0))

            ts, _ = learner.train_iteration(ts)   # compile + warm up
            float(ts.update_count)
            t0 = time.time()
            ts, _ = learner.train_iteration(ts)
            float(ts.update_count)
            dt = time.time() - t0
            print(json.dumps({
                "algo": "ppo",
                "env": args.env,
                "num_envs": args.envs,
                "batch_size": bs,
                "update_fusion": fusion,
                "reshuffle_epochs": reshuffle,
                "optimizer_steps_per_iter":
                    cfg.n_epochs * (steps_per_iter // (bs * fusion)),
                "iter_ms": round(1e3 * dt, 1),
                "rollout_ms": round(1e3 * dt_collect, 1),
                "update_ms": round(1e3 * (dt - dt_collect), 1),
                "steps_per_second": round(steps_per_iter / dt, 1),
            }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--algo", choices=["sac", "ppo"], default="sac")
    p.add_argument("--envs", type=int, default=2048)
    p.add_argument("--rounds", type=int, default=200)
    p.add_argument("--train-freq", type=int, default=8)
    p.add_argument("--gradient-steps", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--buffer-size", type=int, default=400_000)
    p.add_argument("--env", default="usv-simple")
    p.add_argument("--modes", nargs="*", default=list(MODES))
    p.add_argument("--ppo-batch-sizes", type=int, nargs="*",
                   default=[64, 512, 2048])
    p.add_argument("--ppo-fusions", type=int, nargs="*", default=[1],
                   help="update_fusion values to sweep (k minibatches per "
                        "optimizer step)")
    p.add_argument("--bf16", action="store_true",
                   help="(ppo) bf16 MLP compute on the MXU")
    p.add_argument("--single-shuffle", action="store_true",
                   help="(ppo) one permutation per iteration instead of "
                        "per epoch (reshuffle_epochs=False)")
    p.add_argument("--sweep-shuffle", action="store_true",
                   help="(ppo) bench both reshuffle_epochs settings per "
                        "config (same-session A/B)")
    args = p.parse_args()

    import jax

    from usv_tpu.envs import make
    from usv_tpu.train.sac import SacConfig, SacLearner

    if args.algo == "ppo":
        bench_ppo(args)
        return

    handle = make(args.env)
    base = SacConfig(
        num_envs=args.envs,
        train_freq=args.train_freq,
        gradient_steps=args.gradient_steps,
        batch_size=args.batch_size,
        buffer_size=args.buffer_size,
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
