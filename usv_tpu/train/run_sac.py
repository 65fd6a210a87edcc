"""SAC training CLI — the reference's ``train_test/sb3_train*.py`` equivalent.

Usage:
    python -m usv_tpu.train.run_sac --env usv-simple --total-steps 1000000 \
        --num-envs 256 --logdir runs/sac

Everything (env batch, replay, learner) is device-resident; the host loop only
dispatches large jitted round-blocks and logs metrics/checkpoints.
"""

from __future__ import annotations

import argparse
import time


# SB3-matching fallbacks for the recipe-tunable args (argparse default None
# so an explicit flag — even one repeating the fallback — beats the recipe)
_ARG_FALLBACKS = dict(
    num_envs=256, train_freq=8, gradient_steps=8, update_fusion=1, lr=1e-4,
    buffer_size=400_000,
)


def apply_recipe(args):
    """Resolve ``--recipe`` + None-sentinels. Explicit flags always win.

    ``at-scale``: the measured-best SAC wide-batch recipe
    (docs/PERFORMANCE.md, "CA-env quality at throughput" + the usv-simple
    transfer): 1024 envs, 64 env steps / 64 gradient steps per round with
    4-way update fusion (16 sequential updates of batch 1024), lr 3e-4 —
    91.1% CA arrivals @96M (reliable across seeds where the dense regime is
    not), eval 1.57 on usv-simple @288M at ~1.8M steps/s.

    ``robust``: the at-scale recipe trained as a vmapped seed POPULATION
    (default 4) with winner auto-selection by the shared eval protocol —
    each seed carries its own replay buffer, so the buffer fallback drops
    to 100k/seed (HBM; docs/PERFORMANCE.md population notes).
    """
    if args.recipe in ("at-scale", "robust"):
        if args.num_envs is None:
            args.num_envs = 1024
        if args.train_freq is None:
            args.train_freq = 64
        if args.gradient_steps is None:
            args.gradient_steps = 64
        if args.update_fusion is None:
            args.update_fusion = 4
        if args.lr is None:
            args.lr = 3e-4
    if args.recipe == "robust":
        if args.population is None:
            args.population = 4
        if args.buffer_size is None:
            args.buffer_size = 100_000
    if args.population is None:
        args.population = 1
    for name, fallback in _ARG_FALLBACKS.items():
        if getattr(args, name) is None:
            setattr(args, name, fallback)
    return args


def run_sac_population(args):
    """The SAC ``--recipe robust`` path: S independent at-scale learners
    (envs, replay buffers, params) vmapped into one device program, per-seed
    best-eval snapshots, optional racing cull, and winner selection by the
    shared eval protocol (usv_tpu/train/population.py; VERDICT r3 next-#1).
    Per-seed budget = ``--total-steps`` (aggregate compute = population x
    that, in one dispatch stream)."""
    import numpy as np

    from usv_tpu.envs import make
    from usv_tpu.train.population import run_population_loop
    from usv_tpu.train.sac import SacConfig, SacLearner

    env_kwargs = {"ignore_obstacles": True} if args.ignore_obstacles else {}
    handle = make(args.env, **env_kwargs)
    cfg = SacConfig(
        buffer_size=args.buffer_size,
        batch_size=args.batch_size,
        learning_rate=args.lr,
        lr_decay_steps=args.lr_decay_steps or None,
        lr_final_fraction=args.lr_final_frac,
        learning_starts=args.learning_starts,
        train_freq=args.train_freq,
        gradient_steps=args.gradient_steps,
        use_sde=args.sde,
        num_envs=args.num_envs,
        frame_stack=args.frame_stack,
        lambda_t=args.lambda_t,
        lambda_s=args.lambda_s,
        eps_s=args.eps_s,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        fused_updates=args.fused_updates,
        update_fusion=args.update_fusion,
    )
    learner = SacLearner(handle, cfg)
    seeds = list(range(args.seed, args.seed + args.population))
    ts = learner.init_many(seeds)

    steps_per_block = args.rounds_per_block * cfg.train_freq * cfg.num_envs
    total_blocks = max(1, -(-int(args.total_steps) // steps_per_block))

    def train_many(ts):
        ts, reward_sum = learner.train_rounds_many(ts, args.rounds_per_block)
        per_step = float(np.asarray(reward_sum).mean()) / steps_per_block
        return ts, dict(collect_reward_per_step=per_step)

    run_population_loop(
        learner, seeds, ts, args,
        train_many=train_many,
        total_units=total_blocks,
        steps_per_unit=steps_per_block,
        eval_every=args.eval_every_blocks,
        params_of=lambda ts: ts.actor_params,
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="usv-simple")
    p.add_argument("--recipe", choices=["none", "at-scale", "robust"],
                   default="none",
                   help="named preset; 'at-scale' = 1024 envs, g64 k4 "
                        "(16 seq updates of batch 1024 per round), lr 3e-4 "
                        "— the measured-best wide-batch recipe "
                        "(docs/PERFORMANCE.md); 'robust' = at-scale trained "
                        "as a vmapped seed population (default 4, 100k "
                        "buffer/seed), winner auto-selected and exported; "
                        "explicit flags override")
    p.add_argument("--total-steps", type=float, default=10e6)  # sb3_train.py:13
    p.add_argument("--num-envs", type=int, default=None)       # default 256
    p.add_argument("--buffer-size", type=int, default=None)    # default 400k
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--learning-starts", type=int, default=50_000)
    p.add_argument("--lr", type=float, default=None)           # default 1e-4
    p.add_argument("--lr-decay-steps", type=int, default=0,
                   help="linear lr decay over this many gradient steps "
                        "(0 = constant, the reference behavior)")
    p.add_argument("--lr-final-frac", type=float, default=0.1)
    p.add_argument("--train-freq", type=int, default=None)      # default 8
    p.add_argument("--gradient-steps", type=int, default=None)  # default 8
    p.add_argument("--sde", default=True, action=argparse.BooleanOptionalAction,
                   help="gSDE exploration (reference config_sac default; "
                        "--no-sde for per-step Gaussian noise)")
    p.add_argument("--frame-stack", type=int, default=5)
    p.add_argument("--lambda-t", type=float, default=10.0)
    p.add_argument("--lambda-s", type=float, default=5.0)
    p.add_argument("--eps-s", type=float, default=0.1)
    p.add_argument("--rounds-per-block", type=int, default=200)
    p.add_argument("--logdir", default="runs/sac")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint-every-blocks", type=int, default=10)
    p.add_argument("--eval-every-blocks", type=int, default=5)
    p.add_argument("--best-metric", choices=["reward", "arrivals"],
                   default="reward",
                   help="metric that selects <logdir>/policy_best: eval "
                        "reward/step, or arrival rate on envs that report "
                        "arrivals (e.g. usv-asmc-ca-v0; falls back to "
                        "reward elsewhere)")
    p.add_argument("--eval-steps", type=int, default=500,
                   help="deterministic-eval rollout length; size it so "
                        "enough episodes finish for the selection metric "
                        "to be low-noise (CA episodes run up to 5000 steps)")
    p.add_argument("--eval-envs", type=int, default=16,
                   help="deterministic-eval batch width")
    p.add_argument("--ignore-obstacles", action="store_true")
    p.add_argument("--shard", action="store_true",
                   help="shard env batch + replay over all local devices")
    p.add_argument("--shard-local-replay", action="store_true",
                   help="with --shard: per-shard replay insert/sample so the "
                        "only steady-state cross-chip traffic is the "
                        "gradient psum (docs/SCALING.md; recommended beyond "
                        "one host)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 MLP compute on the MXU (params stay f32)")
    p.add_argument("--fused-updates", action="store_true",
                   help="one gradient_steps*batch update per round instead "
                        "of gradient_steps sequential updates")
    p.add_argument("--update-fusion", type=int, default=None,  # default 1
                   help="fold k sequential updates into one k*batch update "
                        "(k must divide gradient-steps)")
    p.add_argument("--light-checkpoints", action="store_true",
                   help="exclude the replay buffer from checkpoints (much "
                        "faster saves; resume re-warms an empty buffer)")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint from <logdir>/ckpt "
                        "before training")
    p.add_argument("--video-every-blocks", type=int, default=0,
                   help="record a policy episode video every N blocks "
                        "(device-side rollout, host-side rendering; each "
                        "recording re-traces a small rollout program)")
    p.add_argument("--population", type=int, default=None,
                   help="train N seeds as one vmapped population and export "
                        "the winner (default 1; --recipe robust defaults 4)")
    p.add_argument("--cull-at-frac", type=float, default=0.0,
                   help="racing: at this fraction of the budget, keep only "
                        "the --cull-keep best-so-far seeds (0 disables)")
    p.add_argument("--cull-keep", type=int, default=None,
                   help="seeds surviving the cull (default population//2, "
                        "min 2)")
    p.add_argument("--select-evals", type=int, default=3,
                   help="fresh-key re-evals per candidate in the final "
                        "winner selection (population runs)")
    args = apply_recipe(p.parse_args(argv))
    # population.py warns about flags it must ignore only when they differ
    # from these parser defaults (i.e. the user actually set them)
    args._parser_defaults = {f: p.get_default(f) for f in vars(args)}
    if args.population > 1:
        if args.shard or args.shard_local_replay:
            p.error("--population is incompatible with --shard (a population "
                    "already fills the chip; shard single-seed runs instead)")
        return run_sac_population(args)

    from usv_tpu.envs import make
    from usv_tpu.train.checkpoint import save_checkpoint
    from usv_tpu.train.metrics import MetricLogger, score_eval_stats
    from usv_tpu.train.sac import SacConfig, SacLearner

    env_kwargs = {}
    if args.ignore_obstacles:
        env_kwargs["ignore_obstacles"] = True
    handle = make(args.env, **env_kwargs)
    cfg = SacConfig(
        buffer_size=args.buffer_size,
        batch_size=args.batch_size,
        learning_rate=args.lr,
        lr_decay_steps=args.lr_decay_steps or None,
        lr_final_fraction=args.lr_final_frac,
        learning_starts=args.learning_starts,
        train_freq=args.train_freq,
        gradient_steps=args.gradient_steps,
        use_sde=args.sde,
        num_envs=args.num_envs,
        frame_stack=args.frame_stack,
        lambda_t=args.lambda_t,
        lambda_s=args.lambda_s,
        eps_s=args.eps_s,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        fused_updates=args.fused_updates,
        update_fusion=args.update_fusion,
        shard_local_replay=args.shard_local_replay,
    )
    mesh = None
    if args.shard or args.shard_local_replay:
        from usv_tpu.parallel.mesh import make_env_mesh

        mesh = make_env_mesh()
    learner = SacLearner(handle, cfg, mesh=mesh)
    ts = learner.init(seed=args.seed)

    if args.resume:
        from usv_tpu.train.checkpoint import restore_checkpoint

        template = ts.replace(buffer=None) if args.light_checkpoints else ts
        restored, at_step = restore_checkpoint(f"{args.logdir}/ckpt", template)
        if args.light_checkpoints:
            restored = restored.replace(buffer=ts.buffer)  # fresh empty buffer
        ts = restored
        print(f"resumed from checkpoint at env step {at_step}", flush=True)

    if mesh is not None:
        from usv_tpu.parallel.sharded import shard_sac_train_state

        ts = shard_sac_train_state(ts, mesh)

    logger = MetricLogger(args.logdir, config=vars(args))
    from usv_tpu.train.policy import export_policy

    steps_per_block = args.rounds_per_block * cfg.train_freq * cfg.num_envs
    block = 0
    best_eval = float("-inf")
    t0 = time.time()
    while int(ts.env_steps) * cfg.num_envs < args.total_steps:
        ts, reward_sum = learner.train_rounds(ts, args.rounds_per_block)
        block += 1
        env_steps = int(ts.env_steps) * cfg.num_envs  # forces device sync
        sps = steps_per_block / max(1e-9, time.time() - t0)
        metrics = dict(
            env_steps=env_steps,
            grad_steps=int(ts.grad_steps),
            collect_reward_per_step=float(reward_sum) / steps_per_block,
            steps_per_second=sps,
        )
        if args.eval_every_blocks and block % args.eval_every_blocks == 0:
            stats = learner.eval_policy_stats(
                ts, n_steps=args.eval_steps, num_envs=args.eval_envs
            )
            eval_metrics, score = score_eval_stats(stats, args.best_metric)
            metrics.update(eval_metrics)
            if score > best_eval:
                best_eval = score
                import jax

                from usv_tpu.train.policy import in_run_eval_meta

                export_policy(
                    learner, ts, f"{args.logdir}/policy_best",
                    extra_meta=in_run_eval_meta(
                        args.env, args.best_metric, score, stats,
                        jax.random.fold_in(ts.key, 7),
                        args.eval_steps, args.eval_envs,
                    ),
                )
            if int(ts.buffer.size) > 0:  # wandb.watch analog (needs data)
                metrics.update(learner.watch(ts))
        if args.video_every_blocks and block % args.video_every_blocks == 0:
            from usv_tpu.utils.video import record_rollout_video

            actor_params = ts.actor_params

            def vid_policy(obs):
                return learner.actor.deterministic(
                    actor_params, obs[None]
                )[0]

            vid, vid_reward = record_rollout_video(
                handle, vid_policy, f"{args.logdir}/videos/step_{env_steps}",
                n_steps=500, seed=block, frame_stack=cfg.frame_stack,
            )
            metrics["video_episode_reward"] = vid_reward
        logger.log(env_steps, **metrics)
        print({k: round(v, 3) if isinstance(v, float) else v for k, v in metrics.items()}, flush=True)
        if args.checkpoint_every_blocks and block % args.checkpoint_every_blocks == 0:
            save_checkpoint(f"{args.logdir}/ckpt", ts, env_steps,
                            include_buffer=not args.light_checkpoints)
        t0 = time.time()  # exclude eval/checkpoint from the next block's rate
    save_checkpoint(f"{args.logdir}/ckpt", ts, int(ts.env_steps) * cfg.num_envs,
                    include_buffer=not args.light_checkpoints)
    export_policy(learner, ts, f"{args.logdir}/policy")
    logger.close()


if __name__ == "__main__":
    main()
