"""Population/racing model selection shared by the robust train recipes.

``--recipe robust`` (run_ppo/run_sac) trains S independent at-scale
learners as ONE vmapped device program and must end with a defensible
winner: this module re-evaluates every candidate's best-snapshot params
under shared fresh keys via the learner's own eval program (paired
comparison — same eval scenes for every candidate), exports the winner
with a replayable in-run-eval record plus the full selection table, and
returns the winner index. The reference's counterpart workflow is N
separate SB3 runs plus a human picking the best
(train_test/sb3_train_vec.py:58-81)."""

from __future__ import annotations

import types

import jax
import numpy as np

from usv_tpu.train.metrics import score_eval_stats
from usv_tpu.train.policy import export_policy, in_run_eval_meta


def run_population_loop(learner, seeds, ts, args, *, train_many,
                        total_units, steps_per_unit, eval_every,
                        params_of) -> None:
    """The shared ``--recipe robust`` training loop (one body for the SAC and
    PPO CLIs): repeatedly step the vmapped population via ``train_many(ts)
    -> (ts, extra_metrics)``, snapshot each seed's best-eval params every
    ``eval_every`` units, optionally cull to the best seeds at
    ``--cull-at-frac`` (one retrace at the smaller S), then hand the
    candidates to :func:`select_and_export_winner`. ``params_of(ts)`` picks
    the exportable actor params from the population train state."""
    import time

    from usv_tpu.train.metrics import MetricLogger, score_eval_stats

    # Features of the single-seed loops that have no population analog yet
    # are surfaced, not silently dropped (ADVICE r4): a population run keeps
    # its best-snapshot state in host memory only.
    if getattr(args, "resume", False):
        raise SystemExit(
            "--resume is not supported with --population/--recipe robust: "
            "population runs keep no on-disk checkpoint to resume from"
        )
    # One unconditional info line (argparse cannot distinguish an
    # explicitly-passed default value, so a blanket notice is the only way
    # a user who typed `--checkpoint-every-iters 20` still learns it is
    # skipped), plus a per-flag warning only for values that differ from
    # the parser defaults the CLIs stash as _parser_defaults — a
    # default-valued flag the user never touched is not an opt-in worth a
    # louder warning on every robust run (ADVICE r4 #2).
    print(
        "population mode: per-seed checkpoints/videos/param-watch are not "
        "supported and are skipped",
        flush=True,
    )
    defaults = getattr(args, "_parser_defaults", {})
    dropped = [
        f for f in ("checkpoint_every_iters", "checkpoint_every_blocks",
                    "video_every_iters", "video_every_blocks",
                    "watch_every_iters")
        if getattr(args, f, 0) and getattr(args, f, 0) != defaults.get(f, 0)
    ]
    if dropped:
        print(
            "population mode: explicitly requested "
            f"{', '.join('--' + f.replace('_', '-') for f in dropped)} "
            "will be ignored (pass 0 to silence)",
            flush=True,
        )

    logger = MetricLogger(args.logdir, config=vars(args))
    cull_keep = args.cull_keep or max(2, args.population // 2)
    cull_unit = (
        max(1, int(total_units * args.cull_at_frac))
        if args.cull_at_frac else 0
    )
    best = [dict(score=float("-inf"), params=None, stats=None) for _ in seeds]

    unit = 0
    t0 = time.time()
    while unit < total_units:
        ts, extra = train_many(ts)
        unit += 1
        sps = steps_per_unit * len(seeds) / max(1e-9, time.time() - t0)
        metrics = dict(
            env_steps_per_seed=unit * steps_per_unit,
            seeds_alive=len(seeds),
            aggregate_steps_per_second=sps,
            **extra,
        )
        if eval_every and unit % eval_every == 0:
            stats = learner.eval_policy_stats_many(
                ts, n_steps=args.eval_steps, num_envs=args.eval_envs
            )
            params_host = None
            scores = []
            for i in range(len(seeds)):
                stats_i = {k: float(v[i]) for k, v in stats.items()}
                _, score = score_eval_stats(stats_i, args.best_metric)
                scores.append(float(score))
                if score > best[i]["score"]:
                    if params_host is None:
                        params_host = jax.device_get(params_of(ts))
                    best[i] = dict(
                        score=float(score),
                        params=jax.tree.map(lambda x: x[i], params_host),
                        stats=stats_i,
                    )
            metrics.update(
                eval_scores=[round(s, 4) for s in scores],
                eval_best_so_far=[round(b["score"], 4) for b in best],
            )
        if (cull_unit and unit >= cull_unit and len(seeds) > cull_keep
                and any(np.isfinite(b["score"]) for b in best)):
            # racing: keep the best-so-far seeds; one retrace at the new S
            order = np.argsort([-b["score"] for b in best])
            keep = sorted(int(i) for i in order[:cull_keep])
            metrics["culled_seeds"] = [
                seeds[i] for i in range(len(seeds)) if i not in keep
            ]
            seeds = [seeds[i] for i in keep]
            best = [best[i] for i in keep]
            idx = jax.numpy.asarray(keep)
            ts = jax.tree.map(lambda x: x[idx], ts)
        logger.log(unit * steps_per_unit, **{
            k: v for k, v in metrics.items() if isinstance(v, (int, float))
        })
        print({k: (round(v, 3) if isinstance(v, float) else v)
               for k, v in metrics.items()}, flush=True)
        t0 = time.time()

    final_params = jax.device_get(params_of(ts))
    candidates = []
    for i in range(len(seeds)):
        cand = best[i] if best[i]["params"] is not None else dict(
            score=float("-inf"),
            params=jax.tree.map(lambda x: x[i], final_params),
        )
        candidates.append(cand)
    select_and_export_winner(
        learner, seeds, candidates, args,
        final_params_of_winner=lambda w: jax.tree.map(
            lambda x: x[w], final_params
        ),
    )
    logger.close()


def select_and_export_winner(learner, seeds, candidates, args,
                             final_params_of_winner=None) -> int:
    """Population endgame; see module docstring.

    ``candidates[i]`` is ``{"score": in-run best, "params": pytree}``;
    ``final_params_of_winner(i)`` (optional) supplies the winner's FINAL
    params for the standard ``<logdir>/policy`` export."""
    sel = []
    for i, cand in enumerate(candidates):
        per_key = []
        for es in range(args.select_evals):
            key = jax.random.key(100_000 + es)
            st = learner.eval_policy_stats_at(
                cand["params"], key,
                n_steps=args.eval_steps, num_envs=args.eval_envs,
            )
            _, sc = score_eval_stats(st, args.best_metric)
            per_key.append(dict(score=float(sc), stats=st))
        sel.append(dict(
            seed=int(seeds[i]),
            in_run_best=float(cand["score"]),
            select_scores=[p["score"] for p in per_key],
            select_mean=float(np.mean([p["score"] for p in per_key])),
            # full per-candidate eval stats averaged over the select keys —
            # this is what puts collisions-at-selection next to arrivals in
            # the exported table (VERDICT r4 next-#7's trade curve)
            select_stats_mean={
                k: float(np.mean([p["stats"][k] for p in per_key]))
                for k in per_key[0]["stats"]
            },
            first_eval=per_key[0],
        ))
    winner = int(np.argmax([s["select_mean"] for s in sel]))
    print({"population_selection": sel, "winner_seed": sel[winner]["seed"]},
          flush=True)

    first = sel[winner]["first_eval"]
    extra = in_run_eval_meta(
        args.env, args.best_metric, first["score"], first["stats"],
        jax.random.key(100_000), args.eval_steps, args.eval_envs,
    )
    extra["population"] = dict(
        recipe=args.recipe,
        seeds=[int(s) for s in seeds],
        winner_seed=sel[winner]["seed"],
        selection=[{k: v for k, v in s.items() if k != "first_eval"}
                   for s in sel],
    )
    export_policy(
        learner, types.SimpleNamespace(
            params=candidates[winner]["params"],
            actor_params=candidates[winner]["params"],
        ),
        f"{args.logdir}/policy_best", extra_meta=extra,
    )
    if final_params_of_winner is not None:
        export_policy(
            learner, types.SimpleNamespace(
                params=final_params_of_winner(winner),
                actor_params=final_params_of_winner(winner),
            ),
            f"{args.logdir}/policy",
        )
    return winner
