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
