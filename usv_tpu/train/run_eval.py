"""Evaluation CLI: roll out a policy bundle and save diagnostics.

The reference's evaluation workflow lives in notebooks
(``plot_agent_aitsmc_vec.ipynb``: load model, roll out, plot traces —
SURVEY.md §4 "evaluation-as-test"). This is that workflow as a CLI over any
env family and a deployment bundle written by the train CLIs:

    python -m usv_tpu.train.run_eval --env usv-simple \
        --policy runs/sac/policy --out runs/sac/eval

Writes the 8-panel diagnostics figure, a JSON metrics summary, and
(optionally) an episode video. With no ``--policy`` it evaluates the
zero-action baseline.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="usv-simple")
    p.add_argument("--policy", default=None,
                   help="policy bundle dir (from the train CLIs); default "
                        "zero-action baseline")
    p.add_argument("--out", default="runs/eval")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--episodes", type=int, default=16,
                   help="batch rollout width for the summary metrics")
    p.add_argument("--video", action="store_true",
                   help="also render an episode video (host-side)")
    p.add_argument("--replay-recorded-eval", action="store_true",
                   help="re-run the in-run eval recorded in the bundle "
                        "metadata (same learner program, protocol, and PRNG "
                        "key) and report recorded vs replayed — bitwise "
                        "agreement attributes any in-run-vs-re-eval gap to "
                        "eval-seed variance rather than export infidelity")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from usv_tpu.envs import make
    from usv_tpu.train.evaluate import (
        batch_policy_metrics,
        plot_diagnostics,
        rollout_with_info,
    )

    handle = make(args.env)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    if args.replay_recorded_eval:
        if not args.policy:
            p.error("--replay-recorded-eval requires --policy")
        from usv_tpu.train.policy import replay_recorded_eval

        rep = replay_recorded_eval(handle, args.policy)
        rep["exact_match"] = rep["recorded"] == rep["replayed"]
        (out / "replay_recorded_eval.json").write_text(json.dumps(rep, indent=1))
        print(json.dumps(rep), flush=True)

    if args.policy:
        from usv_tpu.train.policy import load_policy

        policy = load_policy(args.policy)
        frame_stack = policy.frame_stack
        # Policy handles both (obs_dim,) and (B, obs_dim) inputs
        policy_fn = batch_policy_fn = policy
    else:
        frame_stack = 0
        act_dim = handle.cfg.action_dim

        def policy_fn(obs):
            return jnp.zeros((act_dim,))

        def batch_policy_fn(obs):
            return jnp.zeros((obs.shape[0], act_dim))

    # 1) single-env info-trace rollout -> diagnostics figure
    trace = rollout_with_info(
        handle, policy_fn, n_steps=args.steps, seed=args.seed,
        frame_stack=frame_stack,
    )
    fig_path = plot_diagnostics(trace, out_path=str(out / "diagnostics.png"))

    # 2) batched frame-stacked rollout -> summary metrics (one device
    # program; shared implementation, evaluate.batch_policy_metrics)
    metrics = batch_policy_metrics(
        handle, batch_policy_fn, n_steps=args.steps, num_envs=args.episodes,
        seed=args.seed, frame_stack=frame_stack,
    )
    summary = dict(
        env=args.env,
        policy=args.policy or "zero-action baseline",
        steps=int(args.steps),
        episodes_batch=int(args.episodes),
        # incl. per-step boolean info flags summed over the rollout (e.g.
        # the CA env's arrived/collision outcome counts)
        **metrics,
    )
    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary), flush=True)

    if args.video:
        # one jitted device rollout, host-side rendering (a host-stepped
        # gym loop would pay one device dispatch per frame)
        from usv_tpu.utils.video import record_rollout_video

        record_rollout_video(
            handle, policy_fn, str(out / "episode"),
            n_steps=args.steps, seed=args.seed, frame_stack=frame_stack,
        )
    print(f"wrote {fig_path} and {out / 'summary.json'}", flush=True)


if __name__ == "__main__":
    main()
