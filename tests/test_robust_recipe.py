"""The ``--recipe robust`` population/racing path (VERDICT r3 next-#1).

Tiny end-to-end CLI runs on CPU: a seed population trains as one vmapped
program, per-seed best-eval snapshots accumulate, the racing cull drops the
weakest seeds mid-run, the winner is selected by paired fresh-key evals and
exported with the full selection table — and the exported bundle's recorded
selection eval replays exactly.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def test_ppo_robust_recipe_end_to_end(tmp_path):
    from usv_tpu.train import run_eval, run_ppo

    logdir = str(tmp_path / "ppo")
    run_ppo.main([
        "--recipe", "robust", "--env", "usv-simple", "--population", "3",
        "--total-steps", "1536", "--num-envs", "4", "--n-steps", "64",
        "--batch-size", "64", "--update-fusion", "1",
        "--eval-every-iters", "2", "--eval-steps", "32", "--eval-envs", "4",
        "--cull-at-frac", "0.5", "--cull-keep", "2", "--select-evals", "2",
        "--checkpoint-every-iters", "0", "--logdir", logdir,
    ])

    meta = json.loads(Path(logdir, "policy_best", "policy.json").read_text())
    pop = meta["population"]
    assert pop["recipe"] == "robust"
    assert len(pop["selection"]) == 2, "cull should leave 2 candidates"
    assert pop["winner_seed"] in pop["seeds"]
    sel = {s["seed"]: s["select_mean"] for s in pop["selection"]}
    assert sel[pop["winner_seed"]] == max(sel.values()), "winner = argmax"
    assert Path(logdir, "policy", "policy.json").exists(), "final export too"

    out = tmp_path / "replay"
    run_eval.main([
        "--env", "usv-simple", "--policy", f"{logdir}/policy_best",
        "--out", str(out), "--replay-recorded-eval",
        "--steps", "8", "--episodes", "2",
    ])
    rep = json.loads((out / "replay_recorded_eval.json").read_text())
    assert rep["exact_match"]


def test_sac_robust_recipe_end_to_end(tmp_path):
    from usv_tpu.train import run_sac

    logdir = str(tmp_path / "sac")
    run_sac.main([
        "--recipe", "robust", "--env", "usv-simple", "--population", "2",
        "--total-steps", "2048", "--num-envs", "8", "--train-freq", "8",
        "--gradient-steps", "8", "--update-fusion", "1",
        "--buffer-size", "2048", "--learning-starts", "128",
        "--batch-size", "64", "--rounds-per-block", "8",
        "--eval-every-blocks", "2", "--eval-steps", "32", "--eval-envs", "4",
        "--select-evals", "2", "--checkpoint-every-blocks", "0",
        "--logdir", logdir,
    ])

    meta = json.loads(Path(logdir, "policy_best", "policy.json").read_text())
    assert meta["kind"] == "sac"
    pop = meta["population"]
    assert len(pop["selection"]) == 2 and pop["winner_seed"] in pop["seeds"]
    # the winning snapshot's selection eval is recorded and replayable
    assert "in_run_eval" in meta and len(meta["in_run_eval"]["key_data"]) >= 1


def test_robust_recipe_defaults_resolve():
    """--recipe robust inherits the at-scale hyperparameters and defaults to
    a 4-seed population; explicit flags still override."""
    from usv_tpu.train.run_ppo import apply_recipe as ppo_recipe
    from usv_tpu.train.run_ppo import build_parser as ppo_parser
    from usv_tpu.train.run_sac import apply_recipe as sac_recipe

    args = ppo_recipe(ppo_parser().parse_args(["--recipe", "robust"]))
    assert args.population == 4
    assert args.num_envs == 256 and args.batch_size == 2048
    assert args.update_fusion == 4 and args.single_shuffle is True
    assert args.lr_decay_updates > 0

    args = ppo_recipe(ppo_parser().parse_args(
        ["--recipe", "robust", "--population", "6", "--num-envs", "64"]
    ))
    assert args.population == 6 and args.num_envs == 64

    import argparse

    sac_p = argparse.Namespace(
        recipe="robust", num_envs=None, train_freq=None, gradient_steps=None,
        update_fusion=None, lr=None, population=None, buffer_size=None,
    )
    sac_recipe(sac_p)
    assert sac_p.population == 4
    assert sac_p.num_envs == 1024 and sac_p.buffer_size == 100_000


def test_population_mode_surfaces_unsupported_flags(tmp_path, capsys):
    """Population runs have no checkpoint/resume machinery; --resume must
    refuse (not silently train from scratch) and nonzero checkpoint/video
    cadences must be announced as ignored (ADVICE r4)."""
    import pytest

    from usv_tpu.envs import make
    from usv_tpu.train.population import run_population_loop
    from usv_tpu.train.ppo import PpoConfig, PpoLearner

    learner = PpoLearner(make("usv-simple"), PpoConfig(
        n_steps=8, batch_size=16, n_epochs=1, num_envs=4,
        pi_hidden=(16, 16), vf_hidden=(16, 16), frame_stack=1,
    ))
    seeds = [0, 1]
    ts = learner.init_many(seeds)

    def mk_args(**over):
        import argparse

        base = dict(
            resume=False, checkpoint_every_iters=0, video_every_iters=0,
            logdir=str(tmp_path / "pop"), population=2, cull_at_frac=0.0,
            cull_keep=None, eval_steps=20, eval_envs=2, best_metric="reward",
            select_evals=1, recipe="robust", env="usv-simple", seed=0,
        )
        base.update(over)
        return argparse.Namespace(**base)

    with pytest.raises(SystemExit, match="resume"):
        run_population_loop(
            learner, seeds, ts, mk_args(resume=True),
            train_many=lambda t: (t, {}), total_units=1, steps_per_unit=32,
            eval_every=1, params_of=lambda t: t.params,
        )

    ts = learner.init_many(seeds)
    run_population_loop(
        learner, seeds, ts, mk_args(checkpoint_every_iters=10),
        train_many=lambda t: learner.train_iteration_many(t)[:1] + ({},),
        total_units=1, steps_per_unit=32,
        eval_every=1, params_of=lambda t: t.params,
    )
    outerr = capsys.readouterr()
    assert "--checkpoint-every-iters" in outerr.out  # listed as ignored
    assert "not supported and are skipped" in outerr.out
