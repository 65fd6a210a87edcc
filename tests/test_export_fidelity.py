"""Bundle-export fidelity (VERDICT r3 next-#5).

Two guarantees, for SAC and PPO with gSDE on (the production configs):

1. The exported bundle's deterministic action equals the IN-TRAIN
   deterministic action bitwise on identical observations — the exported
   network/metadata rebuild exactly the policy the in-run eval scored.
2. A ``policy_best`` bundle's recorded in-run eval (score + protocol + the
   exact PRNG key, stored by the train CLIs at export time) replays
   bit-for-bit via ``run_eval --replay-recorded-eval``.

Together these attribute any in-run-vs-re-eval score gap (e.g. the round-3
2B-soak's 1.669 best vs 1.59 mean re-eval) to eval-SEED variance: the
export pipeline itself is lossless.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from usv_tpu.envs import make
from usv_tpu.train.policy import export_policy, load_policy


def test_sac_bundle_action_fidelity_bitwise(tmp_path):
    from usv_tpu.train.sac import SacConfig, SacLearner

    handle = make("usv-simple")
    cfg = SacConfig(num_envs=4, learning_starts=64, buffer_size=2048,
                    use_sde=True, frame_stack=5)
    learner = SacLearner(handle, cfg)
    ts = learner.init(seed=0)
    ts, _ = learner.train_rounds(ts, 4)

    obs = jax.random.normal(
        jax.random.key(1), (32, learner.obs_dim), jnp.float32
    )
    # compare jitted-to-jitted: the bundle's act is jitted, and eager-vs-jit
    # XLA fusion differs by ~1 ulp — the claim is the exported FUNCTION is
    # identical, so both sides compile the same program
    in_train = np.asarray(
        jax.jit(learner.actor.deterministic)(ts.actor_params, obs)
    )

    export_policy(learner, ts, tmp_path / "bundle")
    policy = load_policy(tmp_path / "bundle")
    from_bundle = np.asarray(policy(obs))

    np.testing.assert_array_equal(from_bundle, in_train)


def test_ppo_bundle_action_fidelity_bitwise(tmp_path):
    from usv_tpu.train.ppo import PpoConfig, PpoLearner

    handle = make("usv-simple")
    cfg = PpoConfig(num_envs=4, n_steps=32, batch_size=32,
                    use_sde=True, frame_stack=5)
    learner = PpoLearner(handle, cfg)
    ts = learner.init(seed=0)
    ts, _ = learner.train_iteration(ts)

    obs = jax.random.normal(
        jax.random.key(2), (32, learner.obs_dim), jnp.float32
    )
    low = jnp.asarray(handle.cfg.action_low)
    high = jnp.asarray(handle.cfg.action_high)

    @jax.jit
    def in_train_act(params, obs):
        mean, _, _, _ = learner.model.apply(params, obs)
        return jnp.clip(mean, low, high)

    in_train = np.asarray(in_train_act(ts.params, obs))

    export_policy(learner, ts, tmp_path / "bundle")
    policy = load_policy(tmp_path / "bundle")
    from_bundle = np.asarray(policy(obs))

    np.testing.assert_array_equal(from_bundle, in_train)


@pytest.mark.parametrize("algo", ["sac", "ppo"])
def test_recorded_in_run_eval_replays_exactly(tmp_path, algo):
    """Drive the REAL train CLI (tiny run), then replay the policy_best
    bundle's recorded eval through run_eval --replay-recorded-eval: the
    replayed score must equal the recorded one exactly."""
    logdir = str(tmp_path / f"{algo}_run")
    if algo == "sac":
        from usv_tpu.train import run_sac

        run_sac.main([
            "--env", "usv-simple", "--total-steps", "4096",
            "--num-envs", "8", "--learning-starts", "256",
            "--buffer-size", "4096", "--rounds-per-block", "8",
            "--eval-every-blocks", "1", "--eval-steps", "32",
            "--eval-envs", "4", "--checkpoint-every-blocks", "0",
            "--logdir", logdir,
        ])
    else:
        from usv_tpu.train import run_ppo

        run_ppo.main([
            "--env", "usv-simple", "--total-steps", "2048",
            "--num-envs", "4", "--n-steps", "64", "--batch-size", "64",
            "--eval-every-iters", "1", "--eval-steps", "32",
            "--eval-envs", "4", "--checkpoint-every-iters", "0",
            "--logdir", logdir,
        ])

    bundle = Path(logdir) / "policy_best"
    meta = json.loads((bundle / "policy.json").read_text())
    rec = meta["in_run_eval"]
    assert rec["env"] == "usv-simple"
    assert rec["n_steps"] == 32 and rec["num_envs"] == 4
    assert len(rec["key_data"]) >= 1

    from usv_tpu.train import run_eval

    out = tmp_path / f"{algo}_replay"
    run_eval.main([
        "--env", "usv-simple", "--policy", str(bundle),
        "--out", str(out), "--replay-recorded-eval",
        "--steps", "16", "--episodes", "2",
    ])
    rep = json.loads((out / "replay_recorded_eval.json").read_text())
    assert rep["exact_match"], (
        f"replayed {rep['replayed']} != recorded {rep['recorded']} — "
        "export infidelity or eval-protocol drift"
    )
