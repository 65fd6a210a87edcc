"""Reward-shape exploration — the reference's ``reward_test.ipynb`` as a script.

Sweeps each shaped-reward component of ``usv-simple`` over its driving
variable (cross-track error, angle to target, speed error, action delta)
and plots the curves, so reward-shaping changes can be eyeballed before a
training run.

Usage:
    python examples/reward_explore.py --out /tmp/reward_shapes.png
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None, help="output png (default: show)")
    args = p.parse_args()

    import matplotlib
    import numpy as np

    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from usv_tpu.envs.simple import SimpleEnvConfig

    cfg = SimpleEnvConfig()

    fig, axes = plt.subplots(2, 2, figsize=(11, 7))

    ye = np.linspace(-4, 4, 400)
    ye_reward = np.maximum(
        np.exp(-np.abs(ye / cfg.ye_k)), np.exp(-np.square(ye / cfg.ye_k))
    )
    axes[0][0].plot(ye, ye_reward)
    axes[0][0].set_title(
        f"ye_reward: max of exponentials, ye_k={cfg.ye_k}\n"
        "(the reference's three overwrites resolved to the last)"
    )
    axes[0][0].set_xlabel("cross-track error [m]")

    ang = np.linspace(-np.pi, np.pi, 400)
    axes[0][1].plot(ang, np.exp(-np.abs(ang)))
    axes[0][1].set_title("angle_to_target_reward = exp(-|angle|)")
    axes[0][1].set_xlabel("angle to target [rad]")

    verr = np.linspace(-2, 2, 400)
    axes[1][0].plot(verr, 0.05 * np.exp(-np.abs(verr)))
    axes[1][0].set_title("velocity_track_reward = 0.05 exp(-|v - v_ref|)")
    axes[1][0].set_xlabel("speed error [m/s]")

    da = np.linspace(0, 2, 400)
    axes[1][1].plot(da, -(da / 2.0) * 0.15)
    axes[1][1].set_title("delta_action_reward = -0.15 * sum|Δa|/2 (linear form)")
    axes[1][1].set_xlabel("sum |action delta|")

    for ax in axes.flat:
        ax.grid(alpha=0.3)
    fig.suptitle(
        "usv-simple shaped-reward components "
        "(usv_tpu/envs/simple.py::compute_reward; reference simple_env.py:150-201)"
    )
    fig.tight_layout()
    if args.out:
        fig.savefig(args.out, dpi=110)
        print(f"wrote {args.out}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
