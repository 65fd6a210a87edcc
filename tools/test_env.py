"""Interactive/scripted env harness — reference ``tools/test_env.py`` parity.

Keyboard teleop of ``usv-simple`` via pygame arrow keys, plus the two
scripted obstacle-wall experiments (reference :8-44), argparse
--render/--steps, faulthandler, and a wall-time report.

Usage:
    python tools/test_env.py --no-render --steps 500
    python tools/test_env.py --experiment 2
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import faulthandler
import time

import numpy as np


def experiment_1_options():
    """Five-obstacle gate (reference :8-16)."""
    return {
        "obs_x": np.array([-6, 0, 6, 3, -3], dtype=float),
        "obs_y": np.array([0, 0, 0, 4, 4], dtype=float),
        "obs_r": np.array([1.5, 1.5, 1.5, 1.5, 1.5]),
        "start_position": np.array([0, -8, 0], dtype=float),
        "target_point": np.array([0, 8, 0], dtype=float),
        "renderplots": False,
    }


def experiment_2_options():
    """Two walls with gaps + two big blockers (reference :17-44)."""
    options = {"obs_x": np.array([]), "obs_y": np.array([]), "obs_r": np.array([])}

    def draw_vert_wall(options, start_x, end_x, y, radius=1.0):
        x = np.arange(start_x, end_x, radius * 2)
        options["obs_x"] = np.concatenate((options["obs_x"], x))
        options["obs_y"] = np.concatenate((options["obs_y"], np.full(len(x), y)))
        options["obs_r"] = np.concatenate((options["obs_r"], np.full(len(x), radius)))

    draw_vert_wall(options, -10, 30, -4, 0.5)
    draw_vert_wall(options, -10, 30, 1, 0.5)

    idx = [8, 9, 60, 61]  # gaps
    for k in ("obs_x", "obs_y", "obs_r"):
        options[k] = np.delete(options[k], idx)

    options["obs_x"] = np.append(options["obs_x"], [-10, 7])
    options["obs_y"] = np.append(options["obs_y"], [-3, -8])
    options["obs_r"] = np.append(options["obs_r"], [5, 5])

    options["start_position"] = np.array([0, -8, np.pi / 2])
    options["target_point"] = np.array([0, 8, 0], dtype=float)
    options["renderplots"] = False
    return options


def main():
    faulthandler.enable()
    parser = argparse.ArgumentParser(description="Test usv envs interactively")
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--no-render", dest="render", action="store_false")
    parser.set_defaults(render=True)
    parser.add_argument("--steps", type=int, nargs="?", default=5000)
    parser.add_argument("--env", default="usv-simple")
    parser.add_argument("--experiment", type=int, default=0,
                        help="0=random scene, 1/2=scripted walls (on the CA env)")
    args = parser.parse_args()

    from usv_tpu.compat import UsvAsmcCaEnv, UsvSimpleEnv

    if args.experiment:
        env = UsvAsmcCaEnv(render_mode="human" if args.render else None)
        options = experiment_1_options() if args.experiment == 1 else experiment_2_options()
        env.reset(options=options)
    else:
        env = UsvSimpleEnv(render_mode="human" if args.render else None)
        env.reset()

    start = time.perf_counter()
    action = np.array([0.0, -1.0], dtype=np.float32)
    for i in range(args.steps):
        _, _, done, truncated, info = env.step(action)
        if args.render:
            env.render()
        if done or truncated:
            break
        if args.render:
            import pygame

            keys = pygame.key.get_pressed()
            if keys[pygame.K_LEFT]:
                action[1] = -1
            elif keys[pygame.K_RIGHT]:
                action[1] = 1
            else:
                action[1] = 0
            if keys[pygame.K_UP]:
                action[0] = 0.75
            elif keys[pygame.K_DOWN]:
                action[0] = 0
            time.sleep(0.025)
        action = np.clip(action, -1, 1)

    print(f"Completed Execution in {time.perf_counter() - start} seconds")
    env.close()


if __name__ == "__main__":
    main()
