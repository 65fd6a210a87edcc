"""Episode video recording.

Capability match for the reference's RecordVideo / VecVideoRecorder usage
(sb3_train.py:52, sb3_train_vec.py:69): render rgb_array frames during an
evaluation rollout and encode them to mp4 (cv2) or gif (imageio fallback).
Includes the reference's cubic-then-periodic trigger schedule
(sb3_train_vec.py:47-52).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import numpy as np


def video_trigger(step: int) -> bool:
    """Cubic schedule then every 200k steps (reference sb3_train_vec.py:47-52)."""
    step //= 200
    if step < 1000:
        return round(step ** (1.0 / 3)) ** 3 == step
    return step % 1000 == 0


class VideoRecorder:
    def __init__(self, path, fps: int = 30):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.fps = fps
        self.frames = []

    def capture(self, frame: np.ndarray):
        self.frames.append(np.asarray(frame, dtype=np.uint8))

    def close(self) -> Optional[str]:
        if not self.frames:
            return None
        try:
            import cv2

            h, w = self.frames[0].shape[:2]
            out_path = str(self.path.with_suffix(".mp4"))
            writer = cv2.VideoWriter(
                out_path, cv2.VideoWriter_fourcc(*"mp4v"), self.fps, (w, h)
            )
            for f in self.frames:
                writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            writer.release()
            return out_path
        except ImportError:
            import imageio

            out_path = str(self.path.with_suffix(".gif"))
            imageio.mimsave(out_path, self.frames, fps=self.fps)
            return out_path
        finally:
            self.frames = []


def record_episode(
    env,                      # a usv_tpu.compat gym adapter env
    policy_fn: Callable,      # obs -> action
    path,
    max_steps: int = 500,
    seed: Optional[int] = None,
    fps: int = 30,
):
    """Roll one episode through a gym-adapter env, saving the video."""
    rec = VideoRecorder(path, fps=fps)
    out = env.reset(seed=seed)
    obs = out[0] if isinstance(out, tuple) else out
    total = 0.0
    for _ in range(max_steps):
        frame = env.render()
        if frame is not None:
            rec.capture(frame)
        result = env.step(policy_fn(obs))
        if len(result) == 5:
            obs, reward, terminated, truncated, _ = result
            done = terminated or truncated
        else:
            obs, reward, done, _ = result
        total += float(reward)
        if done:
            break
    return rec.close(), total
