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
    """Cubic schedule then every 200k steps (reference sb3_train_vec.py:47-52).

    Float division like the reference: only exact multiples of 200 whose
    quotient is a perfect cube trigger (integer floor division would fire
    for a whole 200-step bucket around each cube)."""
    step = step / 200
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


def record_rollout_video(
    handle,                    # EnvHandle
    policy_fn: Callable,       # (stacked_obs,) -> action (jax-traceable)
    path,
    n_steps: int = 500,
    seed: int = 0,
    frame_stack: int = 0,
    fps: int = 30,
    renderer=None,
    stop_at_done: bool = True,
):
    """Record a policy episode: device-side rollout, host-side rendering.

    Unlike :func:`record_episode` (which steps a gym-adapter env from the
    host, one device dispatch per frame — fine on CPU, seconds-per-step over
    a remote TPU link), this runs the whole rollout as ONE jitted scan that
    collects the state trace, then renders frames from the fetched trace.
    Returns (video_path, episode_reward).
    """
    import jax

    from usv_tpu.envs.autoreset import make_autoreset_step
    from usv_tpu.vector.frames import init_frames, push_frames

    cfg = handle.cfg
    auto = make_autoreset_step(cfg, handle.step, handle.reset, handle.reset_obs)

    @jax.jit
    def run(key):
        state0 = handle.reset(cfg, key)
        frames0 = init_frames(handle.reset_obs(cfg, state0), frame_stack)

        def body(carry, _):
            state, frames = carry
            action = policy_fn(frames.reshape(-1))
            state, ts = auto(state, action)
            return (state, push_frames(frames, ts.obs, ts.done)), (state, ts.done, ts.reward)

        _, (states, done, reward) = jax.lax.scan(
            body, (state0, frames0), None, length=n_steps
        )
        return state0, states, done, reward

    state0, states, done, reward = jax.device_get(run(jax.random.key(seed)))

    done = np.asarray(done, bool)
    # the state at the done index is already auto-reset (next episode's
    # start), so the episode's own frames end just before it — but its
    # reward (terminal penalty/bonus included) belongs to the episode
    if stop_at_done and done.any():
        done_idx = int(np.argmax(done))
        frame_end, reward_end = done_idx, done_idx + 1
    else:
        frame_end = reward_end = n_steps
    episode_reward = float(np.asarray(reward)[:reward_end].sum())

    if renderer is None:
        from usv_tpu.utils.viz import (
            CaEnvRenderer,
            CurvedEnvRenderer,
            SimpleEnvRenderer,
        )

        if handle.env_id == "usv-asmc-ca-v0":
            renderer = CaEnvRenderer()
        elif handle.env_id == "usv-curved-aitsmc":
            renderer = CurvedEnvRenderer()
        elif handle.env_id in ("usv-asmc-v0", "usv-pid-v0", "usv-asmc-ye-int-v0"):
            from usv_tpu.utils.viz import LegacyEnvRenderer

            renderer = LegacyEnvRenderer()
        else:
            renderer = SimpleEnvRenderer()
    rec = VideoRecorder(path, fps=fps)
    try:
        # the episode's first frame is the RESET state (the scan trace only
        # holds post-step states)
        for state_t in [state0] + [
            jax.tree.map(lambda x, t=t: x[t], states) for t in range(frame_end)
        ]:
            frame = renderer.render_state(handle.cfg, state_t)
            if frame is not None:
                rec.capture(frame)
    except AttributeError as e:
        # env families without a compatible renderer (curved/legacy states
        # lack the simple-family fields) — skip the video, keep training
        import warnings

        warnings.warn(
            f"no renderer supports {handle.env_id!r} states ({e}); "
            "skipping video"
        )
        rec.frames = []
    finally:
        renderer.close()
    return rec.close(), episode_reward


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
