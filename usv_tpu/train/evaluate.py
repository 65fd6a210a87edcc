"""Policy evaluation + controller-trace diagnostics.

Reproduces the reference's evaluation-as-test workflow (SURVEY.md §4: the
notebooks roll out a trained policy and inspect reward decomposition,
controller errors e_u/e_r, adaptive gains Ka_u/Ka_r, cross-track error,
thrusters, and trajectory-vs-path — ``plot_agent_aitsmc_vec.ipynb``). Here
the rollout runs on device and the 8-panel figure is produced by matplotlib
from the fixed-shape info traces.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import jax
import numpy as np

from usv_tpu.envs.autoreset import make_autoreset_step
from usv_tpu.envs.registry import EnvHandle
from usv_tpu.vector.frames import init_frames, push_frames


def batch_policy_metrics(
    handle: EnvHandle,
    batch_policy_fn: Callable,
    n_steps: int,
    num_envs: int,
    seed: int = 0,
    frame_stack: int = 1,
):
    """Batched frame-stacked deterministic rollout -> summary metrics.

    One jitted device program (vmapped autoreset scan); the canonical eval
    protocol behind both the ``run_eval`` CLI summary and the seed-study
    artifacts (tools/study_ppo_k4_seeds.py) — a single implementation so
    the quoted numbers can never desynchronize.

    Returns a dict with ``reward_per_step``, ``episodes_finished``,
    ``terminations``, ``truncations``, and ``info_<flag>`` counts for every
    per-env boolean info flag (e.g. the CA env's arrived/collision).
    """
    import jax.numpy as jnp

    cfg = handle.cfg
    auto = jax.vmap(
        make_autoreset_step(cfg, handle.step, handle.reset, handle.reset_obs)
    )
    stack = max(1, frame_stack)

    @jax.jit
    def run(key):
        state = jax.vmap(lambda k: handle.reset(cfg, k))(
            jax.random.split(key, num_envs)
        )
        obs0 = jax.vmap(lambda s: handle.reset_obs(cfg, s))(state)
        frames = init_frames(obs0, stack)

        def body(carry, _):
            state, frames = carry
            actions = batch_policy_fn(frames.reshape(num_envs, -1))
            state, ts = auto(state, actions)
            new_frames = push_frames(frames, ts.obs, ts.done)
            flags = {
                k: jnp.sum(v) for k, v in ts.info.items()
                if hasattr(v, "dtype") and v.dtype == jnp.bool_ and v.ndim == 1
            }
            out = (
                jnp.sum(ts.reward), jnp.sum(ts.done), jnp.sum(ts.terminated),
                flags,
            )
            return (state, new_frames), out

        _, (r, d, t, flags) = jax.lax.scan(
            body, (state, frames), None, length=n_steps
        )
        return (
            jnp.sum(r), jnp.sum(d), jnp.sum(t),
            {k: jnp.sum(v) for k, v in flags.items()},
        )

    reward_sum, done_sum, term_sum, flag_sums = run(jax.random.key(seed + 1))
    return dict(
        reward_per_step=float(reward_sum) / (n_steps * num_envs),
        episodes_finished=int(done_sum),
        terminations=int(term_sum),
        truncations=int(done_sum) - int(term_sum),
        **{f"info_{k}": int(v) for k, v in sorted(flag_sums.items())},
    )


def bundle_eval(env_id, policy_dir, *, best_metric="reward", steps=1000,
                episodes=16, seed=0) -> dict:
    """The studies' shared bundle re-eval: load an exported policy bundle
    and run :func:`batch_policy_metrics` (the SAME implementation the
    run_eval CLI uses, so artifact numbers cannot desynchronize from the
    quoted protocol). Returns ``{"reward_per_step": ...}`` plus, when
    ``best_metric == 'arrivals'`` and the env reports outcomes,
    ``arrival_rate``/``collision_rate`` as fractions of finished episodes.
    Used by tools/study_ppo_k4_seeds.py and tools/study_robust_recipe.py."""
    from usv_tpu.envs import make
    from usv_tpu.train.policy import load_policy

    policy = load_policy(policy_dir)
    metrics = batch_policy_metrics(
        make(env_id), policy, n_steps=steps, num_envs=episodes,
        seed=seed, frame_stack=policy.frame_stack,
    )
    out = dict(reward_per_step=metrics["reward_per_step"])
    if best_metric == "arrivals":
        episodes_done = max(metrics["episodes_finished"], 1)
        out["arrival_rate"] = metrics.get("info_arrived", 0) / episodes_done
        out["collision_rate"] = metrics.get("info_collision", 0) / episodes_done
    return out


def rollout_with_info(
    handle: EnvHandle,
    policy_fn: Callable,
    n_steps: int = 1000,
    seed: int = 0,
    frame_stack: int = 0,
):
    """Single-env on-device rollout collecting the full info trace.

    policy_fn(obs) -> action (deterministic). Returns dict of stacked (T, ...)
    arrays: obs, reward, done + every info field.
    """
    cfg = handle.cfg
    auto = make_autoreset_step(cfg, handle.step, handle.reset, handle.reset_obs)

    @jax.jit
    def run(key):
        state = handle.reset(cfg, key)
        obs0 = handle.reset_obs(cfg, state)
        frames0 = init_frames(obs0, frame_stack)

        def body(carry, _):
            state, frames = carry
            obs_in = frames.reshape(-1)
            action = policy_fn(obs_in)
            state, ts = auto(state, action)
            new_frames = push_frames(frames, ts.obs, ts.done)
            out = {"obs": ts.obs, "reward": ts.reward, "done": ts.done, **ts.info}
            return (state, new_frames), out

        _, trace = jax.lax.scan(body, (state, frames0), None, length=n_steps)
        return trace

    trace = run(jax.random.key(seed))
    return {k: np.asarray(v) for k, v in trace.items()}


def plot_diagnostics(trace: dict, out_path: Optional[str] = None, dt: float = 1 / 25):
    """8-panel controller/reward diagnostics (notebook cells 6-8 equivalent)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = np.arange(len(trace["reward"])) * dt
    fig, axes = plt.subplots(4, 2, figsize=(14, 14))

    def maybe(ax, keys, title, labels=None):
        plotted = False
        for i, k in enumerate(keys):
            if k in trace:
                ax.plot(t, trace[k], label=(labels[i] if labels else k))
                plotted = True
        ax.set_title(title)
        if plotted:
            ax.legend(fontsize=8)

    pos = trace.get("position")
    ax = axes[0][0]
    if pos is not None:
        # auto-reset rollouts span several episodes with different paths —
        # split at done boundaries and overlay each segment on ITS path
        dones = np.asarray(trace.get("done", np.zeros(len(pos)))).astype(bool)
        boundaries = [0] + (np.flatnonzero(dones) + 1).tolist() + [len(pos)]
        for i, (a, b) in enumerate(zip(boundaries[:-1], boundaries[1:])):
            if b - a < 2:
                continue
            ax.plot(pos[a:b, 0], pos[a:b, 1],
                    label="trajectory" if i == 0 else None)
            if "path_start" in trace:
                ps, pe = trace["path_start"][a], trace["path_end"][a]
                ax.plot([ps[0], pe[0]], [ps[1], pe[1]], "--", alpha=0.5,
                        label="path" if i == 0 else None)
        ax.set_title("trajectory vs path (per episode)")
        ax.legend(fontsize=8)

    maybe(axes[0][1], ["left_thruster", "right_thruster"], "thrusters")
    maybe(axes[1][0], ["e_u", "e_r"], "controller errors")
    maybe(axes[1][1], ["Ka_u", "Ka_r"], "adaptive gains")
    maybe(axes[2][0], ["ye"], "cross-track error")
    maybe(
        axes[2][1],
        ["ye_reward", "angle_to_target_reward", "velocity_track_reward",
         "delta_action_reward"],
        "reward decomposition",
    )
    maybe(axes[3][0], ["reward"], "total reward")
    maybe(axes[3][1], ["setpoint_u", "setpoint_r", "action0", "action1"], "actions/setpoints")

    fig.tight_layout()
    if out_path:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(out_path, dpi=110)
        plt.close(fig)
        return out_path
    return fig
