"""Auxiliary subsystems: checkpoint/restore, metrics, evaluation harness,
utils (path gen, IIR filter), tools."""

import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usv_tpu.envs import make
from usv_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from usv_tpu.train.evaluate import plot_diagnostics, rollout_with_info
from usv_tpu.train.metrics import MetricLogger
from usv_tpu.train.sac import SacConfig, SacLearner
from usv_tpu.utils.live_filter import LiveLFilter, iir_filter_scan
from usv_tpu.utils.path_gen import (
    generate_path,
    pchip_eval,
    pchip_fit,
    place_obstacles,
    simplified_lookahead,
)

SMALL = SacConfig(
    buffer_size=1024, batch_size=32, learning_starts=64, num_envs=4,
    train_freq=2, gradient_steps=1, hidden=(32, 32), frame_stack=2,
)


def test_checkpoint_roundtrip(tmp_path):
    learner = SacLearner(make("usv-simple"), SMALL)
    ts = learner.init(seed=0)
    ts, _ = learner.train_rounds(ts, 10)
    save_checkpoint(tmp_path / "ckpt", ts, 100)

    template = learner.init(seed=1)
    restored, step = restore_checkpoint(tmp_path / "ckpt", template)
    assert step == 100
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.actor_params)[0]),
        np.asarray(jax.tree.leaves(ts.actor_params)[0]),
    )
    assert int(restored.env_steps) == int(ts.env_steps)
    # training continues from the restored state
    restored2, r = learner.train_rounds(restored, 2)
    assert np.isfinite(float(r))


def test_light_checkpoint_roundtrip(tmp_path):
    """include_buffer=False drops the replay buffer; restore with a
    buffer=None template, then re-attach a fresh buffer and keep training."""
    learner = SacLearner(make("usv-simple"), SMALL)
    ts = learner.init(seed=0)
    ts, _ = learner.train_rounds(ts, 10)
    save_checkpoint(tmp_path / "ckpt", ts, 100, include_buffer=False)

    fresh = learner.init(seed=1)
    restored, step = restore_checkpoint(
        tmp_path / "ckpt", fresh.replace(buffer=None)
    )
    assert step == 100 and restored.buffer is None
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.actor_params)[0]),
        np.asarray(jax.tree.leaves(ts.actor_params)[0]),
    )
    restored = restored.replace(buffer=fresh.buffer)
    restored2, r = learner.train_rounds(restored, 2)
    assert np.isfinite(float(r))


def test_metric_logger(tmp_path):
    logger = MetricLogger(tmp_path / "run", use_tensorboard=False, config={"a": 1})
    logger.log(1, reward=0.5, steps=100)
    logger.log(2, reward=0.7, steps=200)
    logger.close()
    lines = (tmp_path / "run" / "metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    assert json.loads(lines[1])["reward"] == 0.7


def test_rollout_with_info_and_plot(tmp_path):
    h = make("usv-aitsmc-simple")

    def policy(obs):
        return jnp.asarray([0.5, 0.1], jnp.float32)

    trace = rollout_with_info(h, policy, n_steps=50, frame_stack=2)
    assert trace["reward"].shape == (50,)
    assert "Ka_u" in trace and "e_u" in trace
    out = plot_diagnostics(trace, out_path=str(tmp_path / "diag.png"))
    assert Path(out).exists() and Path(out).stat().st_size > 10_000


def test_pchip_interpolates_knots():
    x = np.array([0.0, 1.0, 2.5, 4.0, 6.0])
    y = np.array([0.0, 2.0, 1.0, 3.0, 2.0])
    path = pchip_fit(x, y)
    np.testing.assert_allclose(np.asarray(pchip_eval(path, x)), y, atol=1e-5)
    # monotone segments don't overshoot
    xs = np.linspace(0, 1, 50)
    ys = np.asarray(pchip_eval(path, xs))
    assert ys.min() >= -1e-5 and ys.max() <= 2.0 + 1e-5


def test_pchip_matches_scipy():
    from scipy.interpolate import PchipInterpolator

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 8))
    y = rng.uniform(-3, 3, 8)
    ours = pchip_fit(x, y)
    ref = PchipInterpolator(x, y)
    xs = np.linspace(x[0], x[-1], 100)
    np.testing.assert_allclose(
        np.asarray(pchip_eval(ours, xs)), ref(xs), atol=2e-3
    )


def test_generate_path_and_obstacles():
    path, wps = generate_path(jax.random.key(0), [0.0, 0.0], 8)
    assert wps.shape == (8, 2)
    obstacles, mask = place_obstacles(jax.random.key(1), path, wps, 10)
    assert obstacles.shape == (10, 3)
    x, y = simplified_lookahead(path, wps, 1.0, 0.5)
    assert np.isfinite(float(y))


def test_plot_path_renders():
    import matplotlib

    matplotlib.use("Agg")
    from usv_tpu.utils import plot_path

    path, wps = generate_path(jax.random.key(0), [0.0, 0.0], 8)
    obstacles, _ = place_obstacles(jax.random.key(1), path, wps, 10)
    ax = plot_path(path, wps, obstacles, show=False)
    assert len(ax.lines) == 1 and len(ax.collections) == 2


def test_live_filter_matches_scan():
    from scipy import signal

    b, a = signal.iirfilter(4, Wn=5, fs=100, btype="low", ftype="butter")
    live = LiveLFilter(b, a)
    xs = np.sin(np.linspace(0, 6, 100)) + 0.1 * np.random.default_rng(0).normal(size=100)
    ys_live = np.array([live(x) for x in xs])
    # without jax_enable_x64 the scan runs in float32; exact agreement is
    # checked in f64 manually — here pin f32-level agreement
    ys_scan, _ = iir_filter_scan(b, a, jnp.asarray(xs, jnp.float64))
    np.testing.assert_allclose(np.asarray(ys_scan), ys_live, atol=2e-3)


def test_tools_test_env_runs():
    out = subprocess.run(
        [sys.executable, "tools/test_env.py", "--no-render", "--steps", "50"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/opt/venv/bin",
             "PYTHONPATH": "."},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Completed Execution" in out.stdout


def test_bench_policy_tool_runs():
    """tools/bench_policy.py (serving benchmark) runs standalone and emits
    one JSON row per batch width with throughput + latency fields."""
    out = subprocess.run(
        [sys.executable, "tools/bench_policy.py", "--batch", "1", "8",
         "--chain", "4", "--latency-calls", "3"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/opt/venv/bin",
             "PYTHONPATH": "."},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(line) for line in out.stdout.splitlines()
            if line.startswith("{")]
    assert [r["batch"] for r in rows] == [1, 8]
    for r in rows:
        assert r["actions_per_s"] > 0
        assert r["dispatch_ms_p50"] > 0
