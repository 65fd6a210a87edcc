"""Direct rgb_array content checks for every renderer (VERDICT r3 next-#8).

Each renderer must produce a frame that is non-blank AND carries the
expected scene signatures at known state: boat pixels (black polygon),
obstacle pixels (red family), target marker (blue family), sensor rays
(green family), path line (gray) — the colors each draw path commits to
(usv_tpu/utils/viz.py). A blank or garbled frame fails these tests.

Reference counterparts: usv_ca_renderer.py:134-211 (boat polygon :86-96,
obstacles :98-102, rays :39-52), pygame_plotter.py:9-33.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

pygame = pytest.importorskip("pygame")

from usv_tpu.envs import make  # noqa: E402
from usv_tpu.utils import viz  # noqa: E402


def _counts(frame):
    """Pixel counts by signature color family."""
    frame = np.asarray(frame)
    assert frame.ndim == 3 and frame.shape[2] == 3 and frame.dtype == np.uint8
    r = frame[..., 0].astype(int)
    g = frame[..., 1].astype(int)
    b = frame[..., 2].astype(int)
    return dict(
        non_white=int(np.sum(~((r > 240) & (g > 240) & (b > 240)))),
        black=int(np.sum((r < 60) & (g < 60) & (b < 60))),
        red=int(np.sum((r > 150) & (g < 90) & (b < 90))),
        green=int(np.sum((g > 150) & (r < 90) & (b < 90))),
        blue=int(np.sum((b > 150) & (r < 90) & (g < 90))),
    )


def _nearest_nonwhite(frame, px, py, radius=12):
    """True if any non-white pixel lies within ``radius`` of (px, py)."""
    frame = np.asarray(frame)
    h, w = frame.shape[:2]
    x0, x1 = max(0, int(px - radius)), min(w, int(px + radius))
    y0, y1 = max(0, int(py - radius)), min(h, int(py + radius))
    tile = frame[y0:y1, x0:x1]
    return bool(np.any(np.any(tile < 240, axis=-1)))


def test_simple_renderer_content():
    """SimpleEnvRenderer (the flagship env's renderer, reference
    simple_env_visualizer.py:17-113): boat dot, target marker, sensor
    rays, obstacle, and path line must land where the state says they are
    — a blank white 512x512 frame must fail (VERDICT r4 next-#5)."""
    import jax.numpy as jnp

    handle = make("usv-simple")
    cfg = handle.cfg
    state = handle.reset(cfg, jax.random.key(5))

    cap = state.obs_r.shape[0]
    obs_xy = np.zeros((cap, 2), np.float32)
    obs_r = np.ones((cap,), np.float32)
    mask = np.zeros((cap,), bool)
    obs_xy[0] = (14.0, 6.0)
    obs_r[0] = 1.5
    mask[0] = True
    state = state.replace(
        position=jnp.asarray([5.0, 8.0, 0.3]),
        target_position=jnp.asarray([16.0, 14.0]),
        path_start=jnp.asarray([2.0, 2.0]),
        path_end=jnp.asarray([18.0, 18.0]),
        obs_xy=jnp.asarray(obs_xy), obs_r=jnp.asarray(obs_r),
        obs_mask=jnp.asarray(mask),
        sensor_dist=jnp.full((cfg.sensor_count,), 4.0, jnp.float32),
    )

    rend = viz.SimpleEnvRenderer(render_mode="rgb_array", window_size=400)
    frame = rend.render_state(cfg, state)
    rend.close()

    c = _counts(frame)
    assert c["non_white"] > 300, f"frame nearly blank: {c}"
    assert c["black"] > 10, f"no boat pixels: {c}"
    assert c["red"] > 30, f"no obstacle pixels: {c}"
    assert c["green"] > 100, f"no sensor-ray pixels: {c}"
    assert c["blue"] > 20, f"no target pixels: {c}"
    # the gray path polyline: mid-intensity, chromatically neutral pixels
    fr = np.asarray(frame).astype(int)
    gray = np.sum(
        (np.abs(fr[..., 0] - fr[..., 1]) < 12)
        & (np.abs(fr[..., 1] - fr[..., 2]) < 12)
        & (fr[..., 0] > 80) & (fr[..., 0] < 200)
    )
    assert gray > 50, f"no path-line pixels (gray={gray})"

    # positional checks: world -> screen as the renderer maps them
    # (scale = window / env_bound, no offset)
    scale = 400 / cfg.env_bound
    for wx, wy in ((5.0, 8.0), (14.0, 6.0), (16.0, 14.0)):
        assert _nearest_nonwhite(frame, wx * scale, wy * scale), (
            f"nothing drawn near ({wx},{wy})"
        )


def test_ca_renderer_content_direct():
    """CaEnvRenderer drawn directly (not via the adapter): boat, obstacles,
    rays, and target must land where the state says they are."""
    handle = make("usv-asmc-ca-v0")
    cfg = handle.cfg
    state = handle.reset(cfg, jax.random.key(0))
    # a deterministic scene: boat at origin-ish, one big obstacle, target
    import jax.numpy as jnp

    cap = cfg.obstacle_cap
    obs_xy = np.zeros((cap, 2), np.float32)
    obs_r = np.ones((cap,), np.float32)
    mask = np.zeros((cap,), bool)
    obs_xy[0] = (10.0, 5.0)
    obs_r[0] = 2.0
    mask[0] = True
    state = state.replace(
        dyn=state.dyn.replace(pose=jnp.asarray([0.0, -5.0, 0.3])),
        target_point=jnp.asarray([20.0, 8.0]),
        obs_xy=jnp.asarray(obs_xy), obs_r=jnp.asarray(obs_r),
        obs_mask=jnp.asarray(mask),
        sensor_dist=jnp.full((cfg.sensor_num,), 30.0, jnp.float32),
    )

    rend = viz.CaEnvRenderer(render_mode="rgb_array", window_size=400)
    frame = rend.render_state(cfg, state)
    rend.close()

    c = _counts(frame)
    assert c["non_white"] > 200, f"frame nearly blank: {c}"
    assert c["black"] > 10, f"no boat polygon pixels: {c}"
    assert c["red"] > 30, f"no obstacle pixels: {c}"
    assert c["green"] > 100, f"no sensor-ray pixels: {c}"
    assert c["blue"] > 20, f"no target pixels: {c}"

    # positional checks: world -> screen as the renderer maps them
    window = 400
    scale = window / max(cfg.max_x - cfg.min_x, cfg.max_y - cfg.min_y)
    for wx, wy in ((0.0, -5.0), (10.0, 5.0), (20.0, 8.0)):
        px = (wx - cfg.min_x) * scale
        py = (wy - cfg.min_y) * scale
        assert _nearest_nonwhite(frame, px, py), f"nothing drawn near ({wx},{wy})"


def test_ca_renderer_debug_overlay_and_plots():
    """The opt-in debug text overlay + scrolling plots (the features the
    reference wrote but disabled, usv_ca_renderer.py:179-198) must add
    pixels when enabled."""
    handle = make("usv-asmc-ca-v0")
    cfg = handle.cfg
    state = handle.reset(cfg, jax.random.key(1))

    base = viz.CaEnvRenderer(render_mode="rgb_array", window_size=300)
    plain = base.render_state(cfg, state)
    base.close()

    rend = viz.CaEnvRenderer(
        render_mode="rgb_array", window_size=300,
        show_debug_vars=True, renderplots=True,
    )
    for i in range(30):
        rend.track_plot("e_u", np.sin(0.3 * i))
    overlay = rend.render_state(cfg, state, debug_vars={"e_u": 0.123})
    rend.close()

    assert _counts(overlay)["non_white"] > _counts(plain)["non_white"] + 50


def test_curved_renderer_content():
    """CurvedEnvRenderer: PCHIP path polyline, waypoints, boat, rays."""
    handle = make("usv-curved-aitsmc")
    cfg = handle.cfg
    state = handle.reset(cfg, jax.random.key(2))

    rend = viz.CurvedEnvRenderer(render_mode="rgb_array", window_size=400)
    frame = rend.render_state(cfg, state)
    rend.close()

    c = _counts(frame)
    assert c["non_white"] > 300, f"frame nearly blank: {c}"
    assert c["black"] > 5, f"no boat polygon: {c}"
    assert c["blue"] > 10, f"no waypoint markers: {c}"
    assert c["green"] > 50, f"no sensor rays: {c}"
    # the gray path polyline: mid-intensity, chromatically neutral pixels
    fr = np.asarray(frame).astype(int)
    gray = np.sum(
        (np.abs(fr[..., 0] - fr[..., 1]) < 12)
        & (np.abs(fr[..., 1] - fr[..., 2]) < 12)
        & (fr[..., 0] > 80) & (fr[..., 0] < 200)
    )
    assert gray > 50, f"no path polyline pixels (gray={gray})"


def test_legacy_renderer_content():
    """LegacyEnvRenderer: path line, lookahead target, boat polygon."""
    handle = make("usv-asmc-v0")
    cfg = handle.cfg
    state = handle.reset(cfg, jax.random.key(3))

    rend = viz.LegacyEnvRenderer(render_mode="rgb_array", window_size=300)
    frame = rend.render_state(cfg, state)
    rend.close()

    c = _counts(frame)
    assert c["non_white"] > 100, f"frame nearly blank: {c}"
    assert c["black"] > 5, f"no boat polygon: {c}"
    assert c["blue"] > 10, f"no target marker: {c}"


def test_render_plot_draws_waveform():
    """render_plot (reference pygame_plotter.py:9-33): the polyline must
    span the requested box and follow the data's extremes."""
    from collections import deque

    pygame.init()
    surface = pygame.Surface((200, 100))
    surface.fill((255, 255, 255))
    data = deque(np.sin(np.linspace(0, 4 * np.pi, 60)))
    viz.render_plot(surface, data, pos=(20, 10), size=(160, 80), color=(0, 0, 0))
    frame = np.transpose(np.array(pygame.surfarray.pixels3d(surface)), (1, 0, 2))

    dark = np.argwhere(np.all(frame < 60, axis=-1))
    assert len(dark) > 100, "no polyline pixels"
    ys, xs = dark[:, 0], dark[:, 1]
    # spans the requested box horizontally and vertically (waveform hits
    # both extremes), and stays inside it (+line-width slack)
    assert xs.min() <= 24 and xs.max() >= 172
    assert ys.min() <= 14 and ys.max() >= 82
    assert xs.min() >= 18 and xs.max() <= 182 and ys.min() >= 8 and ys.max() <= 92


def test_render_plot_flat_and_short_data_safe():
    """Degenerate inputs: constant data (zero span) draws without dividing
    by zero; <2 samples is a silent no-op (reference behavior)."""
    from collections import deque

    pygame.init()
    surface = pygame.Surface((100, 60))
    surface.fill((255, 255, 255))
    viz.render_plot(surface, deque([1.0]), pos=(5, 5), size=(90, 50))
    frame = np.transpose(np.array(pygame.surfarray.pixels3d(surface)), (1, 0, 2))
    assert np.all(frame == 255), "single sample must draw nothing"

    viz.render_plot(surface, deque([2.0, 2.0, 2.0]), pos=(5, 5), size=(90, 50))
    frame = np.transpose(np.array(pygame.surfarray.pixels3d(surface)), (1, 0, 2))
    assert np.any(frame < 255), "flat data should still draw its line"
