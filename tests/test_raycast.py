"""Ray-cast sensor kernel tests, including parity vs an independent NumPy
re-implementation of the reference's scalar loop semantics
(usv_asmc_ca_env.py:411-461, compute_obstacle_positions :500-519)."""

import jax
import jax.numpy as jnp
import numpy as np

from usv_tpu.ops.raycast import raycast, raycast_first_hit_compat, sensor_angles

SPAN = (2.0 / 3.0) * 2.0 * np.pi


def numpy_reference_raycast(position, obs_xy, obs_r, sensor_count, max_range):
    """Scalar-loop oracle with the reference's exact semantics: obstacles
    sorted nearest-boundary-first, first intersecting obstacle wins, break."""
    x, y, psi = position
    res = SPAN / sensor_count
    angles = -2 * np.pi / 3 + np.arange(sensor_count) * res + psi
    boundary = np.hypot(obs_xy[:, 0] - x, obs_xy[:, 1] - y) - obs_r
    order = np.argsort(boundary)
    out = np.full(sensor_count, max_range, dtype=np.float64)
    for i, ang in enumerate(angles):
        c, s = np.cos(ang), np.sin(ang)
        for j in order:
            nx, ny = obs_xy[j, 0] - x, obs_xy[j, 1] - y
            ox = c * nx + s * ny
            oy = s * nx - c * ny
            if ox < 0:
                continue
            delta = obs_r[j] ** 2 - oy ** 2
            if delta < 0:
                continue
            d = ox - np.sqrt(delta)
            if d < max_range:
                out[i] = min(d, max_range)
                break
    return out


def _random_scene(rng, n_obs=20):
    position = np.array([rng.uniform(0, 20), rng.uniform(0, 20), rng.uniform(-np.pi, np.pi)])
    obs_xy = rng.uniform(0, 20, size=(n_obs, 2))
    obs_r = rng.uniform(0.15, 0.5, size=n_obs)
    return position, obs_xy, obs_r


def test_compat_mode_matches_reference_loop():
    rng = np.random.default_rng(42)
    for _ in range(10):
        position, obs_xy, obs_r = _random_scene(rng)
        want = numpy_reference_raycast(position, obs_xy, obs_r, 128, 100.0)
        got = raycast_first_hit_compat(
            jnp.asarray(position, jnp.float32),
            jnp.asarray(obs_xy, jnp.float32),
            jnp.asarray(obs_r, jnp.float32),
            jnp.ones(len(obs_r), dtype=bool),
            128,
            100.0,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_true_min_never_exceeds_compat():
    rng = np.random.default_rng(7)
    for _ in range(5):
        position, obs_xy, obs_r = _random_scene(rng)
        args = (
            jnp.asarray(position, jnp.float32),
            jnp.asarray(obs_xy, jnp.float32),
            jnp.asarray(obs_r, jnp.float32),
            jnp.ones(len(obs_r), dtype=bool),
            64,
            100.0,
        )
        true_min = np.asarray(raycast(*args))
        compat = np.asarray(raycast_first_hit_compat(*args))
        assert np.all(true_min <= compat + 1e-5)


def test_masked_obstacles_are_invisible():
    position = jnp.asarray([0.0, 0.0, 0.0])
    obs_xy = jnp.asarray([[5.0, 0.0], [3.0, 0.0]])
    obs_r = jnp.asarray([1.0, 1.0])
    # Only the farther obstacle is valid
    mask = jnp.asarray([True, False])
    d = raycast(position, obs_xy, obs_r, mask, 128, 100.0)
    # forward ray should see the valid obstacle at ~4.0, not the masked at ~2.0
    assert abs(float(jnp.min(d)) - 4.0) < 0.05

    no_mask = jnp.asarray([False, False])
    d2 = raycast(position, obs_xy, obs_r, no_mask, 128, 100.0)
    assert float(jnp.min(d2)) == 100.0


def test_obstacle_behind_is_ignored():
    position = jnp.asarray([0.0, 0.0, 0.0])
    # span is 240 deg, so directly behind (180 deg) is outside every ray's
    # half-space only when x' < 0 for all rays that could see it; an obstacle
    # straight behind at x=-5 must produce x' < 0 for the forward rays.
    obs_xy = jnp.asarray([[-5.0, 0.0]])
    obs_r = jnp.asarray([0.5])
    d = raycast(position, obs_xy, obs_r, jnp.asarray([True]), 16, 100.0)
    # rays at +-120 deg CAN see things behind-ish; check the straight-back
    # obstacle is only visible to rays whose |angle| > 90 deg.
    angles = np.asarray(sensor_angles(jnp.asarray(0.0), 16))
    visible = np.asarray(d) < 100.0
    assert not np.any(visible[np.abs(angles) < np.pi / 2])


def test_batch_vmap_consistency():
    rng = np.random.default_rng(3)
    B = 8
    scenes = [_random_scene(rng) for _ in range(B)]
    pos = jnp.asarray(np.stack([s[0] for s in scenes]), jnp.float32)
    oxy = jnp.asarray(np.stack([s[1] for s in scenes]), jnp.float32)
    orr = jnp.asarray(np.stack([s[2] for s in scenes]), jnp.float32)
    mask = jnp.ones((B, 20), dtype=bool)
    batched = jax.jit(
        lambda p, o, r, m: raycast(p, o, r, m, 32, 100.0)
    )(pos, oxy, orr, mask)
    for i in range(B):
        single = raycast(pos[i], oxy[i], orr[i], mask[i], 32, 100.0)
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), rtol=1e-6
        )
