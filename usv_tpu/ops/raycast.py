"""Ray-cast obstacle sensor — the framework's hot kernel.

TPU-native replacement for the reference's numba ``@njit`` per-ray/per-
obstacle loop (``usv_asmc_ca_env.py:439-461``) and its ray-frame transform
(``compute_obstacle_positions``, ibid.:500-519). Instead of a scalar loop with
early exit, the whole (rays x obstacles) interaction is computed as one masked
elementwise block + a min-reduction — under ``vmap`` this becomes a single
(batch, R, K) VPU kernel with no data-dependent control flow, which is exactly
what XLA tiles well on TPU.

Geometry (identical to the reference): each sensor ray i at world angle
``psi - 2*pi/3 + i * resolution``; each obstacle j is transformed into the
ray frame as ``x' = c_i nx_j + s_i ny_j``, ``y' = s_i nx_j - c_i ny_j``
(the reference computes inv(R(angle)) then flips y — same numbers up to the
sign of y', which only enters squared). A ray hits obstacle j iff ``x' >= 0``
(in front) and ``r_j^2 - y'^2 >= 0``; the hit distance is ``x' - sqrt(...)``.

Two reduction semantics are provided:

* :func:`raycast` — true minimum over all valid obstacles (the physically
  correct lidar; the default for the new framework).
* :func:`raycast_first_hit_compat` — bit-faithful to the reference loop,
  which sorts obstacles nearest-center-first and takes the FIRST intersecting
  one with distance < max_range, then breaks (reference :442-460) — not
  necessarily the nearest intersection. Kept for exact-seed parity runs.

f32 tangency bound (measured, tests/test_raycast_pallas.py tangency suite):
the batched Pallas path behind the compat kernel defaults to the v4
lateral-offset fold, whose (r^2 - d^2) + xk^2 cancellation carries ~ulp(d^2)
into the tangency test. Against the f64 oracle over grazing-incidence scenes:
ZERO hit/miss flips for impact parameters >= 1 cm from the radius at any
range <= 100 m; at the millimeter knife edge (|b - r| = 1e-3 at d = 100)
the flip rate is ~0.2%, growing only below that (45% of scenes at 1e-4).
``fold_lateral=False`` (ops/raycast_pallas.py) is flip-free down to 1e-4 at
every range (max hit-distance error 5e-4) for runs that need it.

Obstacles use fixed capacity + validity mask (SURVEY.md §7.3): invalid slots
never hit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sensor_angles(psi, sensor_count: int, sensor_span: float = (2.0 / 3.0) * 2.0 * np.pi):
    """World-frame ray angles: psi - 2*pi/3 + i * resolution.

    Matches reference usv_asmc_ca_env.py:420-423 (note the span enters only
    through the resolution; the first ray sits at -2*pi/3 regardless).
    """
    resolution = sensor_span / sensor_count
    offsets = (-2.0 * np.pi / 3.0) + jnp.arange(sensor_count, dtype=jnp.float32) * resolution
    return psi[..., None] + offsets


def _ray_frame_hits(position, obs_xy, obs_r, obs_mask, sensor_count, sensor_span):
    """Shared geometry: returns (dist, valid) of shape (..., R, K)."""
    psi = position[..., 2]
    # cos/sin of (psi + ray_offset) via the addition identity: the per-ray
    # cos/sin are compile-time constants, so the (..., R) transcendental
    # sweeps collapse to 2 per env + FMAs (same trick as the Pallas kernel
    # v3, raycast_pallas.py)
    resolution = sensor_span / sensor_count
    base = -2.0 * np.pi / 3.0 + np.arange(sensor_count) * resolution
    ray_c = jnp.asarray(np.cos(base), jnp.float32)
    ray_s = jnp.asarray(np.sin(base), jnp.float32)
    cp = jnp.cos(psi)[..., None]
    sp = jnp.sin(psi)[..., None]
    c = cp * ray_c - sp * ray_s     # (..., R)
    s = sp * ray_c + cp * ray_s

    n = obs_xy - position[..., None, :2]  # (..., K, 2)
    nx, ny = n[..., 0], n[..., 1]

    # (..., R, K): obstacle center in each ray's frame
    x = c[..., :, None] * nx[..., None, :] + s[..., :, None] * ny[..., None, :]
    y = s[..., :, None] * nx[..., None, :] - c[..., :, None] * ny[..., None, :]

    r = obs_r[..., None, :]
    delta = r * r - y * y
    dist = x - jnp.sqrt(jnp.maximum(delta, 0.0))
    valid = (x >= 0.0) & (delta >= 0.0) & obs_mask[..., None, :]
    return dist, valid


def raycast(
    position,
    obs_xy,
    obs_r,
    obs_mask,
    sensor_count: int,
    sensor_max_range: float,
    sensor_span: float = (2.0 / 3.0) * 2.0 * np.pi,
):
    """True-min lidar distances, shape (..., R), clamped to max_range.

    position : (..., 3)  x, y, psi
    obs_xy   : (..., K, 2), obs_r/obs_mask : (..., K)
    """
    dist, valid = _ray_frame_hits(
        position, obs_xy, obs_r, obs_mask, sensor_count, sensor_span
    )
    dist = jnp.where(valid, dist, sensor_max_range)
    return jnp.min(dist, axis=-1, initial=sensor_max_range)


def raycast_first_hit_compat(
    position,
    obs_xy,
    obs_r,
    obs_mask,
    sensor_count: int,
    sensor_max_range: float,
    sensor_span: float = (2.0 / 3.0) * 2.0 * np.pi,
    boundary_distance=None,
):
    """Reference-faithful reduction: first hit in nearest-center-first order.

    ``boundary_distance`` optionally supplies the ordering key the reference
    uses (center distance minus radius, precomputed per env flavor —
    simple_env.py:204-208 vs usv_asmc_ca_env.py:229-231); defaults to
    ``hypot(obs - boat) - r``.

    Implementation note (the sort-free trick that makes this TPU-fast): the
    reference's "first intersecting obstacle in argsort(boundary) order" is
    exactly "the valid-hit obstacle with minimum boundary distance", so no
    sort or gather is needed — two masked min-reductions over (..., R, K)
    suffice. (On exact boundary-distance ties the reference breaks by array
    index while this takes the smaller hit distance; ties are measure-zero
    for randomized scenes.) An argsort+gather formulation costs ~7.4 ms/step
    at (4096, 128, 32) on TPU v5e; this formulation is ~30x cheaper.
    """
    dist, valid = _ray_frame_hits(
        position, obs_xy, obs_r, obs_mask, sensor_count, sensor_span
    )
    # Reference loop also skips hits with distance >= max_range (no break).
    valid = valid & (dist < sensor_max_range)

    if boundary_distance is None:
        n = obs_xy - position[..., None, :2]
        boundary_distance = jnp.hypot(n[..., 0], n[..., 1]) - obs_r

    key = boundary_distance[..., None, :]  # (..., 1, K) broadcast over rays
    best_key = jnp.min(
        jnp.where(valid, key, jnp.inf), axis=-1, keepdims=True
    )  # (..., R, 1)
    any_hit = jnp.isfinite(best_key[..., 0])
    picked = jnp.min(
        jnp.where(valid & (key == best_key), dist, jnp.inf), axis=-1
    )
    return jnp.where(any_hit, picked, sensor_max_range)
