"""Curved-path generation + obstacle placement along paths.

Re-design of reference ``gym_usv/utils/path_gen.py`` (component #17 of
SURVEY.md §2 — used by notebooks/legacy experiments, not by the envs): random
polar waypoints -> cumulative sum -> monotone cubic (PCHIP) interpolation.

Instead of a scipy ``PchipInterpolator`` object, the path here is a
:class:`PchipPath` pytree (knots + endpoint slopes) evaluated with
``searchsorted`` + cubic Hermite — pure jnp, so paths can be sampled,
evaluated, and differentiated inside jit/vmap (e.g. thousands of randomized
curved paths on device).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class PchipPath:
    """Monotone cubic Hermite path y(x) through (x, y) knots."""

    x: jnp.ndarray  # (N,) strictly increasing
    y: jnp.ndarray  # (N,)
    d: jnp.ndarray  # (N,) knot derivatives (Fritsch–Carlson)

    def __call__(self, xq):
        return pchip_eval(self, xq)

    def derivative(self, xq):
        return pchip_derivative(self, xq)


def pchip_fit(x, y) -> PchipPath:
    """Fritsch–Carlson monotone derivative estimation (PCHIP)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    h = jnp.diff(x)
    delta = jnp.diff(y) / h

    # interior derivatives: weighted harmonic mean where slopes agree in sign
    h0, h1 = h[:-1], h[1:]
    d0, d1 = delta[:-1], delta[1:]
    w1 = 2.0 * h1 + h0
    w2 = h1 + 2.0 * h0
    harmonic = (w1 + w2) / (w1 / jnp.where(d0 == 0, 1.0, d0) + w2 / jnp.where(d1 == 0, 1.0, d1))
    interior = jnp.where((d0 * d1) > 0, harmonic, 0.0)

    # endpoint derivatives: one-sided three-point formula, clipped for
    # monotonicity (standard pchip endpoint rule)
    def endpoint(h0, h1, d0, d1):
        d = ((2.0 * h0 + h1) * d0 - h0 * d1) / (h0 + h1)
        d = jnp.where(jnp.sign(d) != jnp.sign(d0), 0.0, d)
        d = jnp.where(
            (jnp.sign(d0) != jnp.sign(d1)) & (jnp.abs(d) > 3.0 * jnp.abs(d0)),
            3.0 * d0,
            d,
        )
        return d

    d_start = endpoint(h[0], h[1], delta[0], delta[1])
    d_end = endpoint(h[-1], h[-2], delta[-1], delta[-2])
    d = jnp.concatenate([d_start[None], interior, d_end[None]])
    return PchipPath(x=x, y=y, d=d)


def pchip_eval(path: PchipPath, xq):
    """Evaluate the cubic Hermite at xq (any shape), TPU-friendly.

    Interval lookup is a branch-free one-hot contraction over the N-1
    segments instead of searchsorted + gather (dynamic gathers per query are
    an order of magnitude slower on TPU for small N — measured 5.9 ms/step
    vs 0.4 ms for the curved env at 4096 vmapped envs)."""
    xq = jnp.asarray(xq)
    n = path.x.shape[0]
    # interval index = (# knots <= xq) - 1, clipped to [0, n-2]
    ge = (xq[..., None] >= path.x).astype(xq.dtype)  # (..., N)
    i = jnp.clip(jnp.sum(ge, axis=-1) - 1.0, 0.0, n - 2.0)
    onehot = (jnp.arange(n - 1, dtype=xq.dtype) == i[..., None]).astype(xq.dtype)

    def seg(v):  # select per-segment value via one-hot dot: (...,)
        return jnp.sum(onehot * v, axis=-1)

    x0 = seg(path.x[:-1])
    x1 = seg(path.x[1:])
    y0 = seg(path.y[:-1])
    y1 = seg(path.y[1:])
    d0 = seg(path.d[:-1])
    d1 = seg(path.d[1:])
    h = x1 - x0
    t = (xq - x0) / h
    h00 = (1 + 2 * t) * (1 - t) ** 2
    h10 = t * (1 - t) ** 2
    h01 = t * t * (3 - 2 * t)
    h11 = t * t * (t - 1)
    return h00 * y0 + h10 * h * d0 + h01 * y1 + h11 * h * d1


def pchip_derivative(path: PchipPath, xq):
    return jax.grad(lambda q: jnp.sum(pchip_eval(path, q)))(jnp.asarray(xq, jnp.float32))


def generate_path(
    key,
    start_point,
    num_waypoints: int,
    angle_mean: float = 0.0,
    angle_std: float = 0.50,
    length_mean: float = 3.0,
    length_std: float = 0.1,
):
    """Random polar waypoints -> cumsum -> PCHIP (reference path_gen.py:6-14).

    Returns (path, waypoints) with waypoints (N, 2).
    """
    k1, k2 = jax.random.split(key)
    angles = jnp.clip(
        angle_mean + angle_std * jax.random.normal(k1, (num_waypoints,)),
        -np.pi / 2 + 0.1,
        np.pi / 2 - 0.1,
    )
    lengths = length_mean + length_std * jax.random.normal(k2, (num_waypoints,))
    steps = lengths[:, None] * jnp.stack([jnp.cos(angles), jnp.sin(angles)], -1)
    steps = steps.at[0].set(jnp.asarray(start_point, jnp.float32))
    waypoints = jnp.cumsum(steps, axis=0)
    path = pchip_fit(waypoints[:, 0], waypoints[:, 1])
    return path, waypoints


def place_obstacles(
    key,
    path: PchipPath,
    waypoints,
    num_obs: int,
    obs_pos_std: float = 8.0,
    obs_rad_mean: float = 0.8,
    obs_rad_std: float = 0.1,
    obs_min_size: float = 0.01,
):
    """Obstacles jittered around the path (reference path_gen.py:17-38).

    Returns (obstacles (N, 3) = [x, y, r], valid_mask (N,)) — fixed shape
    with a mask instead of boolean filtering.
    """
    ks = jax.random.split(key, 4)
    min_x = jnp.min(waypoints[:, 0])
    max_x = jnp.max(waypoints[:, 0])
    base_x = jax.random.uniform(ks[0], (num_obs,), minval=min_x, maxval=max_x)
    displacement = obs_pos_std * jax.random.normal(ks[1], (num_obs,))
    deriv_offset = jax.random.uniform(
        ks[2], (num_obs,), minval=np.pi, maxval=2 * np.pi
    )
    deriv = pchip_derivative(path, base_x)
    obs_angle = jnp.arctan2(deriv, base_x) + deriv_offset
    pos = jnp.stack([base_x, pchip_eval(path, base_x)], -1) + displacement[
        :, None
    ] * jnp.stack([jnp.cos(obs_angle), jnp.sin(obs_angle)], -1)
    radius = obs_rad_mean + obs_rad_std * jax.random.normal(ks[3], (num_obs,))
    obstacles = jnp.concatenate([pos, radius[:, None]], axis=-1)
    return obstacles, radius > obs_min_size


def simplified_lookahead(path: PchipPath, waypoints, current_x, lookahead):
    """x + lookahead clamped to the path start (reference path_gen.py:50-54)."""
    x = jnp.maximum(current_x + lookahead, waypoints[0][0])
    return x, pchip_eval(path, x)


def plot_path(path: PchipPath, waypoints, obstacles, show: bool = True):
    """Matplotlib debug plot of a path + waypoints + obstacles
    (reference path_gen.py:41-47). Host-side, eval/debug only.

    Returns the matplotlib axes (and shows the figure when ``show``).
    """
    import matplotlib.pyplot as plt

    waypoints = np.asarray(waypoints)
    obstacles = np.asarray(obstacles)
    xs = np.linspace(waypoints[0, 0], waypoints[-1, 0])
    ys = np.asarray(pchip_eval(path, jnp.asarray(xs, jnp.float32)))
    _, ax = plt.subplots()
    ax.plot(xs, ys)
    ax.scatter(waypoints[:, 0], waypoints[:, 1])
    if len(obstacles):
        ax.scatter(obstacles[:, 0], obstacles[:, 1], s=obstacles[:, 2] * 10)
    if show:
        plt.show()
    return ax
