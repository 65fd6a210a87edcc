"""Angle wrapping primitives.

The reference uses two distinct wraps that differ at exactly |angle| == pi and
for |angle| > 3*pi (single-branch wrap doesn't iterate):

* atan2-style wrap (reference ``simple_env.py:63-65``): maps to (-pi, pi],
  total and branch-free — the default everywhere here.
* "wrap once" branch style (reference ``usv_asmc_env.py:124``):
  ``where(|a| > pi, sign(a) * (|a| - 2*pi), a)`` — only correct for
  |a| < 3*pi, kept for exact parity with the legacy envs and the ASMC
  heading-error path (``control/usv_asmc.py:120``).

Both are elementwise and batch-transparent (work on any array shape).
"""

import jax.numpy as jnp


def wrap_angle(angle):
    """Wrap to (-pi, pi] via atan2(sin, cos). Reference simple_env.py:63-65."""
    return jnp.arctan2(jnp.sin(angle), jnp.cos(angle))


def wrap_angle_once(angle):
    """Single-branch wrap: subtract one full turn if |angle| > pi.

    Exact replica of the legacy branch wrap (reference usv_asmc_env.py:124,
    control/usv_asmc.py:120); differs from :func:`wrap_angle` for |a| >= 3*pi
    and at the boundary |a| == pi.
    """
    return jnp.where(
        jnp.abs(angle) > jnp.pi,
        jnp.sign(angle) * (jnp.abs(angle) - 2.0 * jnp.pi),
        angle,
    )
