"""2-D geometry shared by guidance, sensors, and envs.

All functions are pure, elementwise/batch-transparent jnp code. Sources of the
behavior being reproduced (semantics only, re-derived here):

* cross-track error ``ye``           — reference ``simple_env.py:133-137``
* closest-point-with-progress       — reference ``simple_env.py:139-148``
* angle-to-point                    — reference ``usv_asmc_ca_env.py:405-409``
* _map/_normalize/_denormalize      — reference ``usv_asmc_ca_env.py:134-144``
* body/path rotations               — reference ``usv_asmc_env.py:376-401``
"""

import jax.numpy as jnp

from usv_tpu.core.angles import wrap_angle


def rot2(angle):
    """2x2 rotation matrix R(angle); stacks along leading batch dims."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def body_to_world(vec_xy, angle):
    """Rotate body-frame (x, y) into world frame by heading ``angle``."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, y = vec_xy[..., 0], vec_xy[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def world_to_body(vec_xy, angle):
    """Rotate world-frame (x, y) into the body frame of heading ``angle``."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, y = vec_xy[..., 0], vec_xy[..., 1]
    return jnp.stack([c * x + s * y, -s * x + c * y], axis=-1)


def cross_track_error(position_xy, path_start, path_end):
    """Signed lateral offset of ``position_xy`` from the start->end line.

    ye = -(x - x0) sin(ak) + (y - y0) cos(ak), ak = atan2 of path direction.
    Matches reference simple_env.py:133-137.
    """
    a_k = jnp.arctan2(
        path_end[..., 1] - path_start[..., 1],
        path_end[..., 0] - path_start[..., 0],
    )
    return -(position_xy[..., 0] - path_start[..., 0]) * jnp.sin(a_k) + (
        position_xy[..., 1] - path_start[..., 1]
    ) * jnp.cos(a_k)


def closest_point_on_segment(position_xy, path_start, path_end, progress, lookahead):
    """Project onto the path line, add a lookahead, clamp to monotone progress.

    Returns ``(target_xy, new_progress)`` where ``new_progress`` is the clamped
    normalized parameter ``a`` along start->end. The lookahead term and the
    monotone ``clip(a, progress, 1)`` match reference simple_env.py:139-148
    (there lookahead = (0.005 / 10) * env_bounds[1]).
    """
    d = path_end - path_start
    det = d[..., 0] * d[..., 0] + d[..., 1] * d[..., 1]
    rel = position_xy - path_start
    a = (d[..., 1] * rel[..., 1] + d[..., 0] * rel[..., 0]) / det
    a = a + lookahead
    a = jnp.clip(a, progress, 1.0)
    return path_start + a[..., None] * d, a


def angle_to_point(position_xy, heading, target_xy):
    """Bearing of ``target_xy`` relative to a boat at ``position_xy``/``heading``.

    Matches reference usv_asmc_ca_env.py:405-409.
    """
    delta = target_xy - position_xy
    return wrap_angle(jnp.arctan2(delta[..., 1], delta[..., 0]) - heading)


def map_range(x, in_min, in_max, out_min, out_max):
    """Linear range remap; reference usv_asmc_ca_env.py:134-136."""
    return (x - in_min) * (out_max - out_min) / (in_max - in_min) + out_min


def normalize_val(x, in_min, in_max):
    """Map [in_min, in_max] -> [-1, 1]; reference usv_asmc_ca_env.py:138-140."""
    return map_range(x, in_min, in_max, -1.0, 1.0)


def denormalize_val(x, out_min, out_max):
    """Map [-1, 1] -> [out_min, out_max]; reference usv_asmc_ca_env.py:142-144."""
    return map_range(x, -1.0, 1.0, out_min, out_max)
