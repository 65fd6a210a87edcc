"""Single raycast entry point used by every env: backend + semantics dispatch.

Centralizes the auto/pallas/xla and first-hit/true-min selection that the
simple, CA, and curved envs all need (previously three divergent copies; the
curved env's copy was missing the pallas branch entirely and silently forwent
the fused-kernel speedup).
"""

from __future__ import annotations

import jax

from usv_tpu.ops.raycast import raycast, raycast_first_hit_compat


def resolve_backend(backend: str) -> str:
    if backend == "auto":
        return "xla" if jax.default_backend() in ("cpu", "gpu") else "pallas"
    return backend


def sensor_raycast(
    position,
    obs_xy,
    obs_r,
    obs_mask,
    boundary,
    sensor_count: int,
    sensor_max_range: float,
    sensor_span: float,
    strict_compat: bool = True,
    backend: str = "auto",
):
    """Per-env ray distances (R,) with the configured backend/semantics.

    ``boundary`` is the ordering key for first-hit-compat mode (center
    distance minus radius, per env flavor).
    """
    backend = resolve_backend(backend)
    if backend == "pallas":
        from usv_tpu.ops.raycast_pallas import make_raycast_compat

        fn = make_raycast_compat(
            sensor_count, sensor_max_range, sensor_span,
            first_hit=strict_compat,
        )
        return fn(position, obs_xy, obs_r, obs_mask, boundary)
    if strict_compat:
        return raycast_first_hit_compat(
            position, obs_xy, obs_r, obs_mask,
            sensor_count, sensor_max_range, sensor_span,
            boundary_distance=boundary,
        )
    return raycast(
        position, obs_xy, obs_r, obs_mask,
        sensor_count, sensor_max_range, sensor_span,
    )
