from usv_tpu.core.angles import wrap_angle, wrap_angle_once
from usv_tpu.core.geometry import (
    rot2,
    body_to_world,
    world_to_body,
    cross_track_error,
    closest_point_on_segment,
    angle_to_point,
    map_range,
    normalize_val,
    denormalize_val,
)
