from usv_tpu.ops.raycast import (
    sensor_angles,
    raycast,
    raycast_first_hit_compat,
)
