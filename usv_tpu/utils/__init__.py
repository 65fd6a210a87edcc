from usv_tpu.utils.path_gen import (
    generate_path,
    place_obstacles,
    plot_path,
    simplified_lookahead,
)
from usv_tpu.utils.live_filter import LiveLFilter, iir_filter_scan
