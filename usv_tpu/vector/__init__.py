from usv_tpu.vector.batch import BatchedEnv
from usv_tpu.vector.frames import init_frames, push_frames
from usv_tpu.vector.rollout import rollout_scan, throughput
