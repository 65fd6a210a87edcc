from usv_tpu.train.buffer import ReplayBuffer, buffer_add_batch, buffer_init, buffer_sample
from usv_tpu.train.sac import SacConfig, SacLearner
from usv_tpu.train.ppo import PpoConfig, PpoLearner
from usv_tpu.train.policy import Policy, export_policy, load_policy
