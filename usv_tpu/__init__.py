"""usv_tpu — a TPU-native USV (unmanned surface vehicle) RL environment framework.

A from-scratch JAX/XLA re-design of the capabilities of the `gym-usv` reference
suite (see /root/reference): 3-DOF Fossen-style hydrodynamics, ASMC / AITSMC /
PID inner-loop controllers, path-following guidance, ray-cast obstacle sensors,
shaped rewards, domain-randomized resets, and SAC/PPO training — all expressed
as pure jit-compiled functions over pytree state, vmapped over thousands of
lockstep environments and shardable over multi-host TPU meshes.

Subpackages
-----------
core      : angle/geometry math shared by every layer
physics   : the Fossen 3-DOF vehicle dynamics (the C++ ``DynamicModel`` analog)
control   : ASMC / PID / AITSMC controllers + substep drivers
ops       : hot kernels (ray-cast sensor), XLA-vectorized and Pallas variants
envs      : functional environment cores + auto-reset
vector    : vmapped batch layer, rollout/throughput harness
parallel  : device-mesh sharding, multi-host collectives
models    : flax policy/value networks
train     : SAC / PPO learners, replay buffer, checkpointing
compat    : gymnasium adapter classes + NumPy oracle for parity testing
utils     : path generation, streaming IIR filter, rendering
native    : C++ CPU oracle of the dynamics/controllers (ctypes-bound)
"""

__version__ = "0.1.0"
