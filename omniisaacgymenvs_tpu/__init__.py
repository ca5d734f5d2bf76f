"""omniisaacgymenvs_tpu: TPU-native massively-parallel RL environments.

A from-scratch JAX/XLA framework with the capabilities of OmniIsaacGymEnvs
(reference: /root/reference, NVIDIA OmniIsaacGymEnvs v1.1.0): a pure-JAX
rigid-body physics engine (generalized-coordinate articulations, PD joint
drives, penalty/impulse contacts), task logic as pure functions, co-located
PPO, and env-axis GSPMD sharding over TPU meshes.

Layer map (mirrors reference SURVEY.md §7.1):
  physics/   L1': articulation dynamics (Featherstone ABA), contacts, integrator
  models/    robot model specs (data replacing reference USD assets, robots/*)
  tasks/     L2': per-task pure functions (obs/reward/done/reset)
  envs/      L3': vectorized Env API with fused auto-reset + DR
  learn/     L4': PPO (flax/optax) with GAE, adaptive-KL LR, running norms
  parallel/  mesh/sharding utilities (env-axis GSPMD, multi-host)
  ops/       Pallas TPU kernels for hot paths
  utils/     config system, registries, logging
  scripts/   train / random_policy / play entry points (reference scripts/*)
"""

__version__ = "0.1.0"
