from omniisaacgymenvs_tpu.envs.vec_env import VecEnv
from omniisaacgymenvs_tpu.envs.views import ArticulationView, RigidPrimView
