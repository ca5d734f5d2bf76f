from omniisaacgymenvs_tpu.envs.vec_env import VecEnv
