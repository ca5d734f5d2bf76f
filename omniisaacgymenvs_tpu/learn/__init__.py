from omniisaacgymenvs_tpu.learn.ppo import PPOConfig, PPOTrainer
