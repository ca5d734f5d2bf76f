"""Humanoid locomotion task.

Reference: tasks/humanoid.py — 87-dim obs / 21 actions, per-joint gear table
(:82-107), motor_effort_ratio = gears/max(gears) (:108-109), dof-at-limit
cost scaled by motor effort ratio beyond 0.98 of range (:120-127); env
params from cfg/task/Humanoid.yaml (powerScale 1.0, actionsCost 0.01,
dofVelocityScale 0.1, angularVelocityScale 0.25, contactForceScale 0.01,
jointsAtLimitCost 0.25, deathCost -1, terminationHeight 0.8,
alive_reward_scale 2.0, 4096 envs default).
"""

from __future__ import annotations

import jax.numpy as jnp

from omniisaacgymenvs_tpu.models.humanoid import (
    HUMANOID_JOINT_GEARS,
    build_humanoid,
)
from omniisaacgymenvs_tpu.physics.engine import (
    PhysicsEngine,
    sim_params_from_cfg,
)
from omniisaacgymenvs_tpu.tasks.shared.locomotion import LocomotionTask


class HumanoidLocomotionTask(LocomotionTask):
    name = "Humanoid"
    num_obs = 87
    num_states = 0
    num_actions = 21

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        defaults = dict(
            powerScale=1.0, headingWeight=0.5, upWeight=0.1,
            actionsCost=0.01, energyCost=0.05, dofVelocityScale=0.1,
            angularVelocityScale=0.25, contactForceScale=0.01,
            jointsAtLimitCost=0.25, deathCost=-1.0, terminationHeight=0.8,
            alive_reward_scale=2.0, episodeLength=1000,
            clipActions=1.0, controlFrequencyInv=2,
        )
        env_cfg = {**defaults, **cfg.get("env", {})}
        super().__init__({**cfg, "env": env_cfg})
        sim_cfg = cfg.get("sim", {})
        self.model = build_humanoid()
        self.engine = PhysicsEngine(
            self.model,
            sim_params_from_cfg(
                sim_cfg, dt=1.0 / 120.0, substeps=2,
                gravity=(0.0, 0.0, -9.81),
            ),
        )
        self.joint_gears = jnp.asarray(HUMANOID_JOINT_GEARS)
        self.motor_effort_ratio = self.joint_gears / jnp.max(self.joint_gears)

    def dof_at_limit_cost(self, obs):
        # reference tasks/humanoid.py:120-127
        d = obs[12 : 12 + self.model.njd]
        scaled_cost = (
            self.joints_at_limit_cost_scale * (jnp.abs(d) - 0.98) / 0.02
        )
        return jnp.sum(
            (jnp.abs(d) > 0.98) * scaled_cost * self.motor_effort_ratio
        )
