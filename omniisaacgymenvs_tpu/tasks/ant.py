"""Ant locomotion task.

Reference: tasks/ant.py — 60-dim obs / 8 actions, joint gears all 15 (:80),
dof-at-limit cost = count of |scaled dof pos| > 0.99 (:92-95); env params
from cfg/task/Ant.yaml (powerScale 0.5, terminationHeight 0.31, deathCost
-2, dofVelocityScale 0.2, contactForceScale 0.1, dt 1/120 @
controlFrequencyInv 2, 4096 envs default).
"""

from __future__ import annotations

import jax.numpy as jnp

from omniisaacgymenvs_tpu.models.ant import ANT_JOINT_GEARS, build_ant
from omniisaacgymenvs_tpu.physics.engine import (
    PhysicsEngine,
    sim_params_from_cfg,
)
from omniisaacgymenvs_tpu.tasks.shared.locomotion import LocomotionTask


class AntLocomotionTask(LocomotionTask):
    name = "Ant"
    num_obs = 60
    num_states = 0
    num_actions = 8

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        defaults = dict(
            powerScale=0.5, headingWeight=0.5, upWeight=0.1,
            actionsCost=0.005, energyCost=0.05, dofVelocityScale=0.2,
            angularVelocityScale=1.0, contactForceScale=0.1,
            jointsAtLimitCost=0.1, deathCost=-2.0, terminationHeight=0.31,
            alive_reward_scale=0.5, episodeLength=1000,
            clipActions=1.0, controlFrequencyInv=2,
        )
        env_cfg = {**defaults, **cfg.get("env", {})}
        super().__init__({**cfg, "env": env_cfg})
        sim_cfg = cfg.get("sim", {})
        self.model = build_ant()
        self.engine = PhysicsEngine(
            self.model,
            sim_params_from_cfg(
                sim_cfg, dt=1.0 / 120.0, substeps=2,
                gravity=(0.0, 0.0, -9.81),
            ),
        )
        self.joint_gears = jnp.asarray(ANT_JOINT_GEARS)
        self.motor_effort_ratio = jnp.ones(8)

    def dof_at_limit_cost(self, obs):
        # reference tasks/ant.py:92-95
        return jnp.sum(
            (obs[12 : 12 + self.model.njd] > 0.99).astype(jnp.float32)
        )
