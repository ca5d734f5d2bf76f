"""ShadowHand in-hand cube reorientation.

Reference: tasks/shadow_hand.py — observation modes openai(42)/
full_no_vel(77)/full(157)/full_state(187) (:63-68, :150-280), 20 actions on
the actuated dofs, optional 187-dim asymmetric states (:80-86), fingertip
poses/velocities + force sensors in the richer modes (:119-127). The
OpenAI_FF / OpenAI_LSTM variants are config-only (same class,
reference utils/task_util.py:57-59).
"""

from __future__ import annotations

import jax.numpy as jnp

from omniisaacgymenvs_tpu.models import shadow_hand as shm
from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.physics.engine import (
    PhysicsEngine,
    sim_params_from_cfg,
)
from omniisaacgymenvs_tpu.tasks.shared.in_hand_manipulation import (
    InHandManipulationTask,
)

NUM_OBS_DICT = {"openai": 42, "full_no_vel": 77, "full": 157, "full_state": 187}


class ShadowHandTask(InHandManipulationTask):
    name = "ShadowHand"
    num_actions = 20
    fingertip_bodies = shm.FINGERTIP_BODIES
    force_torque_obs_scale = 10.0
    dr_view_name = "shadow_hand_view"  # reference ShadowHandView name

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        sim_cfg = cfg.get("sim", {})
        super().__init__(cfg)
        self.obs_type = env_cfg.get("observationType", "full")
        assert self.obs_type in NUM_OBS_DICT, self.obs_type
        self.num_obs = NUM_OBS_DICT[self.obs_type]
        self.asymmetric_obs = env_cfg.get("asymmetric_observations", False)
        self.num_states = 187 if self.asymmetric_obs else 0

        self.model = shm.build_shadow_hand(
            self_collisions=sim_cfg.get("shadow_hand", {}).get(
                "enable_self_collisions", False
            )
        )
        self.engine = PhysicsEngine(
            self.model,
            sim_params_from_cfg(
                sim_cfg, dt=1.0 / 120.0, substeps=2,
                gravity=(0.0, 0.0, -9.81),
            ),
        )
        self.goal_pos = jnp.asarray(shm.GOAL_POS)
        m = self.model
        self.actuated_dof_indices = jnp.asarray(
            sorted(m.dof_index(n) for n in shm.ACTUATED_JOINT_NAMES)
        )
        # J0 distal joints are tendon-coupled in the MODEL (force level,
        # models/shadow_hand.py add_fixed_tendon) — no target mirroring
        self.coupled_pairs = ()
        self._post_model_init()

    # ------------------------------------------------------------------
    def observe(self, phys, carry, action):
        m = self.model
        (object_pos, object_rot, object_linvel, object_angvel,
         quat_diff) = self._object_goal_obs(phys, carry)
        goal_rot = carry["goal_rot"]
        dof_pos = phys.q[jnp.asarray(m.jq_idx)]
        dof_vel = phys.qd[jnp.asarray(m.jv_idx)]
        dof_pos_scaled = rot.unscale(
            dof_pos, m.dof_limit_lower, m.dof_limit_upper
        )
        tp, tr = self.tips_view.get_world_poses(phys)
        tip_pos = tp.reshape(-1)
        tip_rot = tr.reshape(-1)
        tip_vel = self.tips_view.get_velocities(phys).reshape(-1)
        sensors = phys.sensor_forces.reshape(-1)

        if self.obs_type == "openai":
            obs = jnp.concatenate(
                [tip_pos, object_pos, quat_diff, action]
            )
        elif self.obs_type == "full_no_vel":
            obs = jnp.concatenate(
                [dof_pos_scaled, object_pos, object_rot, self.goal_pos,
                 goal_rot, quat_diff, tip_pos, action]
            )
        else:  # full / full_state
            core = jnp.concatenate(
                [
                    dof_pos_scaled,
                    self.vel_obs_scale * dof_vel,
                    object_pos, object_rot, object_linvel,
                    self.vel_obs_scale * object_angvel,
                    self.goal_pos, goal_rot, quat_diff,
                    tip_pos, tip_rot, tip_vel,
                ]
            )
            if self.obs_type == "full_state":
                obs = jnp.concatenate(
                    [core, self.force_torque_obs_scale * sensors, action]
                )
            else:
                obs = jnp.concatenate([core, action])

        if self.num_states:
            states = jnp.concatenate(
                [
                    dof_pos_scaled,
                    self.vel_obs_scale * dof_vel,
                    object_pos, object_rot, object_linvel,
                    self.vel_obs_scale * object_angvel,
                    self.goal_pos, goal_rot, quat_diff,
                    tip_pos, tip_rot, tip_vel,
                    self.force_torque_obs_scale * sensors,
                    action,
                ]
            )
        else:
            states = jnp.zeros(0)
        return obs, states, carry
