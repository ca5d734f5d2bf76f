"""AllegroHand in-hand cube reorientation.

Reference: tasks/allegro_hand.py — 16 actions, observation modes
full_no_vel(50)/full(72) without fingertip or sensor observations
(SURVEY.md §2.2: "same structure minus tendons/sensors").
"""

from __future__ import annotations

import jax.numpy as jnp

from omniisaacgymenvs_tpu.models import allegro_hand as alm
from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.physics.engine import (
    PhysicsEngine,
    sim_params_from_cfg,
)
from omniisaacgymenvs_tpu.tasks.shared.in_hand_manipulation import (
    InHandManipulationTask,
)

NUM_OBS_DICT = {"full_no_vel": 50, "full": 72}


class AllegroHandTask(InHandManipulationTask):
    name = "AllegroHand"
    num_actions = 16
    num_states = 0
    fingertip_bodies = alm.FINGERTIP_BODIES
    dr_view_name = "allegro_hand_view"  # reference AllegroHandView name

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        sim_cfg = cfg.get("sim", {})
        super().__init__(cfg)
        self.obs_type = env_cfg.get("observationType", "full")
        assert self.obs_type in NUM_OBS_DICT, self.obs_type
        self.num_obs = NUM_OBS_DICT[self.obs_type]

        scene = env_cfg.get("scene")  # optional authoring overrides (lab)
        self.model = alm.build_allegro_hand(scene)
        self.engine = PhysicsEngine(
            self.model,
            sim_params_from_cfg(
                sim_cfg, dt=1.0 / 120.0, substeps=2,
                gravity=(0.0, 0.0, -9.81),
            ),
        )
        _, _, goal_pos = alm.scene_frames(scene)
        self.goal_pos = jnp.asarray(goal_pos)
        self.actuated_dof_indices = jnp.arange(self.model.njd)
        self.coupled_pairs = ()
        self._post_model_init()

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
        if self.obs_type == "full_no_vel":
            obs = jnp.concatenate(
                [dof_pos_scaled, object_pos, object_rot, self.goal_pos,
                 goal_rot, quat_diff, action]
            )
        else:
            obs = jnp.concatenate(
                [
                    dof_pos_scaled, self.vel_obs_scale * dof_vel,
                    object_pos, object_rot, object_linvel,
                    self.vel_obs_scale * object_angvel,
                    self.goal_pos, goal_rot, quat_diff, action,
                ]
            )
        return obs, jnp.zeros(0), carry
