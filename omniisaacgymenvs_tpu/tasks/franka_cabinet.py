"""FrankaCabinet: open the cabinet's top drawer with a Panda arm.

Reference: tasks/franka_cabinet.py — 23-dim obs [franka dof_pos scaled to
[-1,1] (9), dof_vel*0.1 (9), grasp-to-handle vector (3), drawer pos (1),
drawer vel (1)] (:226-243), 9 actions as integrated position targets with
speed scales (fingers x0.1) and actionScale 7.5 at dt=1/60 (:244-254),
grasp-frame reward (distance^2 kernel, axis alignments, fingers around the
handle, drawer-open progress and bonuses, action penalty — :353-417),
termination when drawer opens past 0.39 m or 500 steps (:326-331), reset
with +-0.125 rad joint noise (:256-276). Uses the corrected right-finger
pose (the reference reads _lfingers for both, :217 — a noted bug,
SURVEY.md §2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.models import franka_cabinet as fcm
from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.physics.engine import (
    PhysicsEngine,
    sim_params_from_cfg,
)
from omniisaacgymenvs_tpu.tasks.base import EnvState, RLTask


def _tf_combine(q1, p1, q2, p2):
    return rot.quat_mul(q1, q2), p1 + rot.quat_rotate(q1, p2)


class FrankaCabinetTask(RLTask):
    name = "FrankaCabinet"
    num_obs = 23
    num_states = 0
    num_actions = 9

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        sim_cfg = cfg.get("sim", {})
        self.max_episode_length = env_cfg.get("episodeLength", 500)
        self.action_scale = env_cfg.get("actionScale", 7.5)
        self.dof_vel_scale = env_cfg.get("dofVelocityScale", 0.1)
        self.dist_reward_scale = env_cfg.get("distRewardScale", 2.0)
        self.rot_reward_scale = env_cfg.get("rotRewardScale", 0.5)
        self.around_handle_reward_scale = env_cfg.get("aroundHandleRewardScale", 10.0)
        self.open_reward_scale = env_cfg.get("openRewardScale", 7.5)
        self.finger_dist_reward_scale = env_cfg.get("fingerDistRewardScale", 100.0)
        self.action_penalty_scale = env_cfg.get("actionPenaltyScale", 0.01)
        self.finger_close_reward_scale = env_cfg.get("fingerCloseRewardScale", 10.0)
        self.clip_obs = env_cfg.get("clipObservations", 5.0)
        self.clip_actions = env_cfg.get("clipActions", 1.0)
        self.decimation = env_cfg.get("controlFrequencyInv", 2)
        self.dt = 1.0 / 60.0  # reference tasks/franka_cabinet.py:63

        self.num_props = env_cfg.get("numProps", 0)
        model, drawer_body = fcm.build_franka_cabinet(self.num_props)
        self.model = model
        self._drawer_body = drawer_body
        self.engine = PhysicsEngine(
            model,
            sim_params_from_cfg(
                sim_cfg, dt=1.0 / 120.0, substeps=2,
                gravity=(0.0, 0.0, -9.81),
            ),
        )
        self._hand_body = model.body_index("panda_joint7")
        self._lfinger_body = model.body_index("panda_finger_joint1")
        self._rfinger_body = model.body_index("panda_finger_joint2")
        self._drawer_dof = model.dof_index("drawer_top_joint")
        # franka dof indices are 0..8 (inserted first)
        self._franka_sl = slice(0, 9)
        self._local_grasp = jnp.asarray(fcm.GRASP_OFFSET)
        self._drawer_local_grasp = jnp.asarray(fcm.DRAWER_LOCAL_GRASP)
        self._gripper_forward = jnp.array([0.0, 0.0, 1.0])
        self._gripper_up = jnp.array([0.0, 1.0, 0.0])
        self._drawer_inward = jnp.asarray(fcm.DRAWER_INWARD_AXIS)
        self._drawer_up = jnp.asarray(fcm.DRAWER_UP_AXIS)
        self._default_dof = jnp.asarray(fcm.FRANKA_DEFAULT_DOF)
        self._speed_scales = jnp.ones(9).at[7:9].set(0.1)

    def initial_carry(self):
        m = self.model
        targets = jnp.zeros(m.njd).at[self._franka_sl].set(self._default_dof)
        return dict(dof_targets=targets)

    def sample_reset(self, rng):
        m = self.model
        noise = 0.25 * (jax.random.uniform(rng, (9,)) - 0.5)
        fr = jnp.clip(
            self._default_dof + noise,
            m.dof_limit_lower[self._franka_sl],
            m.dof_limit_upper[self._franka_sl],
        )
        q = m.default_q
        q = q.at[jnp.asarray(m.jq_idx)[self._franka_sl]].set(fr)
        # cabinet dofs zero (closed)
        cab = jnp.asarray(m.jq_idx)[9:]
        q = q.at[cab].set(0.0)
        carry = self.initial_carry()
        carry["dof_targets"] = jnp.zeros(m.njd).at[self._franka_sl].set(fr)
        return q, jnp.zeros(m.nv), carry

    def control(self, action, es: EnvState):
        m = self.model
        t = es.carry["dof_targets"]
        franka_t = jnp.clip(
            t[self._franka_sl]
            + self._speed_scales * self.dt * action * self.action_scale,
            m.dof_limit_lower[self._franka_sl],
            m.dof_limit_upper[self._franka_sl],
        )
        t = t.at[self._franka_sl].set(franka_t)
        es.carry["dof_targets"] = t
        return self.engine.default_control().replace(pos_target=t)

    def _grasp_frames(self, phys):
        hand_rot = phys.body_quat[self._hand_body]
        hand_pos = phys.body_pos[self._hand_body]
        fg_rot, fg_pos = _tf_combine(
            hand_rot, hand_pos, rot.quat_identity(), self._local_grasp
        )
        drawer_rot = phys.body_quat[self._drawer_body]
        drawer_pos = phys.body_pos[self._drawer_body]
        dg_rot, dg_pos = _tf_combine(
            drawer_rot, drawer_pos, rot.quat_identity(), self._drawer_local_grasp
        )
        return fg_rot, fg_pos, dg_rot, dg_pos

    def observe(self, phys, carry, action):
        m = self.model
        dof_pos = phys.q[jnp.asarray(m.jq_idx)[self._franka_sl]]
        dof_vel = phys.qd[jnp.asarray(m.jv_idx)[self._franka_sl]]
        lo = m.dof_limit_lower[self._franka_sl]
        hi = m.dof_limit_upper[self._franka_sl]
        dof_pos_scaled = 2.0 * (dof_pos - lo) / (hi - lo) - 1.0
        _, fg_pos, _, dg_pos = self._grasp_frames(phys)
        dq = phys.q[m.jq_idx[self._drawer_dof]]
        dqd = phys.qd[m.jv_idx[self._drawer_dof]]
        obs = jnp.concatenate(
            [
                dof_pos_scaled,
                dof_vel * self.dof_vel_scale,
                dg_pos - fg_pos,
                dq[None],
                dqd[None],
            ]
        )
        return obs, jnp.zeros(0), carry

    def reward_done(self, obs, action, phys, carry, progress):
        m = self.model
        fg_rot, fg_pos, dg_rot, dg_pos = self._grasp_frames(phys)
        lfinger_pos = phys.body_pos[self._lfinger_body]
        rfinger_pos = phys.body_pos[self._rfinger_body]
        joint_positions = phys.q[jnp.asarray(m.jq_idx)[self._franka_sl]]
        drawer_q = phys.q[m.jq_idx[self._drawer_dof]]

        d = jnp.linalg.norm(fg_pos - dg_pos)
        dist_reward = (1.0 / (1.0 + d * d)) ** 2
        dist_reward = jnp.where(d <= 0.02, dist_reward * 2.0, dist_reward)

        axis1 = rot.quat_rotate(fg_rot, self._gripper_forward)
        axis2 = rot.quat_rotate(dg_rot, self._drawer_inward)
        axis3 = rot.quat_rotate(fg_rot, self._gripper_up)
        axis4 = rot.quat_rotate(dg_rot, self._drawer_up)
        dot1 = jnp.dot(axis1, axis2)
        dot2 = jnp.dot(axis3, axis4)
        rot_reward = 0.5 * (jnp.sign(dot1) * dot1**2 + jnp.sign(dot2) * dot2**2)

        around = (lfinger_pos[2] > dg_pos[2]) & (rfinger_pos[2] < dg_pos[2])
        around_handle_reward = jnp.where(around, 0.5, 0.0)

        lfd = jnp.abs(lfinger_pos[2] - dg_pos[2])
        rfd = jnp.abs(rfinger_pos[2] - dg_pos[2])
        finger_dist_reward = jnp.where(
            around, (0.04 - lfd) + (0.04 - rfd), 0.0
        )
        finger_close_reward = jnp.where(
            d <= 0.03,
            (0.04 - joint_positions[7]) + (0.04 - joint_positions[8]),
            0.0,
        )
        action_penalty = jnp.sum(action**2)
        open_reward = drawer_q * around_handle_reward + drawer_q

        rewards = (
            self.dist_reward_scale * dist_reward
            + self.rot_reward_scale * rot_reward
            + self.around_handle_reward_scale * around_handle_reward
            + self.open_reward_scale * open_reward
            + self.finger_dist_reward_scale * finger_dist_reward
            - self.action_penalty_scale * action_penalty
            + self.finger_close_reward_scale * finger_close_reward
        )
        rewards = jnp.where(drawer_q > 0.01, rewards + 0.5, rewards)
        rewards = jnp.where(
            drawer_q > 0.2, rewards + around_handle_reward, rewards
        )
        rewards = jnp.where(
            drawer_q > 0.39, rewards + 2.0 * around_handle_reward, rewards
        )
        done = (drawer_q > 0.39) | (progress >= self.max_episode_length - 1)
        return rewards, done, carry, {}
