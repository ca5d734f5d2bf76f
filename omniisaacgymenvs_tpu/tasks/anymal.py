"""ANYmal flat-ground velocity-command task.

Reference: tasks/anymal.py — 48-dim obs [base_lin_vel*2.0(3),
base_ang_vel*0.25(3), projected_gravity(3), commands_scaled(3),
(dof_pos-default)*1.0(12), dof_vel*0.05(12), actions(12)] (:143-172),
integrated position targets current_targets += actionScale*a*dt clamped to
limits (:183-187), velocity-tracking reward with exp(-err/0.25) kernels and
joint-acc / action-rate / cosmetic penalties, all scaled by dt=1/60
(:254-285, :93-95), fallen-over via base height < 0.51 (:283),
command resampling per reset (:213-223). Config cfg/task/Anymal.yaml
(dt 0.01, controlFrequencyInv 2, commands x[-2,2] y[-1,1] yaw[-1,1],
actionScale 13.5, episodeLength_s 50).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.models.anymal import build_anymal
from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.physics.engine import (
    PhysicsEngine,
    sim_params_from_cfg,
)
from omniisaacgymenvs_tpu.envs.views import ArticulationView
from omniisaacgymenvs_tpu.tasks.base import EnvState, RLTask


class AnymalTask(RLTask):
    name = "Anymal"
    num_obs = 48
    num_states = 0
    num_actions = 12

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        learn = env_cfg.get("learn", {})
        control = env_cfg.get("control", {})
        ranges = env_cfg.get("randomCommandVelocityRanges", {})
        sim_cfg = cfg.get("sim", {})

        self.lin_vel_scale = learn.get("linearVelocityScale", 2.0)
        self.ang_vel_scale = learn.get("angularVelocityScale", 0.25)
        self.dof_pos_scale = learn.get("dofPositionScale", 1.0)
        self.dof_vel_scale = learn.get("dofVelocityScale", 0.05)
        self.action_scale = control.get("actionScale", 13.5)
        # reference tasks/anymal.py:88-95 — scales multiplied by dt=1/60
        self.dt = 1.0 / 60.0
        self.rew_scales = {
            "lin_vel_xy": learn.get("linearVelocityXYRewardScale", 1.0) * self.dt,
            "ang_vel_z": learn.get("angularVelocityZRewardScale", 0.5) * self.dt,
            "lin_vel_z": learn.get("linearVelocityZRewardScale", -0.03) * self.dt,
            "joint_acc": learn.get("jointAccRewardScale", -0.0003) * self.dt,
            "action_rate": learn.get("actionRateRewardScale", -0.006) * self.dt,
            "cosmetic": learn.get("cosmeticRewardScale", -0.06) * self.dt,
        }
        self.command_x_range = ranges.get("linear_x", (-2.0, 2.0))
        self.command_y_range = ranges.get("linear_y", (-1.0, 1.0))
        self.command_yaw_range = ranges.get("yaw", (-1.0, 1.0))
        self.max_episode_length = int(
            learn.get("episodeLength_s", 50) / self.dt + 0.5
        )
        self.clip_obs = env_cfg.get("clipObservations", 5.0)
        self.clip_actions = env_cfg.get("clipActions", 1.0)
        self.decimation = env_cfg.get("controlFrequencyInv", 2)

        self.model = build_anymal()
        self.engine = PhysicsEngine(
            self.model,
            sim_params_from_cfg(
                sim_cfg, dt=0.01, substeps=2, gravity=(0.0, 0.0, -9.81),
            ),
        )
        self.default_dof_pos = self.model.default_q[self.model.jq0:]
        # base pose via the articulation view (reference AnymalView
        # base_below_threshold, robots/articulations/views/anymal_view.py)
        self._base_view = ArticulationView(self.model)

    # ------------------------------------------------------------------
    def initial_carry(self):
        return dict(
            commands=jnp.zeros(3),
            current_targets=self.default_dof_pos,
            last_actions=jnp.zeros(12),
            last_dof_vel=jnp.zeros(12),
        )

    def sample_reset(self, rng):
        m = self.model
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        dof_vel = jax.random.uniform(k1, (m.njd,), minval=-0.1, maxval=0.1)
        q = m.default_q
        qd = jnp.zeros(m.nv).at[m.jd0:].set(dof_vel)
        commands = jnp.stack(
            [
                jax.random.uniform(
                    k2, minval=self.command_x_range[0],
                    maxval=self.command_x_range[1],
                ),
                jax.random.uniform(
                    k3, minval=self.command_y_range[0],
                    maxval=self.command_y_range[1],
                ),
                jax.random.uniform(
                    k4, minval=self.command_yaw_range[0],
                    maxval=self.command_yaw_range[1],
                ),
            ]
        )
        carry = self.initial_carry()
        carry["commands"] = commands
        return q, qd, carry

    def control(self, action, es: EnvState):
        # reference :183-187 — integrated, clamped position targets
        targets = jnp.clip(
            es.carry["current_targets"]
            + self.action_scale * action * self.dt,
            self.model.dof_limit_lower,
            self.model.dof_limit_upper,
        )
        es.carry["current_targets"] = targets
        return self.engine.default_control().replace(pos_target=targets)

    def observe(self, phys, carry, action):
        m = self.model
        torso_rotation = phys.q[3:7]
        base_lin_vel = rot.quat_rotate_inverse(torso_rotation, phys.body_lvel[0])
        base_ang_vel = rot.quat_rotate_inverse(torso_rotation, phys.body_avel[0])
        projected_gravity = rot.quat_rotate_inverse(
            torso_rotation, jnp.array([0.0, 0.0, -1.0])
        )
        dof_pos = phys.q[m.jq0:]
        dof_vel = phys.qd[m.jd0:]
        commands_scaled = carry["commands"] * jnp.array(
            [self.lin_vel_scale, self.lin_vel_scale, self.ang_vel_scale]
        )
        obs = jnp.concatenate(
            [
                base_lin_vel * self.lin_vel_scale,
                base_ang_vel * self.ang_vel_scale,
                projected_gravity,
                commands_scaled,
                (dof_pos - self.default_dof_pos) * self.dof_pos_scale,
                dof_vel * self.dof_vel_scale,
                action,
            ]
        )
        return obs, jnp.zeros(0), carry

    def reward_done(self, obs, action, phys, carry, progress):
        m = self.model
        torso_rotation = phys.q[3:7]
        base_lin_vel = rot.quat_rotate_inverse(torso_rotation, phys.body_lvel[0])
        base_ang_vel = rot.quat_rotate_inverse(torso_rotation, phys.body_avel[0])
        dof_pos = phys.q[m.jq0:]
        dof_vel = phys.qd[m.jd0:]
        commands = carry["commands"]

        lin_vel_error = jnp.sum(
            jnp.square(commands[0:2] - base_lin_vel[0:2])
        )
        ang_vel_error = jnp.square(commands[2] - base_ang_vel[2])
        rew_lin_vel_xy = (
            jnp.exp(-lin_vel_error / 0.25) * self.rew_scales["lin_vel_xy"]
        )
        rew_ang_vel_z = (
            jnp.exp(-ang_vel_error / 0.25) * self.rew_scales["ang_vel_z"]
        )
        rew_lin_vel_z = (
            jnp.square(base_lin_vel[2]) * self.rew_scales["lin_vel_z"]
        )
        rew_joint_acc = (
            jnp.sum(jnp.square(carry["last_dof_vel"] - dof_vel))
            * self.rew_scales["joint_acc"]
        )
        rew_action_rate = (
            jnp.sum(jnp.square(carry["last_actions"] - action))
            * self.rew_scales["action_rate"]
        )
        rew_cosmetic = (
            jnp.sum(jnp.abs(dof_pos[0:4] - self.default_dof_pos[0:4]))
            * self.rew_scales["cosmetic"]
        )
        total_reward = jnp.clip(
            rew_lin_vel_xy + rew_ang_vel_z + rew_joint_acc
            + rew_action_rate + rew_cosmetic + rew_lin_vel_z,
            0.0, None,
        )
        base_pos, _ = self._base_view.get_world_poses(phys)
        fallen_over = base_pos[2] < 0.51  # reference :283 base below threshold
        total_reward = jnp.where(fallen_over, -1.0, total_reward)
        done = fallen_over | (progress >= self.max_episode_length - 1)
        carry = dict(carry, last_actions=action, last_dof_vel=dof_vel)
        return total_reward, done, carry, {}
