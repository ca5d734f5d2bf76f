"""Shared locomotion task (Ant/Humanoid common logic).

Reference: tasks/shared/locomotion.py — torque control
forces = actions * joint_gears * power_scale (:109), reset with +-0.2 rad
dof position / +-0.1 dof velocity noise clamped to limits (:116-143),
observation layout (:194-254):
  [torso_z(1), vel_loc(3), angvel_loc*angular_velocity_scale(3), yaw(1),
   roll(1), angle_to_target(1), up_proj(1), heading_proj(1),
   dof_pos_scaled(nd), dof_vel*dof_vel_scale(nd),
   sensor_force_torques*contact_force_scale(ns*6), actions(na)]
reward = progress + alive + up + heading - action/energy/limit costs with
death cost below termination height (:271-321), termination on height or
episode length (:257-268). Potentials use the 60 Hz control dt (:163-164)
with targets [1000, 0, 0] (:161).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.tasks.base import EnvState, RLTask


class LocomotionTask(RLTask):
    """Subclasses set: model, engine, joint_gears, motor_effort_ratio,
    num_obs/num_actions, and dof_at_limit_cost()."""

    joint_gears: jax.Array
    motor_effort_ratio: jax.Array

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        self.max_episode_length = env_cfg.get("episodeLength", 1000)
        self.dof_vel_scale = env_cfg.get("dofVelocityScale", 0.2)
        self.angular_velocity_scale = env_cfg.get("angularVelocityScale", 1.0)
        self.contact_force_scale = env_cfg.get("contactForceScale", 0.1)
        self.power_scale = env_cfg.get("powerScale", 1.0)
        self.heading_weight = env_cfg.get("headingWeight", 0.5)
        self.up_weight = env_cfg.get("upWeight", 0.1)
        self.actions_cost_scale = env_cfg.get("actionsCost", 0.005)
        self.energy_cost_scale = env_cfg.get("energyCost", 0.05)
        self.joints_at_limit_cost_scale = env_cfg.get("jointsAtLimitCost", 0.1)
        self.death_cost = env_cfg.get("deathCost", -2.0)
        self.termination_height = env_cfg.get("terminationHeight", 0.31)
        self.alive_reward_scale = env_cfg.get("alive_reward_scale", 0.5)
        self.clip_actions = env_cfg.get("clipActions", 1.0)
        self.clip_obs = env_cfg.get("clipObservations", jnp.inf)
        self.decimation = env_cfg.get("controlFrequencyInv", 2)
        # reference locomotion.py:163 — potentials always use 1/60 s
        self.dt = 1.0 / 60.0
        self.targets = jnp.array([1000.0, 0.0, 0.0])

    # ------------------------------------------------------------------
    def dof_at_limit_cost(self, obs: jax.Array) -> jax.Array:
        raise NotImplementedError

    def initial_carry(self):
        return dict(
            potentials=jnp.asarray(-1000.0 / self.dt),
            prev_potentials=jnp.asarray(-1000.0 / self.dt),
            actions=jnp.zeros(self.num_actions),
        )

    def sample_reset(self, rng: jax.Array):
        m = self.model
        k1, k2 = jax.random.split(rng)
        jq0 = m.jq0
        dof_noise = jax.random.uniform(
            k1, (m.njd,), minval=-0.2, maxval=0.2
        )
        dof_pos = jnp.clip(
            m.default_q[jq0:] + dof_noise, m.dof_limit_lower, m.dof_limit_upper
        )
        dof_vel = jax.random.uniform(k2, (m.njd,), minval=-0.1, maxval=0.1)
        q = m.default_q.at[jq0:].set(dof_pos)
        qd = jnp.zeros(m.nv).at[m.jd0:].set(dof_vel)
        carry = self.initial_carry()
        to_target = self.targets - q[0:3]
        to_target = to_target.at[2].set(0.0)
        pot = -jnp.linalg.norm(to_target) / self.dt
        carry["potentials"] = pot
        carry["prev_potentials"] = pot
        return q, qd, carry

    def control(self, action: jax.Array, es: EnvState):
        ctrl = self.engine.default_control()
        forces = action * self.joint_gears * self.power_scale
        return ctrl.replace(effort=forces)

    def observe(self, phys, carry, action):
        m = self.model
        torso_position = phys.q[0:3]
        torso_rotation = phys.q[3:7]
        velocity = phys.body_lvel[0]
        ang_velocity = phys.body_avel[0]
        dof_pos = phys.q[m.jq0:]
        dof_vel = phys.qd[m.jd0:]
        sensor_forces = phys.sensor_forces.reshape(-1)

        to_target = self.targets - torso_position
        to_target = to_target.at[2].set(0.0)
        prev_potentials = carry["potentials"]
        potentials = -jnp.linalg.norm(to_target) / self.dt

        torso_quat, up_proj, heading_proj, _, _ = rot.compute_heading_and_up(
            torso_rotation,
            rot.quat_conjugate(jnp.array([1.0, 0.0, 0.0, 0.0])),
            to_target,
            jnp.array([1.0, 0.0, 0.0]),
            jnp.array([0.0, 0.0, 1.0]),
            2,
        )
        vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target = rot.compute_rot(
            torso_quat, velocity, ang_velocity, self.targets, torso_position
        )
        dof_pos_scaled = rot.unscale(
            dof_pos, m.dof_limit_lower, m.dof_limit_upper
        )

        obs = jnp.concatenate(
            [
                torso_position[2:3],
                vel_loc,
                angvel_loc * self.angular_velocity_scale,
                rot.normalize_angle(yaw)[None],
                rot.normalize_angle(roll)[None],
                rot.normalize_angle(angle_to_target)[None],
                up_proj[None],
                heading_proj[None],
                dof_pos_scaled,
                dof_vel * self.dof_vel_scale,
                sensor_forces * self.contact_force_scale,
                action,
            ]
        )
        carry = dict(
            carry,
            potentials=potentials,
            prev_potentials=prev_potentials,
            actions=action,
        )
        return obs, jnp.zeros(0), carry

    def reward_done(self, obs, action, phys, carry, progress):
        nd = self.model.njd
        heading_proj = obs[11]
        up_proj = obs[10]
        heading_reward = jnp.where(
            heading_proj > 0.8,
            self.heading_weight,
            self.heading_weight * heading_proj / 0.8,
        )
        up_reward = jnp.where(up_proj > 0.93, self.up_weight, 0.0)
        actions_cost = jnp.sum(action**2)
        electricity_cost = jnp.sum(
            jnp.abs(action * obs[12 + nd : 12 + 2 * nd])
            * self.motor_effort_ratio
        )
        alive_reward = self.alive_reward_scale
        progress_reward = carry["potentials"] - carry["prev_potentials"]
        total_reward = (
            progress_reward
            + alive_reward
            + up_reward
            + heading_reward
            - self.actions_cost_scale * actions_cost
            - self.energy_cost_scale * electricity_cost
            - self.dof_at_limit_cost(obs)
        )
        total_reward = jnp.where(
            obs[0] < self.termination_height, self.death_cost, total_reward
        )
        done = (obs[0] < self.termination_height) | (
            progress >= self.max_episode_length - 1
        )
        return total_reward, done, carry, {}
