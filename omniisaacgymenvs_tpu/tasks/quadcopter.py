"""Quadcopter hover task (thrust-vectoring, mixed dof+force actions).

Reference: tasks/quadcopter.py — 21-dim obs [(target-pos)/3, quat, linvel/2,
angvel/pi, dof_pos(8)] (:105-121), 12 actions: 8 integrated dof position
targets (rate 8*pi rad/s) + 4 integrated rotor thrusts (rate 100 N/s,
clamp +-2 N) applied in rotor local z rotated to world (:126-159), reward
pos + pos*(up + spin terms) (:205-227), termination dist>3 or z<0.3
(:229-239), maxEpisodeLength 500 (cfg/task/Quadcopter.yaml).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.models.flyers import build_quadcopter
from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.physics.engine import (
    PhysicsEngine,
    sim_params_from_cfg,
)
from omniisaacgymenvs_tpu.envs.views import RigidPrimView
from omniisaacgymenvs_tpu.tasks.base import EnvState, RLTask


class QuadcopterTask(RLTask):
    name = "Quadcopter"
    num_obs = 21
    num_states = 0
    num_actions = 12

    max_thrust = 2.0

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        sim_cfg = cfg.get("sim", {})
        self.max_episode_length = env_cfg.get("maxEpisodeLength", 500)
        self.clip_obs = env_cfg.get("clipObservations", 5.0)
        self.clip_actions = env_cfg.get("clipActions", 1.0)
        self.decimation = env_cfg.get("controlFrequencyInv", 1)
        self.dt = sim_cfg.get("dt", 0.01)
        self.model = build_quadcopter()
        self.engine = PhysicsEngine(
            self.model,
            sim_params_from_cfg(
                dict(sim_cfg, dt=self.dt), substeps=1,
                gravity=(0.0, 0.0, -9.81),
            ),
        )
        # rotor bundle as a view (reference QuadcopterView rotors,
        # robots/articulations/views/quadcopter_view.py)
        self._rotors = RigidPrimView(
            self.model, [f"rotor_{i}" for i in range(4)]
        )

    def initial_carry(self):
        return dict(
            target=jnp.array([0.0, 0.0, 1.0]),
            dof_targets=jnp.zeros(self.model.njd),
            thrusts=jnp.zeros(4),
        )

    def sample_reset(self, rng):
        m = self.model
        k1, k2 = jax.random.split(rng)
        dof = jax.random.uniform(k1, (m.njd,), minval=-0.2, maxval=0.2)
        noise = jax.random.uniform(
            k2, (3,),
            minval=jnp.array([-1.5, -1.5, -0.2]),
            maxval=jnp.array([1.5, 1.5, 1.5]),
        )
        q = m.default_q.at[m.jq0:].set(dof)
        q = q.at[0:3].add(noise)
        carry = self.initial_carry()
        carry["dof_targets"] = dof
        return q, jnp.zeros(m.nv), carry

    def control(self, action, es: EnvState):
        m = self.model
        dof_targets = jnp.clip(
            es.carry["dof_targets"] + self.dt * 8.0 * jnp.pi * action[0:8],
            m.dof_limit_lower, m.dof_limit_upper,
        )
        thrusts = jnp.clip(
            es.carry["thrusts"] + self.dt * 100.0 * action[8:12],
            -self.max_thrust, self.max_thrust,
        )
        es.carry["dof_targets"] = dof_targets
        es.carry["thrusts"] = thrusts
        f_local = jnp.concatenate(
            [jnp.zeros((4, 2)), thrusts[:, None]], axis=-1
        )
        ctrl = self.engine.default_control().replace(pos_target=dof_targets)
        return self._rotors.apply_forces(
            ctrl, f_local, is_global=False, state=es.phys
        )

    def observe(self, phys, carry, action):
        obs = jnp.concatenate(
            [
                (carry["target"] - phys.q[0:3]) / 3.0,
                phys.q[3:7],
                phys.body_lvel[0] / 2.0,
                phys.body_avel[0] / jnp.pi,
                phys.q[self.model.jq0:],
            ]
        )
        return obs, jnp.zeros(0), carry

    def reward_done(self, obs, action, phys, carry, progress):
        root_pos = phys.q[0:3]
        quat = phys.q[3:7]
        target_dist = jnp.linalg.norm(carry["target"] - root_pos)
        pos_reward = 1.0 / (1.0 + 3.0 * target_dist * target_dist)
        up_z = rot.quat_rotate(quat, jnp.array([0.0, 0.0, 1.0]))[2]
        tiltage = jnp.abs(1.0 - up_z)
        up_reward = 1.0 / (1.0 + 10.0 * tiltage * tiltage)
        spinnage = jnp.abs(phys.body_avel[0][2])
        spinnage_reward = 1.0 / (1.0 + 0.001 * spinnage * spinnage)
        reward = jnp.clip(
            pos_reward
            + pos_reward
            * (up_reward + spinnage_reward - spinnage * spinnage / 400.0),
            0.0, None,
        )
        done = (
            (target_dist > 3.0)
            | (root_pos[2] < 0.3)
            | (progress >= self.max_episode_length - 1)
        )
        return reward, done, carry, {}
