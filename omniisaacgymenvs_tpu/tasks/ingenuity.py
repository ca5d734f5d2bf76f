"""Ingenuity Mars helicopter hover task.

Reference: tasks/ingenuity.py — 13-dim obs [(target-pos)/3, quat(wxyz),
linvel/2, angvel/pi] (:118-127), 6 actions -> per-rotor vertical thrust
(clamped *2000*dt) with lateral components (+-0.2 fraction) applied to the
two rotor bodies in their local frames (:139-172), moving target
repositioned every 500 steps into x,y in (-1,1), z in (1,2) (:186-196),
reward pos + pos*(up + spin) (:225-249), termination on dist>20 or z<0.5
(:251-259). Mars gravity [0,0,-3.721] (cfg/task/Ingenuity.yaml).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.models.flyers import build_ingenuity
from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.physics.engine import (
    PhysicsEngine,
    sim_params_from_cfg,
)
from omniisaacgymenvs_tpu.envs.views import RigidPrimView
from omniisaacgymenvs_tpu.tasks.base import EnvState, RLTask


class IngenuityTask(RLTask):
    name = "Ingenuity"
    num_obs = 13
    num_states = 0
    num_actions = 6

    thrust_limit = 2000.0
    thrust_lateral_component = 0.2

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        sim_cfg = cfg.get("sim", {})
        self.max_episode_length = env_cfg.get("maxEpisodeLength", 2000)
        self.clip_obs = env_cfg.get("clipObservations", 5.0)
        self.clip_actions = env_cfg.get("clipActions", 1.0)
        self.decimation = env_cfg.get("controlFrequencyInv", 1)
        self.dt = sim_cfg.get("dt", 0.01)
        self.model = build_ingenuity()
        self.engine = PhysicsEngine(
            self.model,
            sim_params_from_cfg(
                dict(sim_cfg, dt=self.dt), substeps=1,
                gravity=(0.0, 0.0, -3.721),
            ),
        )
        # rotor bundle as a view (reference IngenuityView rotors,
        # robots/articulations/views/ingenuity_view.py)
        self._rotors = RigidPrimView(
            self.model, [f"rotor_physics_{i}" for i in range(2)]
        )

    def initial_carry(self):
        return dict(target=jnp.array([0.0, 0.0, 1.0]))

    def sample_reset(self, rng):
        m = self.model
        k1, k2 = jax.random.split(rng)
        dof = jax.random.uniform(k1, (m.njd,), minval=-0.2, maxval=0.2)
        pos_noise = jax.random.uniform(k2, (3,), minval=-0.5, maxval=0.5)
        q = m.default_q.at[m.jq0:].set(dof)
        q = q.at[0:3].add(pos_noise)
        return q, jnp.zeros(m.nv), self.initial_carry()

    def _sample_target(self, key):
        kxy, kz = jax.random.split(key)
        xy = jax.random.uniform(kxy, (2,), minval=-1.0, maxval=1.0)
        z = jax.random.uniform(kz, minval=1.0, maxval=2.0)
        return jnp.concatenate([xy, z[None]])

    def control(self, action, es: EnvState):
        # target repositioning every 500 steps (reference :139-141)
        key_t = jax.random.fold_in(es.rng, 7)
        new_target = self._sample_target(key_t)
        es.carry["target"] = jnp.where(
            es.progress % 500 == 0, new_target, es.carry["target"]
        )

        vert = jnp.clip(
            action[jnp.array([2, 5])] * self.thrust_limit,
            -self.thrust_limit, self.thrust_limit,
        )
        lat = jnp.clip(
            action[jnp.array([0, 1, 3, 4])] * self.thrust_lateral_component,
            -self.thrust_lateral_component, self.thrust_lateral_component,
        ).reshape(2, 2)
        thrust_local = jnp.concatenate(
            [vert[:, None] * lat, (self.dt * vert)[:, None]], axis=-1
        )
        thrust_local = thrust_local.at[:, 0:2].multiply(self.dt)
        # local -> world via the rotor bodies' rotations (view)
        return self._rotors.apply_forces(
            self.engine.default_control(), thrust_local,
            is_global=False, state=es.phys,
        )

    def observe(self, phys, carry, action):
        obs = jnp.concatenate(
            [
                (carry["target"] - phys.q[0:3]) / 3.0,
                phys.q[3:7],
                phys.body_lvel[0] / 2.0,
                phys.body_avel[0] / jnp.pi,
            ]
        )
        return obs, jnp.zeros(0), carry

    def reward_done(self, obs, action, phys, carry, progress):
        root_pos = phys.q[0:3]
        quat = phys.q[3:7]
        target_dist = jnp.linalg.norm(carry["target"] - root_pos)
        pos_reward = 1.0 / (1.0 + 2.5 * target_dist * target_dist)
        up_z = rot.quat_rotate(quat, jnp.array([0.0, 0.0, 1.0]))[2]
        tiltage = jnp.abs(1.0 - up_z)
        up_reward = 1.0 / (1.0 + 30.0 * tiltage * tiltage)
        spinnage = jnp.abs(phys.body_avel[0][2])
        spinnage_reward = 1.0 / (1.0 + 10.0 * spinnage * spinnage)
        reward = pos_reward + pos_reward * (up_reward + spinnage_reward)
        done = (
            (target_dist > 20.0)
            | (root_pos[2] < 0.5)
            | (progress >= self.max_episode_length - 1)
        )
        return reward, done, carry, {}
