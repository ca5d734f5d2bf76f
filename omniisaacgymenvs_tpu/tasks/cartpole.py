"""Cartpole balancing task.

Reference: tasks/cartpole.py — obs [cart_pos, cart_vel, pole_pos, pole_vel]
(:80-99), effort control forces = maxEffort * action (:108-112), reward
1 - pole^2 - 0.01|cart_vel| - 0.005|pole_vel| with -2 beyond bounds
(:143-153), termination on |cart|>resetDist, |pole|>pi/2, 500 steps
(:155-162), reset with U(-1,1) m cart / U(-pi/8,pi/8) pole positions and
U(-0.5,0.5) / U(-pi/4... 0.25pi) velocities (:114-134).
Config: cfg/task/Cartpole.yaml (dt 1/120, controlFrequencyInv 2,
clipObservations 5.0, clipActions 1.0, resetDist 3.0, maxEffort 400).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.models.cartpole import build_cartpole
from omniisaacgymenvs_tpu.physics.engine import (
    PhysicsEngine,
    sim_params_from_cfg,
)
from omniisaacgymenvs_tpu.tasks.base import EnvState, RLTask


class CartpoleTask(RLTask):
    name = "Cartpole"
    num_obs = 4
    num_states = 0
    num_actions = 1
    max_episode_length = 500

    @property
    def timeout_progress(self) -> int:
        # Cartpole terminates by time at `progress >= max_episode_length`
        # (reference tasks/cartpole.py:155-160), one step later than the
        # other tasks' `- 1` convention
        return self.max_episode_length

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        sim_cfg = cfg.get("sim", {})
        self.reset_dist = env_cfg.get("resetDist", 3.0)
        self.max_push_effort = env_cfg.get("maxEffort", 400.0)
        self.clip_obs = env_cfg.get("clipObservations", 5.0)
        self.clip_actions = env_cfg.get("clipActions", 1.0)
        self.decimation = env_cfg.get("controlFrequencyInv", 2)
        self.model = build_cartpole()
        self.engine = PhysicsEngine(
            self.model,
            sim_params_from_cfg(
                sim_cfg, dt=1.0 / 120.0, substeps=1,
                gravity=(0.0, 0.0, -9.81),
            ),
        )
        self._cart_dof = self.model.dof_index("cartJoint")
        self._pole_dof = self.model.dof_index("poleJoint")

    # ------------------------------------------------------------------
    def sample_reset(self, rng: jax.Array):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        q = jnp.zeros(self.model.nq)
        q = q.at[self._cart_dof].set(
            jax.random.uniform(k1, minval=-1.0, maxval=1.0)
        )
        q = q.at[self._pole_dof].set(
            0.125 * jnp.pi * jax.random.uniform(k2, minval=-1.0, maxval=1.0)
        )
        qd = jnp.zeros(self.model.nv)
        qd = qd.at[self._cart_dof].set(
            0.5 * jax.random.uniform(k3, minval=-1.0, maxval=1.0)
        )
        qd = qd.at[self._pole_dof].set(
            0.25 * jnp.pi * jax.random.uniform(k4, minval=-1.0, maxval=1.0)
        )
        return q, qd, ()

    def control(self, action: jax.Array, es: EnvState):
        ctrl = self.engine.default_control()
        effort = jnp.zeros(self.model.njd).at[self._cart_dof].set(
            self.max_push_effort * action[0]
        )
        return ctrl.replace(effort=effort)

    def observe(self, phys, carry, action):
        obs = jnp.stack(
            [
                phys.q[self._cart_dof],
                phys.qd[self._cart_dof],
                phys.q[self._pole_dof],
                phys.qd[self._pole_dof],
            ]
        )
        return obs, jnp.zeros(0), carry

    def reward_done(self, obs, action, phys, carry, progress):
        cart_pos, cart_vel, pole_angle, pole_vel = obs[0], obs[1], obs[2], obs[3]
        reward = (
            1.0
            - pole_angle * pole_angle
            - 0.01 * jnp.abs(cart_vel)
            - 0.005 * jnp.abs(pole_vel)
        )
        out = (jnp.abs(cart_pos) > self.reset_dist) | (
            jnp.abs(pole_angle) > jnp.pi / 2
        )
        reward = jnp.where(out, -2.0, reward)
        done = out | (progress >= self.max_episode_length)
        return reward, done, carry, {}
