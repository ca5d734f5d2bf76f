"""Crazyflie hover task with first-order motor lag.

Reference: tasks/crazyflie.py — 18-dim obs [target-pos, rot_x, rot_y,
rot_z, linvel, angvel] (:151-176), 4 thrust actions filtered through a
rotor-speed-domain first-order lag (tau_up/tau_down = 4*dt/0.15) with
multiplicative thrust noise (:179-225), per-motor max thrust
g*m*thrust_to_weight/4 with m=0.028, t/w=1.9 (:89-97), forces rotated by
the ROOT attitude and applied at the 4 rotor bodies (:227-261), reward
pos + pos*(up + spin) - effort (:319-352), termination dist>5, z outside
(0.5, 5), flipped (up_z<0) (:366-378), per-term episode sums logged to
extras (:111-115, :354-364). maxEpisodeLength 700.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.models.flyers import build_crazyflie
from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.physics.engine import (
    PhysicsEngine,
    sim_params_from_cfg,
)
from omniisaacgymenvs_tpu.envs.views import RigidPrimView
from omniisaacgymenvs_tpu.tasks.base import EnvState, RLTask

_EPS = 1e-6


class CrazyflieTask(RLTask):
    name = "Crazyflie"
    num_obs = 18
    num_states = 0
    num_actions = 4

    mass = 0.028
    thrust_to_weight = 1.9
    motor_damp_time = 0.15

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        sim_cfg = cfg.get("sim", {})
        self.max_episode_length = env_cfg.get("maxEpisodeLength", 700)
        self.clip_obs = env_cfg.get("clipObservations", 5.0)
        self.clip_actions = env_cfg.get("clipActions", 1.0)
        self.decimation = env_cfg.get("controlFrequencyInv", 1)
        self.dt = sim_cfg.get("dt", 0.01)
        gravity = tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81)))
        self.model = build_crazyflie()
        self.engine = PhysicsEngine(
            self.model,
            sim_params_from_cfg(
                dict(sim_cfg, dt=self.dt, gravity=list(gravity)),
                substeps=1,
            ),
        )
        self.motor_tau_up = min(4 * self.dt / (self.motor_damp_time + _EPS), 1.0)
        self.motor_tau_down = min(4 * self.dt / (self.motor_damp_time + _EPS), 1.0)
        self.thrust_max = -gravity[2] * self.mass * self.thrust_to_weight / 4.0
        # rotor bundle as a view (reference CrazyflieView rotors,
        # robots/articulations/views/crazyflie_view.py)
        self._rotors = RigidPrimView(
            self.model, [f"m{i + 1}_prop" for i in range(4)]
        )

    def initial_carry(self):
        return dict(
            target=jnp.array([0.0, 0.0, 2.0]),
            thrust_cmds_damp=jnp.zeros(4),
            thrust_rot_damp=jnp.zeros(4),
            episode_sums=dict(
                rew_pos=jnp.zeros(()), rew_orient=jnp.zeros(()),
                rew_effort=jnp.zeros(()), rew_spin=jnp.zeros(()),
            ),
        )

    def initial_metrics(self):
        return {
            "episode/" + k: jnp.zeros(())
            for k in ("rew_pos", "rew_orient", "rew_effort", "rew_spin")
        }

    def sample_reset(self, rng):
        m = self.model
        return m.default_q, jnp.zeros(m.nv), self.initial_carry()

    def control(self, action, es: EnvState):
        m = self.model
        carry = es.carry
        thrust_cmds = (jnp.clip(action, -1.0, 1.0) + 1.0) / 2.0
        motor_tau = jnp.where(
            thrust_cmds < carry["thrust_cmds_damp"],
            self.motor_tau_down, self.motor_tau_up,
        )
        thrust_rot = jnp.sqrt(thrust_cmds)
        rot_damp = (
            motor_tau * (thrust_rot - carry["thrust_rot_damp"])
            + carry["thrust_rot_damp"]
        )
        cmds_damp = rot_damp**2
        noise = 0.01 * jax.random.normal(jax.random.fold_in(es.rng, 3), (4,))
        cmds_damp = jnp.clip(cmds_damp + thrust_cmds * noise, 0.0, 1.0)
        carry["thrust_cmds_damp"] = cmds_damp
        carry["thrust_rot_damp"] = rot_damp

        thrusts = self.thrust_max * cmds_damp
        root_quat = es.phys.q[3:7]
        f_world = rot.quat_rotate(
            jnp.broadcast_to(root_quat, (4, 4)),
            jnp.concatenate([jnp.zeros((4, 2)), thrusts[:, None]], axis=-1),
        )
        return self._rotors.apply_forces(
            self.engine.default_control(), f_world
        )

    def observe(self, phys, carry, action):
        quat = phys.q[3:7]
        R = rot.quat_to_rotmat(quat)
        obs = jnp.concatenate(
            [
                carry["target"] - phys.q[0:3],
                R[:, 0], R[:, 1], R[:, 2],
                phys.body_lvel[0],
                phys.body_avel[0],
            ]
        )
        return obs, jnp.zeros(0), carry

    def reward_done(self, obs, action, phys, carry, progress):
        root_pos = phys.q[0:3]
        quat = phys.q[3:7]
        target_dist = jnp.linalg.norm(carry["target"] - root_pos)
        pos_reward = 1.0 / (1.0 + target_dist)
        up_z = rot.quat_rotate(quat, jnp.array([0.0, 0.0, 1.0]))[2]
        up_reward = jnp.clip(up_z, 0.0, 1.0)
        effort = jnp.sum(jnp.square(action))
        effort_reward = 0.05 * jnp.exp(-0.5 * effort)
        spin = jnp.sum(jnp.square(phys.body_avel[0]))
        spin_reward = 0.01 * jnp.exp(-1.0 * spin)
        reward = pos_reward + pos_reward * (up_reward + spin_reward) - effort_reward
        sums = carry["episode_sums"]
        carry = dict(
            carry,
            episode_sums=dict(
                rew_pos=sums["rew_pos"] + pos_reward,
                rew_orient=sums["rew_orient"] + up_reward,
                rew_effort=sums["rew_effort"] + effort_reward,
                rew_spin=sums["rew_spin"] + spin_reward,
            ),
        )
        done = (
            (target_dist > 5.0)
            | (root_pos[2] < 0.5)
            | (root_pos[2] > 5.0)
            | (up_z < 0.0)
            | (progress >= self.max_episode_length - 1)
        )
        metrics = {
            "episode/" + k: v / self.max_episode_length
            for k, v in carry["episode_sums"].items()
        }
        return reward, done, carry, metrics
