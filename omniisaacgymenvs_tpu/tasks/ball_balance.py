"""BallBalance task: keep a ball centered on an actuated tray.

Reference: tasks/ball_balance.py — 24-dim obs (actuated dof pos/vel, ball
position/velocity, leg force-sensor channels /20, :149-158), 3 actions as
integrated position targets (dt * actionSpeedScale=20, :170-174), reward
pos_reward * speed_reward with ball target (0, 0, 0.7) (:252-268),
termination on ball below 1.5*radius or 500 steps (:270-276), reset with
the ball tossed from random offset/height with inward velocity (:176-213).

Sensor obs note: the reference reads channels [fx, tx, ty, tz] of three leg
sensors; the loop-free tripod model carries one tray contact sensor, so the
12 sensor dims are [tray wrench f/20 (3), tau/20 (3), ball rel pos (3),
ball angvel/pi (3)] — same dimensionality, equivalent information content.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.models.balance_bot import (
    BALL_RADIUS,
    build_balance_bot,
)
from omniisaacgymenvs_tpu.physics.engine import (
    PhysicsEngine,
    sim_params_from_cfg,
)
from omniisaacgymenvs_tpu.tasks.base import EnvState, RLTask


class BallBalanceTask(RLTask):
    name = "BallBalance"
    num_obs = 24
    num_states = 0
    num_actions = 3

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        sim_cfg = cfg.get("sim", {})
        self.max_episode_length = env_cfg.get("maxEpisodeLength", 500)
        self.action_speed_scale = env_cfg.get("actionSpeedScale", 20.0)
        self.clip_obs = env_cfg.get("clipObservations", 5.0)
        self.clip_actions = env_cfg.get("clipActions", 1.0)
        self.decimation = env_cfg.get("controlFrequencyInv", 2)
        self.dt = sim_cfg.get("dt", 0.01)
        self.model = build_balance_bot()
        self.engine = PhysicsEngine(
            self.model,
            sim_params_from_cfg(
                dict(sim_cfg, dt=self.dt), substeps=2,
                gravity=(0.0, 0.0, -9.81),
            ),
        )
        self._ball_q = self.model.root_q_adr("ball")
        self._ball_v = self.model.root_v_adr("ball")
        self._ball_body = self.model.body_index("ball")
        self._tray_body = self.model.body_index("tray")

    def initial_carry(self):
        return dict(dof_targets=jnp.zeros(self.model.njd))

    def sample_reset(self, rng):
        m = self.model
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        # ball tossed from random offset with inward velocity
        # (reference :176-199)
        dist = jax.random.uniform(k1, minval=0.001, maxval=0.5)
        ang = jax.random.uniform(k2, minval=0.0, maxval=2.0 * jnp.pi)
        direc = jnp.array([jnp.cos(ang), jnp.sin(ang)])
        height = jax.random.uniform(k3, minval=1.0, maxval=2.0)
        speedscale = (dist - 0.001) / (0.5 - 0.001)
        hspeed = jax.random.uniform(k4, minval=0.0, maxval=2.0)

        q = m.default_q
        qa = self._ball_q
        q = q.at[qa : qa + 2].set(dist * direc)
        q = q.at[qa + 2].set(height)
        qd = jnp.zeros(m.nv)
        va = self._ball_v
        qd = qd.at[va + 3 : va + 5].set(-speedscale * hspeed * direc)
        qd = qd.at[va + 5].set(-5.0)
        return q, qd, self.initial_carry()

    def control(self, action, es: EnvState):
        m = self.model
        targets = jnp.clip(
            es.carry["dof_targets"]
            + self.dt * self.action_speed_scale * action,
            m.dof_limit_lower, m.dof_limit_upper,
        )
        es.carry["dof_targets"] = targets
        return self.engine.default_control().replace(pos_target=targets)

    def observe(self, phys, carry, action):
        m = self.model
        dof_pos = phys.q[0:3]
        dof_vel = phys.qd[0:3]
        ball_pos = phys.q[self._ball_q : self._ball_q + 3]
        ball_linvel = phys.body_lvel[self._ball_body]
        ball_angvel = phys.body_avel[self._ball_body]
        tray_wrench = phys.sensor_forces[0]
        tray_pos = phys.body_pos[self._tray_body]
        obs = jnp.concatenate(
            [
                dof_pos,
                dof_vel,
                ball_pos,
                ball_linvel,
                tray_wrench[0:3] / 20.0,
                tray_wrench[3:6] / 20.0,
                ball_pos - tray_pos,
                ball_angvel / jnp.pi,
            ]
        )
        return obs, jnp.zeros(0), carry

    def reward_done(self, obs, action, phys, carry, progress):
        ball_pos = phys.q[self._ball_q : self._ball_q + 3]
        ball_linvel = phys.body_lvel[self._ball_body]
        target = jnp.array([0.0, 0.0, 0.7])
        ball_dist = jnp.linalg.norm(ball_pos - target)
        ball_speed = jnp.linalg.norm(ball_linvel)
        reward = (1.0 / (1.0 + ball_dist)) * (1.0 / (1.0 + ball_speed))
        done = (ball_pos[2] < BALL_RADIUS * 1.5) | (
            progress >= self.max_episode_length - 1
        )
        return reward, done, carry, {}
