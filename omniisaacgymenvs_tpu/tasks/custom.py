"""Custom imported-robot task: bring-your-own URDF/MJCF.

The reference consumes robots as Nucleus USD assets; its analog for
user-supplied robots is importing an asset and writing a task class
against it. Here the ingestion path (models/importers.py) is wired
straight into the registry: `task=Custom task.env.robot=path/to/robot.urdf`
trains a joint-space target-reaching policy on any imported articulation —
the end-to-end smoke path for bring-your-own-robot work before writing a
bespoke task class.

Task semantics: each episode samples a random joint-position target inside
the (possibly cfg-clamped) joint limits; the policy drives the dofs there
via PD position control. reward = -w_pos*|q - q*|^2 - w_vel*|qd|^2
- w_act*|a|^2 + alive bonus. Episodes end on time limit (and on base fall
for floating-base robots).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.models import importers
from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.physics.engine import (
    PhysicsEngine,
    sim_params_from_cfg,
)
from omniisaacgymenvs_tpu.tasks.base import EnvState, RLTask


class CustomRobotTask(RLTask):
    name = "Custom"
    num_states = 0

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        sim_cfg = cfg.get("sim", {})
        robot = env_cfg.get("robot")
        if not robot:
            raise ValueError(
                "task=Custom needs task.env.robot=<path/to/robot.urdf|.xml>"
            )
        self.clip_obs = env_cfg.get("clipObservations", 5.0)
        self.clip_actions = env_cfg.get("clipActions", 1.0)
        self.decimation = env_cfg.get("controlFrequencyInv", 2)
        self.max_episode_length = env_cfg.get("episodeLength", 500)
        self.vel_obs_scale = env_cfg.get("velObsScale", 0.1)
        self.pos_reward_scale = env_cfg.get("posRewardScale", 2.0)
        self.vel_penalty_scale = env_cfg.get("velPenaltyScale", 0.01)
        self.action_penalty_scale = env_cfg.get("actionPenaltyScale", 0.01)
        self.reset_noise = env_cfg.get("resetNoise", 0.1)
        floating = env_cfg.get("floatingBase", False)

        ext = os.path.splitext(str(robot))[1].lower()
        if ext == ".urdf":
            builder = importers.from_urdf(robot, floating_base=floating)
        elif ext in (".xml", ".mjcf"):
            builder = importers.from_mjcf(robot)
        else:
            raise ValueError(f"unsupported robot format {ext!r} ({robot})")
        # URDF carries no PD gains (importers.from_urdf docstring); the
        # drive block supplies them for every dof, reference set_drive
        # style (tasks/utils/usd_utils.py:71-82)
        drive = dict(env_cfg.get("drive", {}))
        drive.setdefault("stiffness", 40.0)
        drive.setdefault("damping", 2.0)
        drive.setdefault("max_effort", 100.0)
        for dof_name in builder.dof_names:
            builder.set_drive(dof_name, **drive)
        self.model = builder.finalize()
        self.engine = PhysicsEngine(
            self.model,
            sim_params_from_cfg(
                sim_cfg, dt=1.0 / 120.0,
                substeps=env_cfg.get("substeps", 2),
                gravity=(0.0, 0.0, -9.81),
            ),
        )
        m = self.model
        if m.njd == 0:
            raise ValueError(f"{robot}: imported model has no driven dofs")
        # derive floating-ness from the FINALIZED model's root joint, not
        # the cfg flag: from_mjcf decides the base joint from the file
        # itself (the flag only steers the URDF importer), so trusting the
        # flag would read joint coordinates as base pose / terminate on a
        # joint angle for a fixed-base MJCF with floatingBase=True
        self.floating = bool(m.root_free)
        if bool(floating) != self.floating:
            print(
                f"custom robot: floatingBase={floating} requested but the "
                f"imported model root is "
                f"{'FREE' if self.floating else 'FIXED'}; using the model"
            )
        # base fall termination height for floating-base robots (reference
        # locomotion-style fallen-over check, tasks/anymal.py:283)
        self.termination_height = env_cfg.get("terminationHeight", 0.2)
        self.num_actions = int(m.njd)
        # obs: [dof_pos_scaled, dof_vel*scale, target_scaled]; floating-base
        # robots additionally observe their base state
        # [z, quat(4), lin_vel*scale, ang_vel*scale] (11)
        self.num_obs = 3 * int(m.njd) + (11 if self.floating else 0)
        # unbounded (continuous) joints get a +-pi target window
        lo = jnp.maximum(m.dof_limit_lower, -jnp.pi)
        hi = jnp.minimum(m.dof_limit_upper, jnp.pi)
        self._tgt_lo, self._tgt_hi = lo, hi

    def initial_carry(self):
        return dict(target=jnp.zeros(self.model.njd))

    def sample_reset(self, rng: jax.Array):
        m = self.model
        k1, k2, k3 = jax.random.split(rng, 3)
        dof_default = m.default_q[jnp.asarray(m.jq_idx)]
        noise = self.reset_noise * jax.random.uniform(
            k1, (m.njd,), minval=-1.0, maxval=1.0
        )
        dof_pos = jnp.clip(
            dof_default + noise, self._tgt_lo, self._tgt_hi
        )
        q = m.default_q.at[jnp.asarray(m.jq_idx)].set(dof_pos)
        qd = jnp.zeros(m.nv)
        target = jax.random.uniform(
            k2, (m.njd,), minval=self._tgt_lo, maxval=self._tgt_hi
        )
        return q, qd, dict(target=target)

    def control(self, action: jax.Array, es: EnvState):
        lo, hi = self._tgt_lo, self._tgt_hi
        tgt = rot.scale(action, lo, hi)
        return self.engine.default_control().replace(pos_target=tgt)

    def observe(self, phys, carry, action):
        m = self.model
        dof_pos = phys.q[jnp.asarray(m.jq_idx)]
        dof_vel = phys.qd[jnp.asarray(m.jv_idx)]
        parts = [
            rot.unscale(dof_pos, self._tgt_lo, self._tgt_hi),
            self.vel_obs_scale * dof_vel,
            rot.unscale(carry["target"], self._tgt_lo, self._tgt_hi),
        ]
        if self.floating:
            # base state (free root: q[0:3] pos, q[3:7] wxyz quat; body 0
            # world velocities — same access pattern as
            # tasks/shared/locomotion.py observe)
            parts.append(phys.q[2:3])
            parts.append(phys.q[3:7])
            parts.append(self.vel_obs_scale * phys.body_lvel[0])
            parts.append(self.vel_obs_scale * phys.body_avel[0])
        return jnp.concatenate(parts), jnp.zeros(0), carry

    def reward_done(self, obs, action, phys, carry, progress):
        m = self.model
        dof_pos = phys.q[jnp.asarray(m.jq_idx)]
        dof_vel = phys.qd[jnp.asarray(m.jv_idx)]
        err = jnp.sum((dof_pos - carry["target"]) ** 2)
        reward = (
            1.0
            - self.pos_reward_scale * err
            - self.vel_penalty_scale * jnp.sum(dof_vel**2)
            - self.action_penalty_scale * jnp.sum(action**2)
        )
        done = progress >= self.max_episode_length - 1
        if self.floating:
            # fallen-base termination (docstring contract; reference
            # locomotion fallen-over semantics, tasks/anymal.py:283)
            fallen = phys.q[2] < self.termination_height
            reward = jnp.where(fallen, -1.0, reward)
            done = done | fallen
        return reward, done, carry, dict()
