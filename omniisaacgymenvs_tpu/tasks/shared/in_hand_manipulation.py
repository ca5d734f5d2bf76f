"""Shared in-hand manipulation task (ShadowHand / AllegroHand common).

Reference: tasks/shared/in_hand_manipulation.py — hand + free block object +
goal orientation; position-target control over the actuated dofs with
moving-average smoothing or relative mode (:237-275); goal-only resets on
success (goal re-randomized without resetting the env, :280-305); full
resets randomize object pose (position noise + full random orientation) and
hand dofs (:305-335); reward = dist*scale + 1/(|rot_dist|+eps)*rot_scale +
action penalty, with reach-goal bonus, fall penalty, success counting and a
consecutive-success EMA (:347-398).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.tasks.base import EnvState, RLTask


def randomize_rotation(rand0, rand1):
    """reference in_hand_manipulation.py:342-344."""
    qx = rot.quat_from_angle_axis(rand0 * jnp.pi, jnp.array([1.0, 0.0, 0.0]))
    qy = rot.quat_from_angle_axis(rand1 * jnp.pi, jnp.array([0.0, 1.0, 0.0]))
    return rot.quat_mul(qx, qy)


class InHandManipulationTask(RLTask):
    """Subclasses set: model, engine, actuated dof indices, coupled-joint
    map, fingertip bodies, object addressing, obs builders."""

    # set by subclass
    actuated_dof_indices: jnp.ndarray      # (num_actions,)
    coupled_pairs: tuple = ()              # ((follower_dof, leader_dof), ...)
    fingertip_bodies: tuple = ()
    goal_pos: jnp.ndarray
    object_start: jnp.ndarray
    dr_view_name: str = "hand_view"        # yaml articulation view name

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        self.dist_reward_scale = env_cfg.get("distRewardScale", -10.0)
        self.rot_reward_scale = env_cfg.get("rotRewardScale", 1.0)
        self.action_penalty_scale = env_cfg.get("actionPenaltyScale", -0.0002)
        self.success_tolerance = env_cfg.get("successTolerance", 0.1)
        self.reach_goal_bonus = env_cfg.get("reachGoalBonus", 250.0)
        self.fall_dist = env_cfg.get("fallDistance", 0.24)
        self.fall_penalty = env_cfg.get("fallPenalty", 0.0)
        self.rot_eps = env_cfg.get("rotEps", 0.1)
        self.vel_obs_scale = env_cfg.get("velObsScale", 0.2)
        self.reset_position_noise = env_cfg.get("resetPositionNoise", 0.01)
        self.reset_dof_pos_noise = env_cfg.get("resetDofPosRandomInterval", 0.2)
        self.reset_dof_vel_noise = env_cfg.get("resetDofVelRandomInterval", 0.0)
        self.hand_dof_speed_scale = env_cfg.get("dofSpeedScale", 20.0)
        self.use_relative_control = env_cfg.get("useRelativeControl", False)
        self.act_moving_average = env_cfg.get("actionsMovingAverage", 1.0)
        self.max_episode_length = env_cfg.get("episodeLength", 600)
        self.max_consecutive_successes = env_cfg.get("maxConsecutiveSuccesses", 0)
        self.av_factor = env_cfg.get("averFactor", 0.1)
        self.clip_obs = env_cfg.get("clipObservations", 5.0)
        self.clip_actions = env_cfg.get("clipActions", 1.0)
        self.decimation = env_cfg.get("controlFrequencyInv", 2)
        self.dt = 1.0 / 60.0  # reference in_hand_manipulation.py:83
        # random object force perturbations (reference
        # cfg/task/ShadowHandOpenAI_FF.yaml:29-33; IsaacGym-lineage rb_forces
        # semantics: exponential decay + per-step Bernoulli re-kick)
        self.force_scale = env_cfg.get("forceScale", 0.0)
        self.force_prob_range = tuple(
            env_cfg.get("forceProbRange", (0.001, 0.1))
        )
        self.force_decay = env_cfg.get("forceDecay", 0.99)
        self.force_decay_interval = env_cfg.get("forceDecayInterval", 0.08)

    # ------------------------------------------------------------------
    def _post_model_init(self):
        """Call after subclass builds self.model/engine."""
        import numpy as np

        m = self.model
        self._obj_q = m.root_q_adr("object")
        self._obj_v = m.root_v_adr("object")
        self._obj_body = m.body_index("object")
        self._hand_dofs = m.njd
        self._tips = jnp.array(
            [m.body_index(n) for n in self.fingertip_bodies]
        )
        # fingertip bundle as a view (reference ShadowHandView._fingers /
        # AllegroHandView fingertip RigidPrimView)
        from omniisaacgymenvs_tpu.envs.views import RigidPrimView

        self.tips_view = RigidPrimView(m, list(self.fingertip_bodies))
        self._obj_mass = float(m.body_mass[self._obj_body])
        # DR view map: the yaml's articulation/rigid-prim view names ->
        # model index subsets (reference views shadow_hand_view/object_view)
        hand_bodies = np.array(
            [i for i in range(m.nb) if i != self._obj_body], np.int32
        )
        self.dr_views = {
            self.dr_view_name: dict(
                dofs=np.arange(m.njd, dtype=np.int32),
                bodies=hand_bodies,
                tendons=np.arange(m.nt, dtype=np.int32),
            ),
            "object_view": dict(
                bodies=np.array([self._obj_body], np.int32)
            ),
        }

    def initial_carry(self):
        m = self.model
        carry = dict(
            goal_rot=rot.quat_identity(),
            cur_targets=jnp.zeros(m.njd),
            successes=jnp.zeros(()),
            reset_goal=jnp.zeros((), bool),
        )
        if self.force_scale > 0:
            carry["rb_force"] = jnp.zeros(3)
            carry["force_prob"] = jnp.asarray(self.force_prob_range[0])
        return carry

    def initial_metrics(self):
        return dict(successes=jnp.zeros(()))

    # -- cross-env episode statistics (consumed by the learner) --------
    def episode_stats_init(self):
        return dict(consecutive_successes=jnp.zeros(()))

    def episode_stats_update(self, stats, es):
        """Reference completed-episode EMA (in_hand_manipulation.py:394-396):
        cons' = where(num_resets > 0,
                      av*sum(successes*resets)/num_resets + (1-av)*cons,
                      cons) — a BATCH reduction over all envs, computed once
        per env step on the batched post-step EnvState."""
        resets = es.done.astype(jnp.float32)
        num_resets = jnp.sum(resets)
        finished = jnp.sum(es.metrics["successes"] * resets)
        cons = stats["consecutive_successes"]
        cons = jnp.where(
            num_resets > 0,
            self.av_factor * finished / jnp.maximum(num_resets, 1.0)
            + (1.0 - self.av_factor) * cons,
            cons,
        )
        return dict(stats, consecutive_successes=cons)

    def adjust_progress(self, carry, progress):
        if self.max_consecutive_successes > 0:
            # reference in_hand_manipulation.py:385-386 — goal hits zero the
            # progress counter before the time-limit check
            return jnp.where(carry["reset_goal"], 0, progress)
        return progress

    def sample_reset(self, rng):
        m = self.model
        nhd = m.njd
        k = jax.random.split(rng, 6)
        rand2 = jax.random.uniform(k[0], (2,), minval=-1.0, maxval=1.0)
        new_rot = randomize_rotation(rand2[0], rand2[1])
        pos_noise = self.reset_position_noise * jax.random.uniform(
            k[1], (3,), minval=-1.0, maxval=1.0
        )
        goal_rand = jax.random.uniform(k[2], (2,), minval=-1.0, maxval=1.0)
        goal_rot = randomize_rotation(goal_rand[0], goal_rand[1])

        # hand dofs: default + noise * interval-scaled random delta, deltas
        # measured from the default pose. DEVIATION from the cited OIGE
        # formula (reference in_hand_manipulation.py:312-317 multiplies
        # rand in [-1,1] by (delta_max - delta_min) directly): this remaps
        # rand to [0,1] first so the delta lands INSIDE [delta_min,
        # delta_max] — the IsaacGymEnvs form of the same reset, kept
        # deliberately because the literal OIGE expression can overshoot
        # the joint interval before the clip
        rand_dofs = jax.random.uniform(k[3], (nhd,), minval=-1.0, maxval=1.0)
        dof_default = m.default_q[jnp.asarray(m.jq_idx)]
        delta_max = m.dof_limit_upper - dof_default
        delta_min = m.dof_limit_lower - dof_default
        rand_delta = delta_min + (delta_max - delta_min) * 0.5 * (rand_dofs + 1.0)
        dof_pos = jnp.clip(
            dof_default + self.reset_dof_pos_noise * rand_delta,
            m.dof_limit_lower, m.dof_limit_upper,
        )
        dof_vel = self.reset_dof_vel_noise * jax.random.uniform(
            k[4], (nhd,), minval=-1.0, maxval=1.0
        )

        q = m.default_q
        q = q.at[jnp.asarray(m.jq_idx)].set(dof_pos)
        qa = self._obj_q
        q = q.at[qa : qa + 3].add(pos_noise)
        q = q.at[qa + 3 : qa + 7].set(new_rot)
        qd = jnp.zeros(m.nv).at[jnp.asarray(m.jv_idx)].set(dof_vel)

        carry = self.initial_carry()
        carry["goal_rot"] = goal_rot
        carry["cur_targets"] = dof_pos
        if self.force_scale > 0:
            # per-env force probability, log-uniform over forceProbRange
            lo, hi = self.force_prob_range
            carry["force_prob"] = jnp.exp(
                jax.random.uniform(
                    k[5], (), minval=jnp.log(lo), maxval=jnp.log(hi)
                )
            )
        return q, qd, carry

    # ------------------------------------------------------------------
    def control(self, action, es: EnvState):
        m = self.model
        carry = es.carry
        # success-triggered goal-only reset (reference pre_physics_step)
        key_goal = jax.random.fold_in(es.rng, 11)
        gr = jax.random.uniform(key_goal, (2,), minval=-1.0, maxval=1.0)
        new_goal = randomize_rotation(gr[0], gr[1])
        carry["goal_rot"] = jnp.where(
            carry["reset_goal"], new_goal, carry["goal_rot"]
        )
        carry["reset_goal"] = jnp.zeros((), bool)

        act_idx = self.actuated_dof_indices
        prev = carry["cur_targets"]
        lo = m.dof_limit_lower[act_idx]
        hi = m.dof_limit_upper[act_idx]
        if self.use_relative_control:
            tgt = jnp.clip(
                prev[act_idx] + self.hand_dof_speed_scale * self.dt * action,
                lo, hi,
            )
        else:
            tgt = rot.scale(action, lo, hi)
            tgt = (
                self.act_moving_average * tgt
                + (1.0 - self.act_moving_average) * prev[act_idx]
            )
            tgt = jnp.clip(tgt, lo, hi)
        targets = prev.at[act_idx].set(tgt)
        for follower, leader in self.coupled_pairs:
            targets = targets.at[follower].set(targets[leader])
        carry["cur_targets"] = targets
        ctrl = self.engine.default_control().replace(pos_target=targets)
        if self.force_scale > 0:
            # random object force perturbations (reference
            # ShadowHandOpenAI_FF.yaml force block): exponential decay every
            # step, Bernoulli(force_prob) re-kick ~ N(0,1)*mass*scale
            kf = jax.random.fold_in(es.rng, 41)
            k_p, k_f = jax.random.split(kf)
            decay = self.force_decay ** (self.dt / self.force_decay_interval)
            force = carry["rb_force"] * decay
            kick = (
                jax.random.normal(k_f, (3,))
                * self._obj_mass * self.force_scale
            )
            force = jnp.where(
                jax.random.uniform(k_p, ()) < carry["force_prob"],
                kick, force,
            )
            carry["rb_force"] = force
            ctrl = ctrl.replace(
                body_force=ctrl.body_force.at[self._obj_body].set(force)
            )
        return ctrl

    # ------------------------------------------------------------------
    def _object_goal_obs(self, phys, carry):
        qa = self._obj_q
        object_pos = phys.q[qa : qa + 3]
        object_rot = phys.q[qa + 3 : qa + 7]
        object_linvel = phys.body_lvel[self._obj_body]
        object_angvel = phys.body_avel[self._obj_body]
        quat_diff = rot.quat_mul(object_rot, rot.quat_conjugate(carry["goal_rot"]))
        return object_pos, object_rot, object_linvel, object_angvel, quat_diff

    def reward_done(self, obs, action, phys, carry, progress):
        qa = self._obj_q
        object_pos = phys.q[qa : qa + 3]
        object_rot = phys.q[qa + 3 : qa + 7]
        goal_dist = jnp.linalg.norm(object_pos - self.goal_pos)
        quat_diff = rot.quat_mul(object_rot, rot.quat_conjugate(carry["goal_rot"]))
        rot_dist = 2.0 * jnp.arcsin(
            jnp.clip(jnp.linalg.norm(quat_diff[1:4]), max=1.0)
        )

        dist_rew = goal_dist * self.dist_reward_scale
        rot_rew = 1.0 / (jnp.abs(rot_dist) + self.rot_eps) * self.rot_reward_scale
        action_penalty = jnp.sum(action**2)
        reward = dist_rew + rot_rew + action_penalty * self.action_penalty_scale

        goal_reset = jnp.abs(rot_dist) <= self.success_tolerance
        successes = carry["successes"] + goal_reset
        reward = jnp.where(goal_reset, reward + self.reach_goal_bonus, reward)

        fell = goal_dist >= self.fall_dist
        reward = jnp.where(fell, reward + self.fall_penalty, reward)

        done = fell
        if self.max_consecutive_successes > 0:
            progress = jnp.where(goal_reset, 0, progress)
            done = done | (successes >= self.max_consecutive_successes)
        done = done | (progress >= self.max_episode_length - 1)
        if self.max_consecutive_successes > 0:
            reward = jnp.where(
                progress >= self.max_episode_length - 1,
                reward + 0.5 * self.fall_penalty, reward,
            )

        carry = dict(carry, successes=successes, reset_goal=goal_reset)
        metrics = dict(successes=successes)
        return reward, done, carry, metrics
