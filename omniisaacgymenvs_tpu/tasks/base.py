"""Task base: pure-function equivalent of the reference RLTask contract.

The reference RLTask (tasks/base/rl_task.py:49-251) allocates torch buffers
(obs/states/rew/reset/progress), orchestrates per-step hooks
(pre_physics_step -> N x world.step -> post_physics_step with progress+=1,
get_observations, get_states, calculate_metrics, is_done, get_extras) and
performs env-indexed resets via .nonzero() host syncs.

Here the same contract is a pure per-env step function over an EnvState
pytree; resets are full-batch `where` merges fused into the step (SURVEY.md
§7.3 item 3 — no host syncs), and the whole thing is vmapped/jitted/sharded
by the VecEnv layer.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.physics.engine import PhysicsEngine
from omniisaacgymenvs_tpu.physics.state import Control, State
from omniisaacgymenvs_tpu.utils.domain_randomization import combine_overlays


@flax.struct.dataclass
class EnvState:
    """Single-env task state (batched by leading axis at the VecEnv layer).

    Mirrors the reference per-env buffers: obs_buf/states_buf/rew_buf/
    reset_buf/progress_buf (reference tasks/base/rl_task.py:98-107) plus the
    physics state, task-specific carry, and a per-env RNG key.
    """

    phys: State
    carry: Any
    obs: jax.Array
    states: jax.Array
    reward: jax.Array          # scalar f32
    done: jax.Array            # scalar bool — reference reset_buf
    timeout: jax.Array         # scalar bool — rl_games time_outs (for
                               # value_bootstrap, cfg/train/AntPPO.yaml)
    progress: jax.Array        # scalar i32 — reference progress_buf
    rng: jax.Array
    metrics: Dict[str, jax.Array]  # reference extras (episode sums, etc.)


class RLTask:
    """Base class for all tasks. Subclasses define the model/engine and the
    pure hooks; this class provides the step pipeline.

    Contract hooks (single env, pure):
      initial_carry() -> carry
      sample_reset(rng) -> (q, qd, carry)    # reference reset_idx
      control(action, es) -> Control          # reference pre_physics_step
      observe(phys, carry, action) -> (obs, states, carry)
      reward_done(obs, action, phys, carry, progress)
          -> (reward, done, carry, metrics)
    """

    name: str = "RLTask"
    num_obs: int = 0
    num_states: int = 0
    num_actions: int = 0
    max_episode_length: int = 500
    clip_obs: float = jnp.inf
    clip_actions: float = jnp.inf
    decimation: int = 1  # reference controlFrequencyInv
    # optional DR (utils/domain_randomization.Randomizer), attached by the
    # registry from the task yaml's domain_randomization block
    randomizer = None
    # optional view-name -> {dofs, bodies, tendons} index map so the yaml's
    # articulation/rigid-prim view blocks target the right model subset
    # (reference view names like shadow_hand_view/object_view)
    dr_views = None

    engine: PhysicsEngine

    @property
    def _dr_on(self):
        return self.randomizer is not None and self.randomizer.randomize

    @property
    def timeout_progress(self) -> int:
        """Progress value at/after which an episode ends by time limit.
        Nearly every task terminates at `progress >= max_episode_length - 1`
        (reference tasks/shared/locomotion.py:257-268, in_hand_manipulation
        .py:388, etc.); tasks with a different convention (Cartpole's
        `>= max_episode_length`, tasks/cartpole.py:155-160) override this so
        EnvState.timeout is true EXACTLY when the episode ended by time
        limit — rl_games value_bootstrap (`rewards += gamma*values*
        time_outs`) keys off it."""
        return self.max_episode_length - 1

    # ------------------------------------------------------------------
    def initial_carry(self) -> Any:
        return ()

    def initial_metrics(self) -> Dict[str, jax.Array]:
        return {}

    def sample_reset(self, rng: jax.Array):
        raise NotImplementedError

    def control(self, action: jax.Array, es: EnvState) -> Control:
        raise NotImplementedError

    def observe(self, phys: State, carry, action: jax.Array):
        raise NotImplementedError

    def reward_done(self, obs, action, phys, carry, progress):
        raise NotImplementedError

    def adjust_progress(self, carry, progress):
        """Post-reward progress adjustment hook. In-hand tasks with
        maxConsecutiveSuccesses > 0 zero the progress counter on goal hits
        (reference in_hand_manipulation.py:385-386) — the adjusted value is
        what the time-limit/timeout check must see."""
        return progress

    def resample_reset(self, key: jax.Array, es: "EnvState") -> "EnvState":
        """Fresh state for the auto-reset merge. Default: self.reset(key).
        Tasks whose reset depends on the DYING episode's state (terrain
        curriculum: walked distance -> next level, reference
        anymal_terrain.py update_terrain_level) override this."""
        return self.reset(key)

    def pre_physics(self, es: "EnvState", key: jax.Array) -> "EnvState":
        """State perturbation before actions apply (reference random robot
        pushes, anymal_terrain.py:355-357). Default: identity."""
        return es

    # -- cross-env episode statistics --------------------------------
    # Per-env metrics can't express batch reductions (e.g. the reference's
    # completed-episode consecutive-success EMA, in_hand_manipulation
    # .py:394-396). The learner carries a stats pytree and calls
    # episode_stats_update(stats, es_batched) after every env step.
    def episode_stats_init(self) -> Dict[str, jax.Array]:
        return {}

    def episode_stats_update(self, stats, es):
        return stats

    # ------------------------------------------------------------------
    def reset(self, rng: jax.Array) -> EnvState:
        """Fresh env state (reference post_reset + reset_idx)."""
        rng, key = jax.random.split(rng)
        q, qd, carry = self.sample_reset(key)
        if self._dr_on and isinstance(carry, dict):
            kc, ko, ks = jax.random.split(jax.random.fold_in(key, 17), 3)
            dr = self.randomizer.sample_correlated(
                kc, self.num_obs, self.num_actions
            )
            overlay = self.randomizer.sample_overlay(
                ko, self.model, self.dr_views
            )
            if overlay is not None:
                dr["overlay"] = overlay
            # on_startup overlay: sampled here only for the env's FIRST
            # reset; step() restores the previous values across auto-resets
            # so it stays fixed per env for the whole run (reference
            # randomize.py:525-578 on_startup semantics)
            startup = self.randomizer.sample_startup_overlay(
                ks, self.model, self.dr_views
            )
            if startup is not None:
                dr["startup"] = startup
            carry["_dr"] = dr
        phys = self.engine.init_state(q, qd)
        zero_action = jnp.zeros(self.num_actions)
        obs, states, carry = self.observe(phys, carry, zero_action)
        return EnvState(
            phys=phys,
            carry=carry,
            obs=obs,
            states=states,
            reward=jnp.zeros(()),
            done=jnp.zeros((), bool),
            timeout=jnp.zeros((), bool),
            progress=jnp.zeros((), jnp.int32),
            rng=rng,
            metrics=self.initial_metrics(),
        )

    def physics_steps(self, phys: State, ctrl: Control,
                      overlay=None) -> State:
        """decimation x engine.step (reference envs/vec_env_rlgames.py:64-66,
        `for _ in range(control_frequency_inv): world.step`). Tasks with
        per-substep control (AnymalTerrain) override."""
        return self.engine.step_n(phys, ctrl, self.decimation, overlay)

    def step(self, es: EnvState, action: jax.Array) -> EnvState:
        """One control step. Auto-reset-on-entry: envs flagged done on the
        previous step are re-sampled before actions apply, matching the
        reference ordering (reset_idx inside pre_physics_step,
        tasks/cartpole.py:102-104) without host syncs: both branches are
        computed and merged with `where` on the done flag."""
        rng, key_reset = jax.random.split(es.rng)
        es = es.replace(rng=rng)
        if isinstance(es.carry, dict):
            # tasks may update carry in-place inside control(); give each
            # step its own dict so merged/branched states stay independent
            es = es.replace(carry=dict(es.carry))
        old_startup = (
            es.carry.get("_dr", {}).get("startup")
            if isinstance(es.carry, dict)
            else None
        )
        fresh = self.resample_reset(key_reset, es)
        es = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(es.done, (1,) * new.ndim), new, old
            )
            if new.ndim > 0
            else jnp.where(es.done, new, old),
            fresh,
            es,
        )
        es = self.pre_physics(es, jax.random.fold_in(rng, 7))
        if old_startup is not None:
            # on_startup DR persists across episode resets: undo the merge's
            # fresh sample (reference on_startup = once per env, ever)
            es.carry["_dr"] = dict(es.carry["_dr"], startup=old_startup)

        action = jnp.clip(action, -self.clip_actions, self.clip_actions)
        dr = es.carry.get("_dr", {}) if isinstance(es.carry, dict) else {}
        if self._dr_on and self.randomizer.has_interval_overlays():
            # on_interval physics params re-sampled every freq steps
            dr = dict(
                dr,
                overlay=self.randomizer.update_interval_overlay(
                    dr.get("overlay"), jax.random.fold_in(es.rng, 37),
                    self.model, es.progress, self.dr_views,
                ),
            )
            es.carry["_dr"] = dr
        if self._dr_on:
            # reference envs/vec_env_rlgames.py:59-60 — randomize actions
            # after clipping, before pre_physics_step
            action = self.randomizer.randomize_actions(
                action, jax.random.fold_in(es.rng, 23), dr, es.progress
            )
        ctrl = self.control(action, es)
        overlay = combine_overlays(dr.get("startup"), dr.get("overlay"))
        phys = self.physics_steps(es.phys, ctrl, overlay)
        progress = es.progress + 1
        obs, states, carry = self.observe(phys, es.carry, action)
        reward, done, carry, metrics = self.reward_done(
            obs, action, phys, carry, progress
        )
        progress = self.adjust_progress(carry, progress)
        if self._dr_on:
            # reference envs/vec_env_rlgames.py:70-71 — randomize
            # observations after post_physics_step, before clipping
            obs = self.randomizer.randomize_observations(
                obs, jax.random.fold_in(es.rng, 29), dr, progress
            )
        # physics-explosion guard: a non-finite state terminates the episode
        # with zero reward instead of poisoning the training batch (the
        # reference's PhysX analogue is a solver blow-up crash,
        # docs/troubleshoot.md:6-10 — here it is a clean env reset).
        finite = jnp.isfinite(jnp.sum(phys.q) + jnp.sum(phys.qd) + reward)
        done = done | ~finite
        reward = jnp.where(finite, reward, 0.0)
        obs = jnp.nan_to_num(
            jnp.clip(obs, -self.clip_obs, self.clip_obs),
            posinf=1e6, neginf=-1e6,
        )
        states = jnp.nan_to_num(
            jnp.clip(states, -self.clip_obs, self.clip_obs),
            posinf=1e6, neginf=-1e6,
        )
        return es.replace(
            phys=phys,
            carry=carry,
            obs=obs,
            states=states,
            reward=reward,
            done=done,
            timeout=jnp.asarray(progress >= self.timeout_progress),
            progress=progress,
            metrics=metrics,
        )
