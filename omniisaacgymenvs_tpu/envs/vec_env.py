"""Vectorized environment: batched step/reset over all envs at once.

Reference: envs/vec_env_rlgames.py (VecEnvRLGames.step :56-78 — clip
actions -> DR -> pre_physics_step -> N x world.step -> post_physics_step ->
DR -> clip obs -> device copy). Here the whole pipeline is one jitted
vmapped pure function over the EnvState pytree, optionally GSPMD-sharded
over an ('env',) mesh; the rl-device copy disappears (co-located learner).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.parallel.mesh import env_sharding
from omniisaacgymenvs_tpu.tasks.base import EnvState, RLTask


class VecEnv:
    def __init__(self, task: RLTask, num_envs: int, mesh=None):
        self.task = task
        self.num_envs = num_envs
        self.mesh = mesh
        self._reset_fn = jax.jit(jax.vmap(task.reset))
        self._step_fn = jax.jit(jax.vmap(task.step))

    # -- gym-style info (reference RLGPUEnv.get_env_info,
    #    utils/rlgames/rlgames_utils.py:110-118) --
    @property
    def num_obs(self) -> int:
        return self.task.num_obs

    @property
    def num_states(self) -> int:
        return self.task.num_states

    @property
    def num_actions(self) -> int:
        return self.task.num_actions

    # ------------------------------------------------------------------
    def reset(self, seed: int = 0) -> EnvState:
        keys = jax.random.split(jax.random.PRNGKey(seed), self.num_envs)
        if self.mesh is not None:
            sh = env_sharding(self.mesh, 2)
            if jax.process_count() > 1:
                # multi-host: every process computes the SAME global key
                # array (deterministic from seed) and contributes only its
                # addressable shards — device_put of a host-global array
                # would fail on non-addressable devices (SURVEY.md §2.4)
                import numpy as np

                arr = np.asarray(keys)
                keys = jax.make_array_from_callback(
                    arr.shape, sh, lambda idx: arr[idx]
                )
            else:
                keys = jax.device_put(keys, sh)
        es = self._reset_fn(keys)
        return es

    def step(self, es: EnvState, actions: jax.Array) -> EnvState:
        """actions: (num_envs, num_actions) -> next EnvState with batched
        obs/states/reward/done fields."""
        return self._step_fn(es, actions)

    def step_rl(
        self, es: EnvState, actions: jax.Array
    ) -> Tuple[EnvState, dict, jax.Array, jax.Array, dict]:
        """Reference-shaped return: (obs_dict, rew, resets, extras)
        (envs/vec_env_rlgames.py:76-78)."""
        es = self.step(es, actions)
        obs_dict = {"obs": es.obs, "states": es.states}
        return es, obs_dict, es.reward, es.done, dict(es.metrics)

    # ------------------------------------------------------------------
    def rollout(self, es: EnvState, policy_fn, horizon: int, rng: jax.Array):
        """lax.scan rollout of `horizon` steps (the jitted replacement for
        rl_games play_steps). policy_fn(obs, rng) -> actions."""

        def body(carry, _):
            es, rng = carry
            rng, key = jax.random.split(rng)
            actions = policy_fn(es.obs, key)
            es = jax.vmap(self.task.step)(es, actions)
            return (es, rng), (es.obs, es.reward, es.done)

        (es, _), traj = jax.lax.scan(body, (es, rng), None, length=horizon)
        return es, traj
