"""VecEnv smoke tests — the jitted equivalent of the reference's
random_policy.py exerciser (scripts/random_policy.py:41-68), promoted to a
unit test (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.tasks import get_task


def _make(num_envs=8):
    task = get_task("Cartpole")
    return VecEnv(task, num_envs)


def test_reset_shapes():
    env = _make(8)
    es = env.reset(seed=0)
    assert es.obs.shape == (8, 4)
    assert es.reward.shape == (8,)
    assert es.done.shape == (8,)
    assert es.progress.shape == (8,)
    # reset randomization within documented bounds (tasks/cartpole.py:114-134)
    assert np.all(np.abs(es.obs[:, 0]) <= 1.0 + 1e-6)
    assert np.all(np.abs(es.obs[:, 2]) <= np.pi / 8 + 1e-6)
    # envs differ
    assert np.std(np.asarray(es.obs[:, 0])) > 0.05


def test_random_rollout():
    env = _make(8)
    es = env.reset(seed=0)
    rng = jax.random.PRNGKey(1)
    for t in range(20):
        rng, key = jax.random.split(rng)
        actions = jax.random.uniform(
            key, (env.num_envs, env.num_actions), minval=-1, maxval=1
        )
        es = env.step(es, actions)
    assert np.all(np.isfinite(np.asarray(es.obs)))
    assert np.all(np.asarray(es.progress) >= 1)
    assert np.all(np.abs(np.asarray(es.obs)) <= env.task.clip_obs + 1e-6)


def test_auto_reset_progress():
    env = _make(4)
    es = env.reset(seed=0)
    # force done and step: progress must restart at 1
    es = es.replace(done=jnp.ones(4, bool), progress=jnp.full((4,), 77, jnp.int32))
    actions = jnp.zeros((4, 1))
    es = env.step(es, actions)
    assert np.all(np.asarray(es.progress) == 1)


def test_episode_terminates_on_bounds():
    env = _make(4)
    es = env.reset(seed=0)
    # drive hard right; carts exceed resetDist eventually
    done_seen = False
    for _ in range(300):
        es = env.step(es, jnp.ones((4, 1)))
        if bool(jnp.any(es.done)):
            done_seen = True
            break
    assert done_seen
    # reward at violation is -2
    assert float(jnp.min(es.reward)) <= -2.0 + 1e-5


def test_scan_rollout():
    env = _make(8)
    es = env.reset(seed=0)

    def policy(obs, key):
        return jax.random.uniform(key, (obs.shape[0], 1), minval=-1, maxval=1)

    es2, (obs_traj, rew_traj, done_traj) = jax.jit(
        lambda es, rng: env.rollout(es, policy, 16, rng)
    )(es, jax.random.PRNGKey(0))
    assert obs_traj.shape == (16, 8, 4)
    assert rew_traj.shape == (16, 8)
    assert np.all(np.isfinite(np.asarray(obs_traj)))
