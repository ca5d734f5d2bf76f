"""Flyer task tests: dims, hover physics sanity, motor-lag behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.tasks import get_task


@pytest.mark.parametrize(
    "name,num_obs,num_act",
    [("Ingenuity", 13, 6), ("Quadcopter", 21, 12), ("Crazyflie", 18, 4)],
)
def test_dims_and_random_steps(name, num_obs, num_act):
    task = get_task(name)
    assert task.num_obs == num_obs and task.num_actions == num_act
    env = VecEnv(task, 4)
    es = env.reset(seed=0)
    assert es.obs.shape == (4, num_obs)
    rng = jax.random.PRNGKey(0)
    for _ in range(10):
        rng, k = jax.random.split(rng)
        a = jax.random.uniform(k, (4, num_act), minval=-1, maxval=1)
        es = env.step(es, a)
    assert np.all(np.isfinite(np.asarray(es.obs)))


def test_ingenuity_thrust_lifts():
    """Full vertical thrust must accelerate the copter upward against
    Mars gravity; zero thrust must let it fall."""
    env = VecEnv(get_task("Ingenuity"), 2)
    es = env.reset(seed=0)
    z0 = np.asarray(es.phys.q[:, 2]).copy()
    up = jnp.zeros((2, 6)).at[:, jnp.array([2, 5])].set(1.0)
    for _ in range(30):
        es = env.step(es, up)
    assert np.all(np.asarray(es.phys.q[:, 2]) > z0 + 0.05)

    es2 = env.reset(seed=1)
    z0 = np.asarray(es2.phys.q[:, 2]).copy()
    for _ in range(30):
        es2 = env.step(es2, jnp.zeros((2, 6)))
    assert np.all(np.asarray(es2.phys.q[:, 2]) < z0 - 0.05)


def test_crazyflie_motor_lag():
    """Thrust responds with a first-order lag: after one step of full
    command the damped thrust must be far below max, growing over time."""
    task = get_task("Crazyflie")
    env = VecEnv(task, 2)
    es = env.reset(seed=0)
    full = jnp.ones((2, 4))
    es = env.step(es, full)
    c1 = np.asarray(es.carry["thrust_cmds_damp"])
    assert np.all(c1 < 0.3)
    for _ in range(60):
        es = env.step(es, full)
    c2 = np.asarray(es.carry["thrust_cmds_damp"])
    assert np.all(c2 > 0.8)


def test_crazyflie_episode_metrics_present():
    env = VecEnv(get_task("Crazyflie"), 2)
    es = env.reset(seed=0)
    es = env.step(es, jnp.zeros((2, 4)))
    assert "episode/rew_pos" in es.metrics
