"""Locomotion task smoke tests: obs dims, finiteness, stand-then-fall
semantics (SURVEY.md §2.2 per-task contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.tasks import get_task


@pytest.mark.parametrize(
    "name,num_obs,num_act",
    [("Ant", 60, 8), ("Humanoid", 87, 21)],
)
def test_obs_action_dims(name, num_obs, num_act):
    task = get_task(name)
    assert task.num_obs == num_obs
    assert task.num_actions == num_act
    env = VecEnv(task, 4)
    es = env.reset(seed=0)
    assert es.obs.shape == (4, num_obs)
    assert np.all(np.isfinite(np.asarray(es.obs)))


@pytest.mark.parametrize("name", ["Ant", "Humanoid"])
def test_random_steps_finite(name):
    env = VecEnv(get_task(name), 4)
    es = env.reset(seed=0)
    rng = jax.random.PRNGKey(0)
    for _ in range(10):
        rng, k = jax.random.split(rng)
        a = 0.5 * jax.random.uniform(
            k, (4, env.num_actions), minval=-1, maxval=1
        )
        es = env.step(es, a)
    assert np.all(np.isfinite(np.asarray(es.obs)))
    assert np.all(np.isfinite(np.asarray(es.reward)))
    # torso height obs is plausible (not exploded, not underground)
    assert np.all(np.asarray(es.obs[:, 0]) > -1.0)
    assert np.all(np.asarray(es.obs[:, 0]) < 5.0)


def test_ant_zero_action_survives():
    """With zero actions the ant should stand (height above termination)
    for at least 60 steps — contact/integration stability check."""
    env = VecEnv(get_task("Ant"), 4)
    es = env.reset(seed=0)
    for _ in range(60):
        es = env.step(es, jnp.zeros((4, 8)))
    heights = np.asarray(es.obs[:, 0])
    assert np.all(heights > 0.2), heights
    assert not np.any(np.asarray(es.done))


def test_humanoid_falls_and_terminates():
    """Humanoid with strong constant action torques falls; episode must
    terminate via the height check and auto-reset restores height."""
    env = VecEnv(get_task("Humanoid"), 4)
    es = env.reset(seed=0)
    a = jnp.ones((4, 21))
    terminated = False
    for _ in range(200):
        es = env.step(es, a)
        if bool(jnp.any(es.done)):
            terminated = True
            break
    assert terminated
    # next step auto-resets exactly the done envs
    was_done = np.asarray(es.done)
    es = env.step(es, jnp.zeros((4, 21)))
    assert np.all(np.asarray(es.obs[:, 0])[was_done] > 0.8)
    assert np.all(np.asarray(es.progress)[was_done] == 1)


def test_anymal_zero_action_stands():
    """Zero-action Anymal must STAND: drives hold defaultJointAngles and
    ground contacts carry the ~370 N weight (static-load stiffness floor,
    physics/contacts.py point_share_masses). Regression: per-effective-mass
    gains alone capped foot contacts at ~60 N and the robot free-fell
    through the 0.51 m fall termination ~8 steps after every reset."""
    from omniisaacgymenvs_tpu.utils.config import load_config

    cfg = load_config({"task": "Anymal"})
    env = VecEnv(get_task("Anymal", cfg["task"]), 4)
    es = env.reset(seed=0)
    for _ in range(80):
        es = env.step(es, jnp.zeros((4, env.num_actions)))
        assert not np.any(np.asarray(es.done))
    h = np.asarray(es.phys.q[:, 2])
    assert np.all(h > 0.55), h
    # feet carry the weight (derived from the built model, not a literal —
    # build_anymal masses come from geometry density and may be retuned)
    fz = np.asarray(es.phys.sensor_forces[:, :, 2]).sum(axis=1)
    w = 9.81 * float(np.asarray(env.task.model.body_mass).sum())
    assert np.all(np.abs(fz - w) < 0.25 * w), fz


def test_anymal_timeout_step_index():
    """Timeout convention matches the reference (anymal.py:289-291):
    `done = progress >= max_episode_length - 1` with
    max_episode_length = int(episodeLength_s / (1/60) + 0.5) — including
    the reference's hardcoded self.dt = 1/60 even though the control step
    is 0.01 s x controlFrequencyInv 2. A standing robot must time out on
    EXACTLY that step, not one early or late (round-2 VERDICT weak #4)."""
    from omniisaacgymenvs_tpu.utils.config import load_config

    cfg = load_config({"task": "Anymal"})
    cfg["task"]["env"]["learn"]["episodeLength_s"] = 0.5  # -> max_ep_len 30
    task = get_task("Anymal", cfg["task"])
    assert task.max_episode_length == 30
    env = VecEnv(task, 2)
    es = env.reset(seed=0)
    # reference quirk reproduced exactly: progress_buf increments BEFORE
    # is_done, and `time_out = progress >= max_episode_length - 1`, so the
    # timeout fires on step max_episode_length - 1 (episodes last 29 steps
    # for max_episode_length 30, reference rl_task.py:242 + anymal.py:290)
    for t in range(1, 32):
        es = env.step(es, jnp.zeros((2, env.num_actions)))
        done = np.asarray(es.done)
        if t < 29:
            assert not done.any(), f"early done at step {t}"
        elif t == 29:
            assert done.all(), "timeout must fire at step 29"
        else:
            # auto-reset: progress restarted, no immediate re-done
            assert not done.any()
