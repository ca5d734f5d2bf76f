"""In-hand manipulation task tests (ShadowHand / AllegroHand)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.tasks import get_task


@pytest.mark.parametrize(
    "name,num_obs,num_states,num_act",
    [
        ("ShadowHand", 157, 0, 20),
        ("AllegroHand", 72, 0, 16),
        ("ShadowHandOpenAI_FF", 42, 187, 20),
    ],
)
def test_dims(name, num_obs, num_states, num_act):
    task = get_task(name)
    env = VecEnv(task, 2)
    es = env.reset(seed=0)
    assert es.obs.shape == (2, num_obs)
    assert es.states.shape == (2, num_states)
    assert task.num_actions == num_act


def test_object_rests_on_palm():
    """Zero actions: the cube population must come to REST on the palm.
    A randomly-oriented cube can legitimately topple off (the reference
    behaves the same — untrained episodes end within a second by
    fallDistance), but a fallen env auto-resets and the re-dropped cube
    settles — so after 1 s every env must be sitting on the palm, with no
    tunneling through it (stiction + dense box contact sampling)."""
    env = VecEnv(get_task("ShadowHand"), 8)
    es = env.reset(seed=0)
    for _ in range(60):
        es = env.step(es, jnp.zeros((8, 20)))
    qa = env.task._obj_q
    z = np.asarray(es.phys.q[:, qa + 2])
    assert np.all(z > 0.45), z  # palm top ~0.50
    assert np.all(np.isfinite(np.asarray(es.obs)))


def test_success_goal_reset():
    """Forcing object rotation near the goal triggers success counting and
    a goal-only reset (not an env reset)."""
    task = get_task("ShadowHand")
    env = VecEnv(task, 2)
    es = env.reset(seed=0)
    # snap object orientation to the goal
    qa = task._obj_q
    goal_rot = es.carry["goal_rot"]
    q = es.phys.q
    q = q.at[:, qa + 3 : qa + 7].set(goal_rot)
    es = es.replace(phys=es.phys.replace(q=q))
    es = env.step(es, jnp.zeros((2, 20)))
    assert np.all(np.asarray(es.carry["successes"]) >= 1)
    assert np.all(np.asarray(es.reward) > 100.0)  # reach-goal bonus 250
    assert not np.any(np.asarray(es.done))
    # next step re-randomizes the goal away from the object
    goal_before = np.asarray(es.carry["goal_rot"])
    es = env.step(es, jnp.zeros((2, 20)))
    assert not np.allclose(np.asarray(es.carry["goal_rot"]), goal_before)


def test_fall_terminates():
    task = get_task("ShadowHand")
    env = VecEnv(task, 2)
    es = env.reset(seed=0)
    qa = task._obj_q
    q = es.phys.q.at[:, qa + 2].set(0.1)  # teleport object far below
    es = es.replace(phys=es.phys.replace(q=q))
    es = env.step(es, jnp.zeros((2, 20)))
    assert np.all(np.asarray(es.done))


def test_allegro_cradle_retains_cube():
    """The r4 AllegroHand cradle scene (tilted palm, thumb walling the
    downhill edge, curled fingers — models/allegro_hand.py DEFAULT_SCENE):
    holding the default pose must keep most randomly-oriented cubes inside
    the fall distance for 1 s, with rich enough contact that obs stay
    finite. Guards the scene against regressions of the round-3
    hold-the-cube degenerate optimum (VERDICT r3 #1)."""
    from omniisaacgymenvs_tpu.physics import rotations as rot

    task = get_task("AllegroHand")
    env = VecEnv(task, 8)
    m = task.model
    default = np.asarray(m.default_q)[np.asarray(m.jq_idx)]
    hold = np.clip(
        np.asarray(rot.unscale(default, m.dof_limit_lower,
                               m.dof_limit_upper)), -1, 1)
    acts = jnp.tile(jnp.asarray(hold, jnp.float32), (8, 1))
    es = env.reset(seed=0)
    falls = 0
    for _ in range(60):
        es = env.step(es, acts)
        falls += int(np.asarray(es.done).sum())
    assert np.all(np.isfinite(np.asarray(es.obs)))
    # static retention ~0.75 (tools/allegro_scene_lab.py); 8 envs x 60
    # steps should see at most a couple of drops
    assert falls <= 3, f"cradle dropped the cube {falls} times"
