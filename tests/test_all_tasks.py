"""Registry completeness: all 14 reference task names construct and step
(reference utils/task_util.py task_map)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.tasks import _registry, get_task

REFERENCE_NAMES = [
    "AllegroHand", "Ant", "Anymal", "AnymalTerrain", "BallBalance",
    "Cartpole", "Crazyflie", "FrankaCabinet", "Humanoid", "Ingenuity",
    "Quadcopter", "ShadowHand", "ShadowHandOpenAI_FF", "ShadowHandOpenAI_LSTM",
]


def test_all_reference_names_registered():
    names = set(_registry())
    missing = [n for n in REFERENCE_NAMES if n not in names]
    assert not missing, f"missing reference tasks: {missing}"


_FAST = [n for n in REFERENCE_NAMES
         if n not in ("AnymalTerrain", "ShadowHandOpenAI_LSTM")]


@pytest.mark.slow
@pytest.mark.parametrize("name", _FAST)
def test_construct_and_step(name):
    cfg = None
    if name == "AnymalTerrain":
        cfg = {"env": {"terrain": {"numLevels": 2, "numTerrains": 2,
                                   "mapLength": 4.0, "mapWidth": 4.0,
                                   "borderSize": 4.0}}}
    task = get_task(name, cfg)
    # shrink the episode so the SAME compiled step also exercises the pure
    # time-limit path: an episode ending only by time limit must have
    # timeout=True on the same step done goes True (rl_games value_bootstrap
    # semantics — the round-1 off-by-one made timeout dead on most tasks)
    task.max_episode_length = 2
    env = VecEnv(task, 2)
    es = env.reset(seed=0)
    assert es.obs.shape == (2, task.num_obs)
    saw_timeout = False
    for step in range(3):
        es = env.step(es, jnp.zeros((2, task.num_actions)))
        assert np.all(np.isfinite(np.asarray(es.obs)))
        assert np.all(np.isfinite(np.asarray(es.reward)))
        done = np.asarray(es.done)
        timeout = np.asarray(es.timeout)
        if timeout.any():
            saw_timeout = True
            # a time-limit end must also be flagged done
            assert done[timeout].all(), (
                f"{name}: timeout step not flagged done"
            )
        elif done.any():
            # nothing should terminate for another reason within 2 zero-
            # action steps from reset — if it does, the time-limit check
            # below is not exercised
            pytest.fail(f"{name}: unexpected early termination at {step}")
    assert saw_timeout, (
        f"{name}: pure time-limit episode never set timeout=True "
        f"(timeout_progress={task.timeout_progress})"
    )
