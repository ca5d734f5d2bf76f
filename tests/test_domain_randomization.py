"""DR subsystem tests (reference utils/domain_randomization semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.tasks import get_task

DR_CFG = {
    "domain_randomization": {
        "randomize": True,
        "randomization_params": {
            "observations": {
                "on_reset": {"operation": "additive",
                             "distribution": "gaussian",
                             "distribution_parameters": [0.0, 0.01]},
                "on_interval": {"frequency_interval": 1,
                                "operation": "additive",
                                "distribution": "gaussian",
                                "distribution_parameters": [0.0, 0.002]},
            },
            "actions": {
                "on_reset": {"operation": "additive",
                             "distribution": "gaussian",
                             "distribution_parameters": [0.0, 0.015]},
                "on_interval": {"frequency_interval": 1,
                                "operation": "additive",
                                "distribution": "gaussian",
                                "distribution_parameters": [0.0, 0.05]},
            },
            "articulation_views": {
                "robot_view": {
                    "mass": {"on_reset": {"operation": "scaling",
                                          "distribution": "uniform",
                                          "distribution_parameters": [0.8, 1.2]}},
                    "stiffness": {"on_reset": {"operation": "scaling",
                                               "distribution": "uniform",
                                               "distribution_parameters": [0.75, 1.5]}},
                },
            },
        },
    }
}


def test_dr_changes_obs_noise():
    task_plain = get_task("Anymal")
    task_dr = get_task("Anymal", dict(DR_CFG))
    assert not task_plain._dr_on and task_dr._dr_on
    env0 = VecEnv(task_plain, 4)
    env1 = VecEnv(task_dr, 4)
    es0 = env0.reset(seed=0)
    es1 = env1.reset(seed=0)
    a = jnp.zeros((4, 12))
    for _ in range(3):
        es0 = env0.step(es0, a)
        es1 = env1.step(es1, a)
    # DR run must differ from the clean run (noise + mass/stiffness scales)
    assert not np.allclose(np.asarray(es0.obs), np.asarray(es1.obs), atol=1e-5)
    assert np.all(np.isfinite(np.asarray(es1.obs)))
    # overlay present in carry with the right shapes
    ov = es1.carry["_dr"]["overlay"]
    assert ov["mass_scale"].shape == (4, task_dr.model.nb)
    assert ov["stiffness_scale"].shape == (4, task_dr.model.njd)
    # per-env overlay actually varies across envs
    assert np.std(np.asarray(ov["mass_scale"][:, 0])) > 0


def test_dr_schedulable_parameters():
    task = get_task("Anymal", dict(DR_CFG))
    r = task.randomizer
    p = r.get_dr_distribution_parameters("observations", "on_reset")
    assert p == [0.0, 0.01]
    r.set_dr_distribution_parameters([0.0, 0.1], "observations", "on_reset")
    assert r.get_dr_distribution_parameters(
        "observations", "on_reset") == [0.0, 0.1]
