"""Every shipped train config drives one real PPO epoch.

The reference couples each cfg/train/<T>PPO.yaml to rl_games at runtime
only — a bad key is discovered mid-training. Here every yaml is parsed
through ppo_config_kwargs and exercised end to end (rollout + GAE +
minibatch SGD, incl. the asymmetric central-value and LSTM variants) at
tiny scale on CPU (reference cfg/train/*PPO.yaml, SURVEY.md §2.5).
"""

import pytest

pytestmark = pytest.mark.slow

import dataclasses
import os

import jax
import pytest

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.learn import PPOConfig, PPOTrainer
from omniisaacgymenvs_tpu.tasks import get_task
from omniisaacgymenvs_tpu.utils.config import CFG_DIR, load_config, ppo_config_kwargs

TRAIN_YAMLS = sorted(
    f[: -len("PPO.yaml")]
    for f in os.listdir(os.path.join(CFG_DIR, "train"))
    if f.endswith("PPO.yaml")
)

# small terrain so AnymalTerrain builds fast on CPU
_TINY_TERRAIN = {"numLevels": 2, "numTerrains": 2, "mapLength": 4.0,
                 "mapWidth": 4.0, "borderSize": 4.0}


def test_every_reference_train_yaml_is_shipped():
    ref_names = {
        "AllegroHand", "Ant", "Anymal", "AnymalTerrain", "BallBalance",
        "Cartpole", "Crazyflie", "FrankaCabinet", "Humanoid", "Ingenuity",
        "Quadcopter", "ShadowHand", "ShadowHandOpenAI_FF",
        "ShadowHandOpenAI_LSTM",
    }
    assert set(TRAIN_YAMLS) == ref_names


@pytest.mark.parametrize("name", TRAIN_YAMLS)
def test_train_yaml_one_epoch(name):
    cfg = load_config({"task": name})
    task_cfg = cfg["task"]
    if name == "AnymalTerrain":
        task_cfg.setdefault("env", {})["terrain"] = _TINY_TERRAIN
    task = get_task(name, task_cfg)

    num_envs = 8
    env = VecEnv(task, num_envs)

    kw = ppo_config_kwargs(cfg["train"])
    # shrink the schedule, keep the parsed network/PPO hyperparameters
    horizon = max(kw.get("seq_len", 1), 4)
    kw.update(horizon_length=horizon, minibatch_size=num_envs * horizon,
              mini_epochs=1, max_epochs=1)
    ppo_cfg = PPOConfig(**kw)
    assert dataclasses.is_dataclass(ppo_cfg)

    trainer = PPOTrainer(env, ppo_cfg, seed=0)
    trainer.state, metrics = trainer._epoch_jit(trainer.state)
    jax.block_until_ready(metrics)
    assert bool(jax.numpy.isfinite(metrics["kl"])), (name, metrics)

    # variant-specific wiring actually engaged
    if name == "ShadowHandOpenAI_LSTM":
        assert trainer.is_rnn
        # the LSTM variant's central value is itself an LSTM with its own
        # optimizer (reference ShadowHandOpenAI_LSTMPPO.yaml:80-105)
        assert trainer.is_cv_rnn
        assert trainer.state.cv_hidden != ()
    if name.startswith("ShadowHandOpenAI"):
        assert trainer.use_cv
        # separate CV training state: own params + own optimizer state
        assert trainer.state.cv_params != ()
        assert trainer.state.cv_opt_state != ()
        assert "cv" not in trainer.state.params
        assert bool(jax.numpy.isfinite(metrics["cv_loss"])), (name, metrics)
        # CV hyperparameters come from the yaml's central_value_config
        if name == "ShadowHandOpenAI_FF":
            assert trainer.cfg.cv_mini_epochs == 8
            assert trainer.cfg.cv_learning_rate == 5e-4
        else:
            assert trainer.cfg.cv_mini_epochs == 4
            assert trainer.cfg.cv_learning_rate == 1e-4
