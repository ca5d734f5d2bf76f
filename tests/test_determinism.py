"""Fixed-seed reproducibility (BASELINE.md: fixed-seed trajectory match)
and checkpoint/resume roundtrip."""

import pytest

pytestmark = pytest.mark.slow

import jax
import numpy as np

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.learn import PPOConfig, PPOTrainer
from omniisaacgymenvs_tpu.tasks import get_task


def test_fixed_seed_trajectories_identical():
    """Two environments with the same seed must produce bitwise-identical
    trajectories (pure-function simulation; no hidden state)."""
    def run():
        env = VecEnv(get_task("Ant"), 4)
        es = env.reset(seed=7)
        rng = jax.random.PRNGKey(7)
        obs = []
        for _ in range(10):
            rng, k = jax.random.split(rng)
            a = jax.random.uniform(k, (4, 8), minval=-1, maxval=1)
            es = env.step(es, a)
            obs.append(np.asarray(es.obs))
        return np.stack(obs)

    t1, t2 = run(), run()
    np.testing.assert_array_equal(t1, t2)


def test_training_seed_reproducible():
    def train():
        env = VecEnv(get_task("Cartpole"), 16)
        cfg = PPOConfig(horizon_length=8, minibatch_size=128, mini_epochs=2,
                        units=(16, 16), reward_shaper_scale=0.1)
        tr = PPOTrainer(env, cfg, seed=3)
        h = tr.train(max_epochs=3, log_every=1, log_fn=None)
        return [x["mean_step_reward"] for x in h]

    assert train() == train()


def test_checkpoint_resume_roundtrip(tmp_path):
    env = VecEnv(get_task("Cartpole"), 16)
    cfg = PPOConfig(horizon_length=8, minibatch_size=128, mini_epochs=2,
                    units=(16, 16), reward_shaper_scale=0.1)
    tr = PPOTrainer(env, cfg, seed=3)
    tr.train(max_epochs=2, log_every=1, log_fn=None)
    path = str(tmp_path / "ckpt")
    tr.save(path)

    tr2 = PPOTrainer(env, cfg, seed=99)
    tr2.load(path)
    # restored parameters identical
    for a, b in zip(
        jax.tree.leaves(tr.state.params), jax.tree.leaves(tr2.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(tr2.state.epoch) == int(tr.state.epoch)
    # training continues from the checkpoint without error
    h = tr2.train(max_epochs=1, log_every=1, log_fn=None)
    assert np.isfinite(h[0]["kl"])
