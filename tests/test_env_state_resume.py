"""Checkpoint env-state continuity (r5).

The main checkpoint carries params/opt/normalizers/epoch; the `<path>_env`
sidecar carries the per-env continuity state (mid-episode phys/carry —
including AnymalTerrain's per-env curriculum level — RNN hiddens, episode
stats, task EMAs). A watchdog resume must continue mid-episode instead of
resetting every env to curriculum level 0 with zeroed EMAs (the r5
two-phase terrain experiment lost its ~5.7 pre-trained levels to exactly
that reset).
"""

import os

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.envs.vec_env import VecEnv
from omniisaacgymenvs_tpu.learn import PPOConfig, PPOTrainer
from omniisaacgymenvs_tpu.tasks import get_task


def _make(num_envs=16, seed=11):
    env = VecEnv(get_task("Cartpole"), num_envs)
    cfg = PPOConfig(
        horizon_length=16, minibatch_size=256, mini_epochs=2,
        reward_shaper_scale=0.1, units=(32, 32),
    )
    return PPOTrainer(env, cfg, seed=seed)


def _leaves_equal(a, b):
    return jax.tree.all(jax.tree.map(
        lambda x, y: jnp.array_equal(jnp.asarray(x), jnp.asarray(y)), a, b
    ))


def test_env_state_survives_resume(tmp_path):
    save_dir = str(tmp_path / "nn")
    tr = _make()
    tr.train(max_epochs=4, log_every=1, log_fn=None, save_dir=save_dir,
             save_frequency=2, save_best_after=100)
    path = os.path.join(save_dir, "last")
    assert os.path.isdir(path + "_env"), "env-state sidecar not written"

    tr2 = _make(seed=99)  # different seed: fresh state differs for sure
    tr2.load(path)
    # mid-episode env state continues: progress counters, obs, episode
    # returns and the score window all match the saved trainer exactly
    assert _leaves_equal(tr2.state.es.progress, tr.state.es.progress)
    assert _leaves_equal(tr2.state.es.obs, tr.state.es.obs)
    assert _leaves_equal(tr2.state.ep_ret, tr.state.ep_ret)
    assert _leaves_equal(tr2.state.ep_len, tr.state.ep_len)
    assert float(tr2.state.score_mean) == float(tr.state.score_mean)
    assert float(tr2.state.games) == float(tr.state.games)
    assert not bool(jnp.all(tr2.state.es.progress == 0)), (
        "progress all-zero after 4 epochs of 16-step rollouts is a reset, "
        "not a resume"
    )
    # and training continues without error from the restored env state
    # (2 remaining epochs: resume is at epoch 4 of 6)
    h = tr2.train(max_epochs=6, log_every=1, log_fn=None)
    assert len(h) == 2 and all(
        jnp.isfinite(m["mean_step_reward"]) for m in h
    )


def test_old_checkpoint_without_sidecar_still_loads(tmp_path):
    import shutil

    save_dir = str(tmp_path / "nn")
    tr = _make()
    tr.train(max_epochs=2, log_every=1, log_fn=None, save_dir=save_dir,
             save_frequency=2, save_best_after=100)
    path = os.path.join(save_dir, "last")
    shutil.rmtree(path + "_env")  # simulate an r1-r5 checkpoint
    tr2 = _make(seed=99)
    before = jax.tree.map(jnp.asarray, tr2.state.es.obs)
    tr2.load(path)
    assert int(tr2.state.epoch) == 2
    # env state untouched (fresh envs)
    assert _leaves_equal(tr2.state.es.obs, before)


def test_sidecar_num_envs_mismatch_is_ignored(tmp_path):
    save_dir = str(tmp_path / "nn")
    tr = _make(num_envs=16)
    tr.train(max_epochs=2, log_every=1, log_fn=None, save_dir=save_dir,
             save_frequency=2, save_best_after=100)
    path = os.path.join(save_dir, "last")
    tr2 = _make(num_envs=32, seed=99)
    before = jax.tree.map(jnp.asarray, tr2.state.es.obs)
    tr2.load(path)  # params load; sidecar shape-mismatched -> ignored
    assert int(tr2.state.epoch) == 2
    assert tr2.state.es.obs.shape[0] == 32
    assert _leaves_equal(tr2.state.es.obs, before)
