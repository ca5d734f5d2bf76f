"""PPO learning-curve regression (BASELINE.md: Cartpole reward > 400 with
32 envs, CPU-runnable — the PR1 convergence sentinel)."""

import numpy as np

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.learn import PPOConfig, PPOTrainer
from omniisaacgymenvs_tpu.tasks import get_task


def test_cartpole_learns():
    env = VecEnv(get_task("Cartpole"), 32)
    cfg = PPOConfig(
        horizon_length=32,
        minibatch_size=1024,
        mini_epochs=8,
        critic_coef=4.0,
        reward_shaper_scale=0.1,
        units=(32, 32),
    )
    tr = PPOTrainer(env, cfg, seed=42)
    hist = tr.train(
        max_epochs=300, log_every=10, log_fn=None, score_target=410.0
    )
    best = max(h["mean_ep_reward"] for h in hist)
    assert best > 400.0, f"best mean episode reward {best}"


def test_ppo_epoch_is_finite_and_improves_early():
    env = VecEnv(get_task("Cartpole"), 16)
    cfg = PPOConfig(
        horizon_length=16, minibatch_size=256, mini_epochs=4,
        reward_shaper_scale=0.1, units=(32, 32),
    )
    tr = PPOTrainer(env, cfg, seed=0)
    hist = tr.train(max_epochs=20, log_every=1, log_fn=None)
    for h in hist:
        assert np.isfinite(h["mean_step_reward"])
        assert np.isfinite(h["kl"])
    # learning signal: later mean step reward above initial
    assert hist[-1]["mean_step_reward"] > hist[0]["mean_step_reward"]


def test_mixed_precision_trains_finite():
    """mixed_precision=True (bf16 network compute, f32 params/losses —
    rl_games cfg key) must keep metrics finite and show early learning."""
    env = VecEnv(get_task("Cartpole"), 16)
    cfg = PPOConfig(
        horizon_length=16, minibatch_size=256, mini_epochs=4,
        reward_shaper_scale=0.1, units=(32, 32), mixed_precision=True,
    )
    tr = PPOTrainer(env, cfg, seed=0)
    hist = tr.train(max_epochs=20, log_every=1, log_fn=None)
    for h in hist:
        assert np.isfinite(h["mean_step_reward"])
        assert np.isfinite(h["kl"])
    assert hist[-1]["mean_step_reward"] > hist[0]["mean_step_reward"]


def test_evaluate_scan_matches_stepwise_loop():
    """scripts.train.evaluate is one lax.scan; it must match a plain
    per-step Python loop that carries (and on-done resets) the LSTM
    hidden state — regression for the stale-hidden eval bug."""
    import jax
    import jax.numpy as jnp

    from omniisaacgymenvs_tpu.scripts.train import evaluate

    env = VecEnv(get_task("Cartpole"), 16)
    cfg = PPOConfig(
        horizon_length=8, minibatch_size=64, mini_epochs=1,
        units=(16, 16), rnn_units=8, seq_len=4,
    )
    tr = PPOTrainer(env, cfg, seed=1)
    steps = 80
    got = evaluate(tr, steps=steps)

    ts = tr.state
    es = env.reset(seed=123)
    hidden = ts.hidden
    total = jnp.zeros(env.num_envs)
    count = jnp.zeros(env.num_envs)
    ep_ret = jnp.zeros(env.num_envs)
    for _ in range(steps):
        mu, _v, _s, hidden, _cvh = tr._policy(
            ts.params, ts, es.obs, es.states, hidden
        )
        es = env._step_fn(es, jnp.clip(mu, -1.0, 1.0))
        d = es.done[:, None]
        hidden = tuple(jnp.where(d, jnp.zeros_like(x), x) for x in hidden)
        ep_ret = ep_ret + es.reward
        total = total + jnp.where(es.done, ep_ret, 0.0)
        count = count + es.done
        ep_ret = jnp.where(es.done, 0.0, ep_ret)
    n = float(jnp.sum(count))
    want = (
        (float(jnp.sum(total)) / n, int(n))
        if n else (float(jnp.mean(ep_ret)), 0)
    )
    assert got[1] == want[1]
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4)


def test_chunked_epochs_match_single():
    """epochs_per_jit>1 (lax.scan over the epoch body) must reproduce the
    per-epoch metrics of the sequential path."""
    env = VecEnv(get_task("Cartpole"), 16)
    cfg = PPOConfig(
        horizon_length=16, minibatch_size=256, mini_epochs=2,
        reward_shaper_scale=0.1, units=(32, 32),
    )
    h1 = PPOTrainer(env, cfg, seed=3).train(
        max_epochs=6, log_every=1, log_fn=None
    )
    h2 = PPOTrainer(env, cfg, seed=3).train(
        max_epochs=6, log_every=1, log_fn=None, epochs_per_jit=3
    )
    assert len(h1) == len(h2) == 6
    for a, b in zip(h1, h2):
        assert a["epoch"] == b["epoch"]
        assert abs(a["mean_ep_reward"] - b["mean_ep_reward"]) < 1e-2
        assert abs(a["kl"] - b["kl"]) < 1e-3


def test_killed_run_resumes_from_checkpoint_epoch(tmp_path):
    """A run killed mid-campaign and retried with checkpoint=nn/last must
    CONTINUE from its saved epoch with one continuous history.json — not
    restart from epoch 0 (the round-4 FF casualty: a wedge at epoch
    5539/10000 retried from scratch)."""
    import json
    import os

    def make():
        env = VecEnv(get_task("Cartpole"), 16)
        cfg = PPOConfig(
            horizon_length=16, minibatch_size=256, mini_epochs=2,
            reward_shaper_scale=0.1, units=(32, 32),
        )
        return PPOTrainer(env, cfg, seed=11)

    save_dir = str(tmp_path / "nn")
    hist_path = str(tmp_path / "history.json")
    # "first attempt": 6 epochs, checkpointing every 2
    tr = make()
    tr.train(
        max_epochs=6, log_every=1, log_fn=None, save_dir=save_dir,
        save_frequency=2, save_best_after=100, history_path=hist_path,
    )
    # "retry after kill": fresh process -> fresh trainer + load last
    tr2 = make()
    tr2.load(os.path.join(save_dir, "last"))
    assert int(tr2.state.epoch) == 6
    h = tr2.train(
        max_epochs=10, log_every=1, log_fn=None, save_dir=save_dir,
        save_frequency=2, save_best_after=100, history_path=hist_path,
    )
    # returned history = prior rows + new rows, continuously numbered
    assert [m["epoch"] for m in h] == list(range(10))
    with open(hist_path) as f:
        on_disk = json.load(f)
    assert [m["epoch"] for m in on_disk] == list(range(10))
    # env_steps stays the absolute cumulative count
    assert on_disk[-1]["env_steps"] == 10 * 16 * 16


def test_episode_score_window_persists_across_empty_epochs():
    """mean_ep_reward must report the running mean of recently completed
    episodes (rl_games AverageMeter games_to_track=100), NOT drop to 0 on
    epochs whose horizon window contains no episode end — previously tasks
    with timeout-only episodes (e.g. FrankaCabinet, 500 steps vs horizon
    16) logged 0.00 for the entire run."""
    env = VecEnv(get_task("Cartpole"), 2)
    cfg = PPOConfig(horizon_length=8, minibatch_size=16, mini_epochs=1,
                    units=(16,))
    tr = PPOTrainer(env, cfg, seed=0)
    rows = []
    for _ in range(40):
        tr.state, m = tr._epoch_jit(tr.state)
        rows.append({k: float(v) for k, v in m.items()})
    # some window must be empty and some not for the test to be meaningful
    empties = [r for r in rows if r["episodes"] == 0]
    nonempties = [r for r in rows if r["episodes"] > 0]
    assert empties and nonempties
    seen_score = False
    prev = None
    for r in rows:
        if r["episodes"] == 0 and prev is not None and seen_score:
            assert r["mean_ep_reward"] == prev["mean_ep_reward"]
            assert r["mean_ep_reward"] != 0.0
        if r["episodes"] > 0:
            seen_score = True
        prev = r


def test_score_window_survives_many_episode_ends_per_epoch():
    """Regression: >100 episode completions inside one rollout window made
    the capped-at-100 incremental mean an over-relaxation (w = cnt/100 > 1),
    which diverges with alternating sign and then poisons ep_rew/ep_len
    with nan for the rest of the run (observed on Quadcopter @4096 envs,
    229-345 episode ends per 16-step window)."""

    # episodes last at most 2 steps -> 256 envs * 16 steps / 2 >> 100
    task = get_task("Cartpole")
    task.max_episode_length = 2
    env = VecEnv(task, 256)
    cfg = PPOConfig(
        horizon_length=16, minibatch_size=1024, mini_epochs=1, units=(16,),
    )
    tr = PPOTrainer(env, cfg, seed=0)
    hist = tr.train(max_epochs=6, log_every=1, log_fn=None)
    for h in hist:
        assert np.isfinite(h["mean_ep_reward"]), hist
        assert np.isfinite(h["mean_ep_length"]), hist
        # episode length can never exceed the 2-step cap (a diverging mean
        # would blow through this immediately)
        assert 0.0 <= h["mean_ep_length"] <= 2.5, hist


def test_value_bootstrap_changes_gae_targets_on_timeouts():
    """An episode ending purely by time limit must trigger the rl_games
    value_bootstrap reward patch (rewards += gamma*values*time_outs) —
    regression for the round-1 off-by-one where EnvState.timeout fired one
    step after the tasks' `progress >= max_episode_length - 1` termination
    and the bootstrap was dead on every task."""
    import dataclasses

    import jax

    task = get_task("Cartpole")
    task.max_episode_length = 8  # timeouts occur inside a 16-step horizon
    env = VecEnv(task, 8)
    cfg = PPOConfig(horizon_length=16, minibatch_size=64, mini_epochs=1,
                    units=(16,), value_bootstrap=True)
    tr = PPOTrainer(env, cfg, seed=0)
    _, traj_b, last_b, _ = jax.jit(tr._rollout)(tr.state)

    tr2 = PPOTrainer(env, dataclasses.replace(cfg, value_bootstrap=False),
                     seed=0)
    _, traj_n, last_n, _ = jax.jit(tr2._rollout)(tr2.state)

    # identical policies/seeds -> identical actions; only the shaped reward
    # at timeout steps may differ, and it MUST differ somewhere
    np.testing.assert_allclose(
        np.asarray(traj_b["action"]), np.asarray(traj_n["action"]), atol=1e-6
    )
    dr = np.abs(np.asarray(traj_b["reward"]) - np.asarray(traj_n["reward"]))
    assert dr.max() > 1e-4, "value_bootstrap changed nothing"

    adv_b, ret_b = tr._gae(traj_b, last_b)
    adv_n, ret_n = tr2._gae(traj_n, last_n)
    assert np.abs(np.asarray(ret_b) - np.asarray(ret_n)).max() > 1e-4


def test_consecutive_successes_reference_ema():
    """InHandManipulationTask.episode_stats_update must implement the
    reference completed-episode EMA (in_hand_manipulation.py:394-396), not a
    mean over all envs."""
    import types

    import jax.numpy as jnp

    task = get_task("AllegroHand")
    av = task.av_factor
    stats = task.episode_stats_init()
    assert float(stats["consecutive_successes"]) == 0.0

    es = types.SimpleNamespace(
        done=jnp.array([True, False, True, False]),
        metrics={"successes": jnp.array([4.0, 9.0, 2.0, 9.0])},
    )
    stats = task.episode_stats_update(stats, es)
    want = av * (4.0 + 2.0) / 2.0  # only DONE envs count
    np.testing.assert_allclose(
        float(stats["consecutive_successes"]), want, rtol=1e-6
    )
    # a step with no resets leaves the EMA untouched
    es2 = types.SimpleNamespace(
        done=jnp.array([False] * 4),
        metrics={"successes": jnp.array([5.0] * 4)},
    )
    stats2 = task.episode_stats_update(stats, es2)
    np.testing.assert_allclose(
        float(stats2["consecutive_successes"]), want, rtol=1e-6
    )
    # second reset step blends with factor (1 - av)
    stats3 = task.episode_stats_update(stats2, es)
    want3 = av * 3.0 + (1 - av) * want
    np.testing.assert_allclose(
        float(stats3["consecutive_successes"]), want3, rtol=1e-6
    )


def _cartpole_with_states(n_envs):
    """Cartpole exposing its obs as privileged states — a minimal
    asymmetric-critic fixture (the real consumers are the ShadowHand OpenAI
    variants, whose physics is too heavy for a CPU learning test)."""
    task = get_task("Cartpole")
    task.num_states = 4
    orig_observe = task.observe

    def observe(phys, carry, action):
        obs, _, carry = orig_observe(phys, carry, action)
        return obs, obs, carry

    task.observe = observe
    return VecEnv(task, n_envs)


def test_central_value_learns_with_own_optimizer():
    """Separate-CV PPO (rl_games central_value_config semantics: own
    network/optimizer/minibatching, actor update carries no critic term)
    must still learn cartpole."""
    env = _cartpole_with_states(32)
    cfg = PPOConfig(
        horizon_length=32, minibatch_size=1024, mini_epochs=4,
        critic_coef=4.0, reward_shaper_scale=0.1, units=(32, 32),
        central_value=True, cv_units=(32, 32),
        cv_minibatch_size=512, cv_mini_epochs=4, cv_learning_rate=1e-3,
    )
    tr = PPOTrainer(env, cfg, seed=42)
    assert tr.use_cv and not tr.is_cv_rnn
    hist = tr.train(max_epochs=150, log_every=10, log_fn=None,
                    score_target=350.0)
    best = max(h["mean_ep_reward"] for h in hist)
    assert best > 250.0, f"best mean episode reward {best}"
    for h in hist:
        assert np.isfinite(h["cv_loss"])
    # CV loss should come down as the value function fits
    assert hist[-1]["cv_loss"] < hist[0]["cv_loss"] * 2


def test_lstm_central_value_trains_finite():
    """LSTM actor + LSTM central value (ShadowHandOpenAI_LSTMPPO.yaml
    :80-105) — short run, finite metrics, both recurrent states engaged."""
    env = _cartpole_with_states(16)
    cfg = PPOConfig(
        horizon_length=16, minibatch_size=256, mini_epochs=2,
        reward_shaper_scale=0.1, units=(16,), rnn="lstm", rnn_units=16,
        seq_len=4, central_value=True, cv_units=(16,),
        cv_minibatch_size=128, cv_mini_epochs=2, cv_learning_rate=1e-3,
        cv_rnn="lstm", cv_rnn_units=16,
    )
    tr = PPOTrainer(env, cfg, seed=1)
    assert tr.is_cv_rnn
    hist = tr.train(max_epochs=10, log_every=1, log_fn=None)
    for h in hist:
        assert np.isfinite(h["mean_step_reward"])
        assert np.isfinite(h["kl"])
        assert np.isfinite(h["cv_loss"])


def test_rnn_ratio_starts_at_one_under_norm_updates():
    """With obs normalization on and lr ~ 0, the epoch KL must be ~0 for
    the RNN path: obs-norm stats now update AFTER the SGD phase, so the
    replay normalizes with the same stats the rollout used and the stored
    behavior logp is the true replay logp (ratio starts at 1). Regression:
    updating the stats before the SGD phase made the norm shift masquerade
    as policy KL and pinned the adaptive LR at its floor
    (round-3 ShadowHandOpenAI_LSTM). The residual ~1e-5 is numerical:
    rollout evaluates per-step on (N, obs), replay scans (B, seq) chunks —
    different fusion, same math."""
    env = _cartpole_with_states(16)
    cfg = PPOConfig(
        horizon_length=16, minibatch_size=64, mini_epochs=2,
        units=(16,), rnn="lstm", rnn_units=16, seq_len=4,
        normalize_input=True, learning_rate=1e-15, lr_schedule="fixed",
    )
    tr = PPOTrainer(env, cfg, seed=0)
    for _ in range(3):
        tr.state, m = tr._epoch_jit(tr.state)
        assert float(m["kl"]) < 1e-3, float(m["kl"])


def test_rnn_ratio_one_with_mid_chunk_dones():
    """Same ratio-starts-at-1 property when episodes END INSIDE seq
    chunks: the BPTT replay must reset hidden at done steps exactly like
    the rollout did. Regression (r4): without the mid-chunk reset every
    chunk containing a done replayed from a diverged hidden state,
    producing an irreducible KL floor ~0.03 that pinned the adaptive LR
    at lr_min for the whole ShadowHandOpenAI_LSTM run."""
    env = _cartpole_with_states(16)
    env.task.max_episode_length = 5  # dones inside most 4-step chunks
    cfg = PPOConfig(
        horizon_length=16, minibatch_size=64, mini_epochs=2,
        units=(16,), rnn="lstm", rnn_units=16, seq_len=4,
        normalize_input=True, learning_rate=1e-15, lr_schedule="fixed",
    )
    tr = PPOTrainer(env, cfg, seed=0)
    for _ in range(3):
        tr.state, m = tr._epoch_jit(tr.state)
        assert float(m["kl"]) < 1e-3, float(m["kl"])


def test_vmapped_permutation_matches_sequential():
    """_update/_cv_update hoist the per-mini-epoch shuffles into one
    batched sort (vmapped jax.random.permutation). The optimization is
    only sound if the vmapped form produces bitwise the same permutations
    as the sequential calls it replaced."""
    import jax
    import jax.numpy as jnp

    keys = jax.random.split(jax.random.PRNGKey(7), 5)
    n = 4096
    batched = jax.vmap(lambda k: jax.random.permutation(k, n))(keys)
    for i, k in enumerate(keys):
        expect = jax.random.permutation(k, n)
        assert jnp.array_equal(batched[i], expect)


def test_resume_preserves_best_checkpoint_watermark(tmp_path):
    """nn/best is guarded by a sidecar watermark (best_meta.json): with
    log_every>1 the chunk-final epochs that are best-candidates are mostly
    absent from history.json, so a resumed run that rebuilt best_reward
    from history alone could overwrite nn/best with a WORSE policy."""
    import json
    import os

    def make():
        env = VecEnv(get_task("Cartpole"), 16)
        cfg = PPOConfig(
            horizon_length=16, minibatch_size=256, mini_epochs=2,
            reward_shaper_scale=0.1, units=(32, 32),
        )
        return PPOTrainer(env, cfg, seed=11)

    save_dir = str(tmp_path / "nn")
    hist_path = str(tmp_path / "history.json")
    tr = make()
    tr.train(
        max_epochs=6, log_every=5, log_fn=None, save_dir=save_dir,
        save_frequency=2, save_best_after=0, history_path=hist_path,
    )
    meta_path = os.path.join(save_dir, "best_meta.json")
    assert os.path.exists(meta_path)
    with open(meta_path) as f:
        meta = json.load(f)
    # pretend the killed run had seen a very good policy
    with open(meta_path, "w") as f:
        json.dump({"best_reward": 1e9, "epoch": meta["epoch"]}, f)
    best_mtime = os.path.getmtime(os.path.join(save_dir, "best"))
    tr2 = make()
    tr2.load(os.path.join(save_dir, "last"))
    tr2.train(
        max_epochs=10, log_every=5, log_fn=None, save_dir=save_dir,
        save_frequency=2, save_best_after=0, history_path=hist_path,
    )
    # the worse post-resume policy must NOT have overwritten nn/best
    assert os.path.getmtime(os.path.join(save_dir, "best")) == best_mtime
