"""Training entry point.

Reference: scripts/rlgames_train.py (Hydra main -> VecEnv -> task ->
rl_games Runner). Usage:

    python -m omniisaacgymenvs_tpu.scripts.train task=Ant num_envs=4096 \
        seed=42 max_iterations=500 [test=True] [checkpoint=runs/Ant/nn/best]

Any nested config key can be overridden with dotted syntax, e.g.
train.params.config.horizon_length=32 (reference README.md:157-185).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.learn import PPOConfig, PPOTrainer
from omniisaacgymenvs_tpu.scripts.common import build_env_from_cli
from omniisaacgymenvs_tpu.utils.config import ppo_config_kwargs
from omniisaacgymenvs_tpu.utils.metrics import make_writer, maybe_init_wandb


def evaluate(trainer: PPOTrainer, episodes_envs: int = 1, steps: int = 1000):
    """Deterministic (mean-action) evaluation rollout (reference
    `test=True` inference path, scripts/rlgames_train.py:79-84).

    The whole rollout is one lax.scan per `steps` (single dispatch) — a
    per-step Python loop would pay the tunneled runtime's fixed ~25 ms
    per-dispatch latency 1000x (docs/performance.md)."""
    env = trainer.env
    es = env.reset(seed=123)
    ts = trainer.state
    total = jnp.zeros(env.num_envs)
    count = jnp.zeros(env.num_envs)
    ep_ret = jnp.zeros(env.num_envs)

    stats = env.task.episode_stats_init()

    def step(carry, _):
        es, hidden, cv_hidden, ep_ret, total, count, stats = carry
        mu, _v, _s, hidden, cv_hidden = trainer._policy(
            ts.params, ts, es.obs, es.states, hidden, cv_hidden
        )
        es = env._step_fn(es, jnp.clip(mu, -1.0, 1.0))
        if trainer.is_rnn:
            d = es.done[:, None]
            hidden = tuple(
                jnp.where(d, jnp.zeros_like(x), x) for x in hidden
            )
            cv_hidden = tuple(
                jnp.where(d, jnp.zeros_like(x), x) for x in cv_hidden
            )
        ep_ret = ep_ret + es.reward
        total = total + jnp.where(es.done, ep_ret, 0.0)
        count = count + es.done
        ep_ret = jnp.where(es.done, 0.0, ep_ret)
        stats = env.task.episode_stats_update(stats, es)
        return (es, hidden, cv_hidden, ep_ret, total, count, stats), None

    @jax.jit
    def rollout(carry):
        return jax.lax.scan(step, carry, None, length=steps)[0]

    es, _, _, ep_ret, total, count, stats = rollout(
        (es, ts.hidden, ts.cv_hidden, ep_ret, total, count, stats)
    )
    if isinstance(stats, dict):
        for k, v in stats.items():
            # task sentinels (e.g. the hands' consecutive-success EMA)
            print(f"eval: {k} = {float(v):.2f}")
    n = float(jnp.sum(count))
    if n == 0:
        # no episode finished within the horizon: report the mean running
        # return instead of 0
        return float(jnp.mean(ep_ret)), 0
    mean_ret = float(jnp.sum(total)) / n
    return mean_ret, int(n)


def main(argv=None):
    cfg, task, env = build_env_from_cli(argv)
    kw = ppo_config_kwargs(cfg["train"])
    if cfg.get("max_iterations"):
        kw["max_epochs"] = int(cfg["max_iterations"])
    trainer = PPOTrainer(env, PPOConfig(**kw), seed=int(cfg["seed"]))

    if cfg.get("checkpoint"):
        from omniisaacgymenvs_tpu.utils.paths import retrieve_checkpoint_path

        # remote checkpoints download once into checkpoints/ (reference
        # utils/config_utils/path_utils.py:54-67)
        trainer.load(retrieve_checkpoint_path(cfg["checkpoint"]))
        print(f"loaded checkpoint {cfg['checkpoint']}")

    experiment = cfg.get("experiment") or cfg["task_name"]
    run_dir = os.path.join("runs", experiment)
    if cfg.get("test"):
        # default horizon = one full episode of this task (+1 reset step)
        # so long-episode tasks (Anymal: 3000 steps) don't report only the
        # few episodes that ended early by falling; max_iterations
        # overrides (reference `test=True` runs until interrupted)
        steps = int(
            cfg.get("max_iterations")
            or getattr(task, "max_episode_length", 1000) + 1
        )
        mean_ret, n = evaluate(trainer, steps=steps)
        print(
            f"eval: mean episode reward {mean_ret:.2f} over {n} episodes "
            f"({steps} steps)"
        )
        return

    os.makedirs(os.path.join(run_dir, "nn"), exist_ok=True)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2, default=str)
    train_c = cfg["train"].get("params", {}).get("config", {})
    # TensorBoard under runs/<experiment>/summaries (reference rl_games
    # layout) + optional W&B (reference scripts/rlgames_train.py:110-125)
    writer = make_writer(os.path.join(run_dir, "summaries"))
    wandb_run = maybe_init_wandb(cfg)
    print(
        f"task={cfg['task_name']} num_envs={env.num_envs} "
        f"devices={len(jax.devices())} seed={cfg['seed']}"
    )
    # profile=N captures a jax.profiler trace of N post-warmup epochs to
    # runs/<experiment>/trace (tracing/profiling aux subsystem; the
    # reference has none, SURVEY.md §5)
    profile_epochs = int(cfg.get("profile", 0) or 0)
    history = []
    try:
        history = trainer.train(
            save_dir=os.path.join(run_dir, "nn"),
            save_frequency=train_c.get("save_frequency", 50),
            save_best_after=train_c.get("save_best_after", 100),
            log_every=1,
            writer=writer,
            profile_dir=(
                os.path.join(run_dir, "trace") if profile_epochs else None
            ),
            profile_epochs=profile_epochs,
            # epochs per XLA program: amortizes the tunneled runtime's fixed
            # per-dispatch cost; checkpoints land at chunk boundaries
            epochs_per_jit=int(cfg.get("epochs_per_jit", 10)),
            history_path=os.path.join(run_dir, "history.json"),
        )
    finally:
        writer.close()
        if wandb_run is not None:
            wandb_run.finish()
        # machine-readable learning record (consumed by LEARNING.json):
        # per-epoch metrics incl. Episode/* task stats
        if history:
            with open(os.path.join(run_dir, "history.json"), "w") as f:
                json.dump(history, f)


if __name__ == "__main__":
    main()
