"""Phase-level profile of the ShadowHandOpenAI_LSTM PPO epoch (VERDICT r3
#3: LSTM path runs at 186k steps/s vs 837k FF — find the 4.5x).

Times each phase of PPOTrainer._epoch under its own jit: rollout (policy
LSTM + physics), GAE, central-value SGD, actor SGD — plus an MXU micro
benchmark of the dominant LSTM matmul shape in f32 vs bf16.

Usage: python tools/lstm_profile.py [num_envs] [task]
"""

import os as _os
import sys as _sys
import time

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.learn import PPOConfig, PPOTrainer
from omniisaacgymenvs_tpu.tasks import get_task
from omniisaacgymenvs_tpu.utils.config import load_config, ppo_config_kwargs


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n, out


def matmul_bench():
    # chain 32 dependent matmuls per timed call so the measurement is not
    # dominated by dispatch latency and cannot be constant-folded.
    # NOTE: the old form `a = (a @ b)[:, :k] * 0.5` let XLA fuse the slice
    # into the dot (computing only k of n output columns) and reuse the
    # sliced operand across iterations — the r5 humanoid_profile.log
    # printed a physically impossible 17.8 PFLOP/s. The scalar-feedback
    # form consumes EVERY product element via a mean and feeds it back, so
    # no column can be skipped and no iteration collapsed.
    CH = 32
    for m, k, n in [(4096, 1536, 4096), (8192, 1536, 4096)]:

        def chain(a, b):
            acc = 0.0
            x = a
            for _ in range(CH):
                h = x @ b
                acc = acc + jnp.mean(h)
                x = a * (1.0 + acc * 1e-9)
            return acc

        f = jax.jit(chain)
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (m, k), jnp.float32)
        b = jax.random.normal(key, (k, n), jnp.float32)
        fl = 2 * m * k * n * CH
        dt, _ = timeit(f, a, b)
        print(f"matmul f32 {m}x{k}x{n}: {dt/CH*1e3:.3f} ms/mm "
              f"{fl/dt/1e12:.1f} TFLOP/s")
        dt, _ = timeit(f, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
        print(f"matmul bf16 {m}x{k}x{n}: {dt/CH*1e3:.3f} ms/mm "
              f"{fl/dt/1e12:.1f} TFLOP/s")


def main():
    if "--cpu" in _sys.argv:  # correctness smoke off the TPU
        _sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
        from jax.extend.backend import clear_backends

        clear_backends()
    n_envs = int(_sys.argv[1]) if len(_sys.argv) > 1 else 8192
    name = _sys.argv[2] if len(_sys.argv) > 2 else "ShadowHandOpenAI_LSTM"
    matmul_bench()

    cfg = load_config({"task": name})
    task = get_task(name, cfg["task"])
    env = VecEnv(task, n_envs)
    kw = ppo_config_kwargs(cfg["train"])
    trainer = PPOTrainer(env, PPOConfig(**kw), seed=5)
    ts = trainer.state
    cfgp = trainer.cfg

    t0 = time.time()
    rollout = jax.jit(trainer._rollout)
    ts2, traj, last_value, stats = rollout(ts)
    jax.block_until_ready(traj)
    print(f"rollout compile: {time.time()-t0:.0f}s")
    dt_roll, _ = timeit(rollout, ts)

    gae = jax.jit(trainer._gae)
    dt_gae, (advs, returns) = timeit(gae, traj, last_value)
    traj = dict(traj, adv=advs, ret=returns)

    # build datasets exactly as _epoch does
    T, N = cfgp.horizon_length, env.num_envs
    seq = cfgp.seq_len
    nch = T // seq

    def to_seq(x):
        x = x.reshape((nch, seq, N) + x.shape[2:])
        x = jnp.moveaxis(x, 2, 0)
        return x.reshape((N * nch, seq) + x.shape[3:])

    def hid_start(x):
        # r5 rollout stores hidden sequence-major: (nch, N, H) chunk starts
        return jnp.moveaxis(x, 1, 0).reshape((N * nch, -1))

    hid_keys = {"hidden_h", "hidden_c", "cv_hidden_h", "cv_hidden_c"}
    if trainer.is_rnn:
        skip = hid_keys | {"reward", "done", "states"}
        dataset = {k: to_seq(v) for k, v in traj.items() if k not in skip}
        dataset["done"] = to_seq(traj["done"])
        for k in ("hidden_h", "hidden_c"):
            dataset[k] = hid_start(traj[k])
        num_slices = N * nch
        mb_slices = max(cfgp.minibatch_size // seq, 1)
    else:
        flat = lambda x: x.reshape((T * N,) + x.shape[2:])
        dataset = {k: flat(v) for k, v in traj.items()
                   if k not in {"reward", "done", "states"}}
        num_slices = T * N
        mb_slices = cfgp.minibatch_size
    mb_slices = min(mb_slices, num_slices)
    while num_slices % mb_slices:
        mb_slices -= 1

    dt_cv = 0.0
    if trainer.use_cv:
        cv_dataset = {k: (to_seq(traj[k]) if trainer.is_rnn else traj[k]
                          .reshape((T * N,) + traj[k].shape[2:]))
                      for k in ("states", "value", "ret")}
        if trainer.is_cv_rnn:
            cv_dataset["done"] = dataset["done"]
            for k in ("cv_hidden_h", "cv_hidden_c"):
                cv_dataset[k] = hid_start(traj[k])
        cv_up = jax.jit(lambda ts, ds: trainer._cv_update(ts, ds, num_slices))
        dt_cv, _ = timeit(cv_up, ts2, cv_dataset, n=3)

    am, astd = jnp.mean(advs), jnp.std(advs)
    upd = jax.jit(lambda ts, ds: trainer._update(
        ts, ds, am, astd, num_slices, mb_slices))
    dt_upd, _ = timeit(upd, ts2, dataset, n=3)

    epoch = jax.jit(trainer._epoch)
    dt_ep, _ = timeit(epoch, ts, n=3)

    spe = T * N
    print(f"\n{name} @ {N} envs (T={T}, seq={seq}):")
    print(f"  rollout  : {dt_roll*1e3:8.1f} ms")
    print(f"  gae      : {dt_gae*1e3:8.1f} ms")
    print(f"  cv_update: {dt_cv*1e3:8.1f} ms")
    print(f"  update   : {dt_upd*1e3:8.1f} ms")
    print(f"  sum      : {(dt_roll+dt_gae+dt_cv+dt_upd)*1e3:8.1f} ms")
    print(f"  epoch    : {dt_ep*1e3:8.1f} ms -> {spe/dt_ep:,.0f} steps/s")


if __name__ == "__main__":
    main()
