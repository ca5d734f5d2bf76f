"""Bisect the FF-path PPO SGD phase (VERDICT r4 weak #5 / next #7: the FF
learner epoch is ~90% `_update` at ~2.8 ms per grad step while its matmul
content is ~0.5 ms — find the other 2.3 ms).

Times PPOTrainer._update for an FF task (default Humanoid @ 8192, the
bench.py train-bench configuration), then re-times surgically modified
variants to attribute the cost:

  full          : _update as shipped (scan mini_epochs x minibatch scan)
  loss_only     : same scans, forward loss only (no grad, no optimizer)
  grad_only     : value_and_grad per minibatch, updates NOT applied
  no_gather     : contiguous arange minibatches (no random-index gather)
  no_perm       : skip jax.random.permutation (reuse arange order)
  no_guard      : drop the global-norm finite guard + nan_to_num
  matmul_floor  : dependent-chain matmul microbench at the exact layer
                  shapes x the epoch's grad-step count (fwd + 2x bwd)

Optionally dumps a jax.profiler device trace of the full _update
(--trace <dir>).

Usage: python tools/ff_profile.py [num_envs] [task] [--cpu] [--trace DIR]
"""

import os as _os
import sys as _sys
import time

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import optax

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


def main():
    argv = list(_sys.argv[1:])
    trace_dir = None
    if "--cpu" in argv:
        argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
        from jax.extend.backend import clear_backends

        clear_backends()
    if "--trace" in argv:
        i = argv.index("--trace")
        trace_dir = argv[i + 1]
        del argv[i : i + 2]
    n_envs = int(argv[0]) if argv else 8192
    name = argv[1] if len(argv) > 1 else "Humanoid"

    cfg = load_config({"task": name})
    task = get_task(name, cfg["task"])
    env = VecEnv(task, n_envs)
    kw = ppo_config_kwargs(cfg["train"])
    trainer = PPOTrainer(env, PPOConfig(**kw), seed=5)
    assert not trainer.is_rnn, "FF profile: use tools/lstm_profile.py for RNN"
    ts = trainer.state
    c = trainer.cfg
    T, N = c.horizon_length, env.num_envs

    rollout = jax.jit(trainer._rollout)
    ts2, traj, last_value, stats = rollout(ts)
    jax.block_until_ready(traj)
    advs, returns = jax.jit(trainer._gae)(traj, last_value)
    traj = dict(traj, adv=advs, ret=returns)
    flat = lambda x: x.reshape((T * N,) + x.shape[2:])
    dataset = {
        k: flat(v)
        for k, v in traj.items()
        if k not in {"reward", "done", "states"}
    }
    num_slices = T * N
    mb_slices = min(c.minibatch_size, num_slices)
    while num_slices % mb_slices:
        mb_slices -= 1
    num_mb = num_slices // mb_slices
    am, astd = jnp.mean(advs), jnp.std(advs)
    grad_steps = c.mini_epochs * num_mb
    print(
        f"{name} @ {N} envs: T={T} minibatch={mb_slices} "
        f"num_mb={num_mb} mini_epochs={c.mini_epochs} "
        f"({grad_steps} grad steps/epoch)"
    )

    full = jax.jit(
        lambda ts, ds: trainer._update(ts, ds, am, astd, num_slices, mb_slices)
    )
    dt_full, _ = timeit(full, ts2, dataset, n=5)
    print(f"  full        : {dt_full*1e3:7.1f} ms "
          f"({dt_full/grad_steps*1e3:5.2f} ms/grad-step)")

    if trace_dir:
        jax.block_until_ready(full(ts2, dataset))
        jax.profiler.start_trace(trace_dir)
        jax.block_until_ready(full(ts2, dataset))
        jax.profiler.stop_trace()
        print(f"  trace -> {trace_dir}")

    # ---- variants --------------------------------------------------------
    grad_fn = jax.value_and_grad(trainer._loss, has_aux=True)

    def scan_variant(body, init_extra=None):
        """Common scaffold: mini_epochs x minibatch scans, shared shuffle."""

        def run(ts_in, ds):
            def epoch_body(carry, key):
                perm = jax.random.permutation(key, num_slices)
                idxs = perm[: num_mb * mb_slices].reshape(num_mb, mb_slices)
                return jax.lax.scan(body, carry, idxs)

            rng, *keys = jax.random.split(ts_in.rng, c.mini_epochs + 1)
            carry0 = (
                (ts_in.params, ts_in.opt_state, ts_in.lr)
                if init_extra is None
                else init_extra(ts_in)
            )
            carry, aux = jax.lax.scan(epoch_body, carry0, jnp.stack(keys))
            return jax.tree.map(
                jnp.mean, jax.tree.map(jnp.nan_to_num, aux)
            )

        return jax.jit(run)

    def loss_body(carry, idx):
        params, opt_state, lr = carry
        mb = jax.tree.map(lambda x: x[idx], dataset)
        loss, aux = trainer._loss(params, mb, ts2, am, astd)
        return (params, opt_state, lr), loss

    dt, _ = timeit(scan_variant(loss_body), ts2, dataset, n=5)
    print(f"  loss_only   : {dt*1e3:7.1f} ms")

    def grad_body(carry, idx):
        params, opt_state, lr = carry
        mb = jax.tree.map(lambda x: x[idx], dataset)
        (loss, aux), grads = grad_fn(params, mb, ts2, am, astd)
        # keep grads live without applying them
        return (params, opt_state, lr), optax.global_norm(grads)

    dt, _ = timeit(scan_variant(grad_body), ts2, dataset, n=5)
    print(f"  grad_only   : {dt*1e3:7.1f} ms")

    def full_body(carry, idx):
        params, opt_state, lr = carry
        mb = jax.tree.map(lambda x: x[idx], dataset)
        (loss, aux), grads = grad_fn(params, mb, ts2, am, astd)
        gok = jnp.isfinite(optax.global_norm(grads))
        grads = jax.tree.map(
            lambda g: jnp.where(gok, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = trainer.opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
        return (params, opt_state, lr), loss

    def no_gather_run(ts_in, ds):
        def epoch_body(carry, _):
            starts = (
                jnp.arange(num_mb) * mb_slices
            )

            def body(carry2, s):
                mb = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, s, mb_slices, 0
                    ),
                    ds,
                )
                params, opt_state, lr = carry2
                (loss, aux), grads = grad_fn(params, mb, ts2, am, astd)
                gok = jnp.isfinite(optax.global_norm(grads))
                grads = jax.tree.map(
                    lambda g: jnp.where(gok, g, jnp.zeros_like(g)), grads
                )
                updates, opt_state = trainer.opt.update(
                    grads, opt_state, params
                )
                params = jax.tree.map(
                    lambda p, u: p - lr * u, params, updates
                )
                return (params, opt_state, lr), loss

            return jax.lax.scan(body, carry, starts)

        carry, aux = jax.lax.scan(
            epoch_body,
            (ts_in.params, ts_in.opt_state, ts_in.lr),
            None,
            length=c.mini_epochs,
        )
        return jnp.mean(aux)

    dt, _ = timeit(jax.jit(no_gather_run), ts2, dataset, n=5)
    print(f"  no_gather   : {dt*1e3:7.1f} ms")

    def no_perm_run(ts_in, ds):
        idxs0 = jnp.arange(num_mb * mb_slices).reshape(num_mb, mb_slices)

        def epoch_body(carry, _):
            return jax.lax.scan(full_body, carry, idxs0)

        carry, aux = jax.lax.scan(
            epoch_body,
            (ts_in.params, ts_in.opt_state, ts_in.lr),
            None,
            length=c.mini_epochs,
        )
        return jnp.mean(aux)

    dt, _ = timeit(jax.jit(no_perm_run), ts2, dataset, n=5)
    print(f"  no_perm     : {dt*1e3:7.1f} ms  (gather with arange indices)")

    def no_guard_body(carry, idx):
        params, opt_state, lr = carry
        mb = jax.tree.map(lambda x: x[idx], dataset)
        (loss, aux), grads = grad_fn(params, mb, ts2, am, astd)
        updates, opt_state = trainer.opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
        return (params, opt_state, lr), loss

    dt, _ = timeit(scan_variant(no_guard_body), ts2, dataset, n=5)
    print(f"  no_guard    : {dt*1e3:7.1f} ms")

    # packed: concatenate every f32 field into ONE (num_slices, D) matrix
    # so each minibatch is a single wide-row gather instead of 8 thin ones
    # ((N,1) fields gather 4-byte rows — worst-case DMA efficiency)
    names = sorted(dataset.keys())
    cols = {}
    off = 0
    parts = []
    for k in names:
        v = dataset[k]
        v2 = v[:, None] if v.ndim == 1 else v
        cols[k] = (off, off + v2.shape[1], v.ndim == 1)
        off += v2.shape[1]
        parts.append(v2.astype(jnp.float32))
    packed = jnp.concatenate(parts, axis=1)

    def unpack(rows):
        out = {}
        for k, (a, b, was1d) in cols.items():
            s = rows[:, a:b]
            out[k] = s[:, 0] if was1d else s
        return out

    def packed_run(ts_in, pk):
        def epoch_body(carry, idxs):
            def body(carry2, idx):
                mb = unpack(pk[idx])
                params, opt_state, lr = carry2
                (loss, aux), grads = grad_fn(params, mb, ts2, am, astd)
                gok = jnp.isfinite(optax.global_norm(grads))
                grads = jax.tree.map(
                    lambda g: jnp.where(gok, g, jnp.zeros_like(g)), grads
                )
                updates, opt_state = trainer.opt.update(
                    grads, opt_state, params
                )
                params = jax.tree.map(
                    lambda p, u: p - lr * u, params, updates
                )
                return (params, opt_state, lr), loss

            return jax.lax.scan(body, carry, idxs)

        rng, *keys = jax.random.split(ts_in.rng, c.mini_epochs + 1)
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, num_slices)
        )(jnp.stack(keys))
        all_idxs = perms[:, : num_mb * mb_slices].reshape(
            c.mini_epochs, num_mb, mb_slices
        )
        carry, aux = jax.lax.scan(
            epoch_body,
            (ts_in.params, ts_in.opt_state, ts_in.lr),
            all_idxs,
        )
        return jnp.mean(aux)

    dt, _ = timeit(jax.jit(packed_run), ts2, packed, n=5)
    print(f"  packed      : {dt*1e3:7.1f} ms  "
          f"(one (B,{off}) gather/minibatch + hoisted batched shuffle)")

    # ---- matmul floor ----------------------------------------------------
    sizes = [env.num_obs, *c.units, env.num_actions + 1]
    fl_fwd = sum(2 * a * b for a, b in zip(sizes[:-1], sizes[1:]))
    fl_epoch = 3 * fl_fwd * mb_slices * grad_steps
    CH = 32
    m = mb_slices
    dims = list(zip(sizes[:-1], sizes[1:]))

    def chain(a0, ws):
        a = a0
        for _ in range(CH):
            h = a
            for w in ws:
                h = h @ w
            # scalar feedback keeps the chain dependent (not foldable)
            # without caring about the head/input width mismatch
            a = a0 * (1.0 + jnp.mean(h) * 1e-9)
        return a

    key = jax.random.PRNGKey(0)
    a0 = jax.random.normal(key, (m, sizes[0]), jnp.float32)
    ws = [
        jax.random.normal(key, d, jnp.float32)
        for d in dims
    ]
    f = jax.jit(chain)
    dt, _ = timeit(f, a0, ws)
    fl_chain = CH * mb_slices * fl_fwd
    rate = fl_chain / dt
    print(
        f"  matmul_floor: layer chain {sizes} @ M={m}: "
        f"{rate/1e12:.1f} TFLOP/s -> epoch matmul floor "
        f"{fl_epoch/rate*1e3:.1f} ms ({fl_epoch/1e9:.1f} GFLOP)"
    )


if __name__ == "__main__":
    main()
