"""A/B the BPTT grad-step variants for the 400k steps/s hunt (r5).

Candidates over the exact ShadowHandOpenAI_LSTM actor shapes
(B=4096 slices, seq 4, H 1024, trunk [512], bf16 nets):

  base      — shipped LSTMCore.seq (lax.scan over the 4 steps)
  unroll    — seq scan with unroll=4 (straight-line recurrence: XLA can
              fuse gate elementwise across steps and skip per-step
              output stacking)
  remat     — jax.checkpoint(policy=dots_saveable) around the loss:
              backward recomputes the elementwise gate chains instead of
              storing them (trades recompute FLOPs for HBM residual
              traffic)
  unroll+remat

Each is timed as a no-gather 8-minibatch mini-epoch scan (the shipped
_update inner shape, shuffle machinery excluded — bptt_microbench.py
showed it costs <10%), so differences attribute to the network fwd+bwd.

Usage: python tools/bptt_variants.py [mb_slices] [--cpu]
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

from omniisaacgymenvs_tpu.learn.networks import (
    LSTMActorCritic, gaussian_logprob,
)


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
    if "--cpu" in _sys.argv:
        _sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
        from jax.extend.backend import clear_backends

        clear_backends()
    B = int(_sys.argv[1]) if len(_sys.argv) > 1 else 4096
    S, OBS, ACT, H = 4, 42, 20, 1024
    NSLICES = 32768
    NMB = NSLICES // B
    key = jax.random.PRNGKey(0)

    ds = dict(
        obs=jax.random.normal(key, (NSLICES, S, OBS)),
        done=jnp.zeros((NSLICES, S)),
        hidden_h=jax.random.normal(key, (NSLICES, H)) * 0.1,
        hidden_c=jax.random.normal(key, (NSLICES, H)) * 0.1,
        action=jax.random.normal(key, (NSLICES, S, ACT)),
        logp=jax.random.normal(key, (NSLICES, S)),
        adv=jax.random.normal(key, (NSLICES, S)),
        ret=jax.random.normal(key, (NSLICES, S)),
    )

    # per-grad-step matmul FLOPs (fwd x3), for the TFLOP/s column
    f_x = 2 * B * S * OBS * 4 * H
    f_h = 2 * B * S * H * 4 * H
    f_mlp = 2 * B * S * (H * 512 + 512 * (ACT + 1))
    fl = 3 * (f_x + f_h + f_mlp)

    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.scale_by_adam(eps=1e-8))

    results = {}
    # (name, seq_unroll, remat-dots, ablation) — the ablations are NOT
    # candidates to ship; they decompose the grad step so the remaining
    # non-matmul time attributes itself: 'notrunk' drops LN/MLP/heads
    # (value term switches to a mean over LSTM outs), 'norecur' replaces
    # the recurrent scan with the x-gates elementwise chain only (no Wh
    # matmul) — base minus norecur isolates the recurrent matmul cost,
    # base minus notrunk the trunk cost.
    for name, unroll, remat, ablate in (
        ("base", 1, False, None),
        ("unroll", 4, False, None),
        ("remat", 1, True, None),
        ("unroll+remat", 4, True, None),
        ("notrunk", 1, False, "notrunk"),
        ("norecur", 1, False, "norecur"),
    ):
        net = LSTMActorCritic(
            num_actions=ACT, lstm_units=H, units=(512,),
            activation="relu", dtype=jnp.bfloat16, seq_unroll=unroll,
        )
        params = net.init(key, jnp.zeros((1, OBS)),
                          (jnp.zeros((1, H)), jnp.zeros((1, H))))

        if ablate == "notrunk":
            def fwd(p, mb):
                outs = net.apply(
                    p, mb["obs"], (mb["hidden_h"], mb["hidden_c"]),
                    mb["done"],
                    method=lambda n, o, h, d: n.lstm.seq(o, h, d),
                )
                mu = outs[..., :ACT].astype(jnp.float32)
                v = jnp.mean(outs, axis=-1).astype(jnp.float32)
                return mu, jnp.zeros(ACT), v
        elif ablate == "norecur":
            def fwd(p, mb):
                # x-gates + per-step elementwise chain, Wh matmul dropped:
                # everything the scan does except the MXU work
                wx = p["params"]["lstm"]["wx"]["kernel"]
                xg = (mb["obs"].astype(jnp.bfloat16).reshape(-1, OBS)
                      @ wx.astype(jnp.bfloat16)).reshape(B, S, 4 * H)
                h = mb["hidden_h"].astype(jnp.bfloat16)
                c = mb["hidden_c"].astype(jnp.bfloat16)
                outs = []
                for t in range(S):
                    g = xg[:, t] + jnp.concatenate([h, h, h, h], -1)
                    i, f, gg, o = jnp.split(g, 4, axis=-1)
                    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
                    h = jax.nn.sigmoid(o) * jnp.tanh(c)
                    m = mb["done"][:, t][:, None]
                    h = jnp.where(m, 0.0, h).astype(jnp.bfloat16)
                    c = jnp.where(m, 0.0, c).astype(jnp.bfloat16)
                    outs.append(h)
                outs = jnp.stack(outs, 1)
                mu = outs[..., :ACT].astype(jnp.float32)
                v = jnp.mean(outs, axis=-1).astype(jnp.float32)
                return mu, jnp.zeros(ACT), v
        else:
            def fwd(p, mb):
                return net.apply(
                    p, mb["obs"], (mb["hidden_h"], mb["hidden_c"]),
                    mb["done"], method=LSTMActorCritic.seq,
                )

        if remat:
            fwd = jax.checkpoint(
                fwd, policy=jax.checkpoint_policies.dots_saveable
            )

        def loss_fn(p, mb):
            mu, log_std, v = fwd(p, mb)
            log_std = jnp.broadcast_to(log_std, mu.shape)
            logp = gaussian_logprob(mu, log_std, mb["action"])
            ratio = jnp.exp(logp - mb["logp"])
            a = -jnp.mean(jnp.minimum(
                mb["adv"] * ratio,
                mb["adv"] * jnp.clip(ratio, 0.8, 1.2)))
            c = 0.5 * jnp.mean((v - mb["ret"]) ** 2)
            return a + 2.0 * c

        grad_fn = jax.value_and_grad(loss_fn)
        ost = opt.init(params)

        def mini_epoch(p, ost):
            mbs = jax.tree.map(
                lambda x: x.reshape((NMB, B) + x.shape[1:]), ds
            )

            def body(carry, mb):
                p, ost = carry
                l, g = grad_fn(p, mb)
                up, ost = opt.update(g, ost, p)
                p = jax.tree.map(lambda a, u: a - 1e-4 * u, p, up)
                return (p, ost), l

            (p, ost), ls = jax.lax.scan(body, (p, ost), mbs)
            return p, ost, jnp.sum(ls)

        me = jax.jit(mini_epoch)
        dt, out = timeit(me, params, ost)
        results[name] = dt
        print(f"{name:13s}: {dt*1e3:7.2f} ms mini-epoch "
              f"({dt/NMB*1e3:5.2f} ms/mb, {fl/(dt/NMB)/1e12:5.1f} "
              f"TFLOP/s eff)  loss={float(out[2]):.4f}")

    base = results["base"]
    for name, dt in results.items():
        if name != "base":
            print(f"  {name}: {base/dt:.2f}x vs base")


if __name__ == "__main__":
    main()
