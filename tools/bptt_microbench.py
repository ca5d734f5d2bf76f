"""Isolate the LSTM BPTT grad-step cost (r5: the 400k steps/s hunt).

Times, on the real device, for the exact ShadowHandOpenAI_LSTM shapes:
  1. pure fwd+bwd of the fused-seq actor loss on ONE minibatch
  2. the same under scan over num_mb minibatches with index gathers
  3. adam/clip update overhead
  4. reference matmul chain at the recurrent shape (B,1024)x(1024,4096)
so the gap between (1)*num_mb and the measured _update phase attributes
itself to gathers/optimizer/scan overhead vs raw network compute.

Usage: python tools/bptt_microbench.py [mb_slices] [--cpu]
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


def timeit(fn, *args, n=10, warmup=3):
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
    B = int(_sys.argv[1]) if len(_sys.argv) > 1 else 4096  # mb_slices
    S, OBS, ACT, H = 4, 42, 20, 1024
    NSLICES = 32768            # 8192 envs x 4 chunks
    NMB = NSLICES // B
    key = jax.random.PRNGKey(0)

    net = LSTMActorCritic(
        num_actions=ACT, lstm_units=H, units=(512,), activation="relu",
        dtype=jnp.bfloat16,
    )
    hid0 = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    params = net.init(key, jnp.zeros((1, OBS)),
                      (jnp.zeros((1, H)), jnp.zeros((1, H))))

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

    def loss_fn(p, mb):
        mu, log_std, v = net.apply(
            p, mb["obs"], (mb["hidden_h"], mb["hidden_c"]), mb["done"],
            method=LSTMActorCritic.seq,
        )
        log_std = jnp.broadcast_to(log_std, mu.shape)
        logp = gaussian_logprob(mu, log_std, mb["action"])
        ratio = jnp.exp(logp - mb["logp"])
        a = -jnp.mean(jnp.minimum(mb["adv"] * ratio,
                                  mb["adv"] * jnp.clip(ratio, 0.8, 1.2)))
        c = 0.5 * jnp.mean((v - mb["ret"]) ** 2)
        return a + 2.0 * c

    grad_fn = jax.value_and_grad(loss_fn)

    # NOTE: an isolated single-grad-step timing is NOT printed. Both an
    # isolated grad call and a 16-step dependent grad chain measure
    # ~0 ms on the tunneled axon runtime (physically impossible for the
    # ~0.5 TFLOP a step carries) while the mini-epoch scans below time
    # sanely and reproducibly in the same harness — per-grad-step cost is
    # therefore reported as mini-epoch time / minibatch count instead.
    # FLOP estimate per grad step (lstm x-proj + recurrent + mlp + heads,
    # fwd*3), used by the printout below:
    f_x = 2 * B * S * OBS * 4 * H
    f_h = 2 * B * S * H * 4 * H
    f_mlp = 2 * B * S * (H * 512 + 512 * (ACT + 1))
    fl = 3 * (f_x + f_h + f_mlp)

    # 2. scan over NMB minibatches with index gather (epoch_body shape)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.scale_by_adam(eps=1e-8))
    ost = opt.init(params)

    def mini_epoch(p, ost, perm):
        idxs = perm.reshape(NMB, B)

        def body(carry, idx):
            p, ost = carry
            mb = jax.tree.map(lambda x: x[idx], ds)
            l, g = grad_fn(p, mb)
            up, ost = opt.update(g, ost, p)
            p = jax.tree.map(lambda a, u: a - 1e-4 * u, p, up)
            return (p, ost), l

        (p, ost), ls = jax.lax.scan(body, (p, ost), idxs)
        return p, ost, jnp.sum(ls)

    me = jax.jit(mini_epoch)
    perm = jax.random.permutation(key, NSLICES)
    dt2, _ = timeit(me, params, ost, perm, n=5)
    print(f"mini-epoch ({NMB} mb + gather + adam): {dt2*1e3:7.2f} ms "
          f"({dt2/NMB*1e3:.2f} ms/mb, {fl/(dt2/NMB)/1e12:.1f} TFLOP/s eff)")

    # 3. grad-only scan (no gather: pre-shuffled contiguous slices)
    def mini_epoch_nogather(p, ost):
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

    me2 = jax.jit(mini_epoch_nogather)
    dt3, _ = timeit(me2, params, ost, n=5)
    print(f"mini-epoch no-gather: {dt3*1e3:7.2f} ms")

    # 4. recurrent-shape matmul chain. Scalar-mean feedback (NOT a slice
    # back into the next operand): slicing lets XLA fuse the slice into
    # the dot and compute only H of the 4H output columns — a 4x FLOP
    # overcount (the same folding fixed in tools/lstm_profile.py).
    a = jax.random.normal(key, (B, H), jnp.bfloat16)
    w = jax.random.normal(key, (H, 4 * H), jnp.bfloat16)

    def chain(a, w):
        acc = jnp.zeros((), jnp.float32)
        x = a
        for _ in range(32):
            h = x @ w
            acc = acc + jnp.mean(h.astype(jnp.float32))
            x = a * (1.0 + acc * 1e-9).astype(a.dtype)
        return acc

    ch = jax.jit(chain)
    dtc, _ = timeit(ch, a, w)
    fl = 2 * B * H * 4 * H * 32
    print(f"matmul bf16 ({B},{H})x({H},{4*H}) chain: "
          f"{dtc/32*1e3:.3f} ms/mm  {fl/dtc/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
