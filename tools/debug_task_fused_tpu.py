"""Fused-vs-XLA consistency on the REAL TPU chip for a full task model.

Bypasses the engine's pair-scene gate by building the fused kernel directly.
Compares n_steps substeps from a perturbed batch: max |dq|, |dqd|, and the
trajectory of a chosen free body's z (to see fall-through).

Usage: python scripts/debug_task_fused_tpu.py ShadowHand [n_steps] [N]
"""

import os as _os
import sys as _sys

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)


import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.ops import fused_substep as fs
from omniisaacgymenvs_tpu.physics.model import JointType
from omniisaacgymenvs_tpu.tasks import get_task


def perturbed_batch(m, rng, N, scale=0.02, vel=0.2):
    q = np.tile(np.asarray(m.default_q, np.float64), (N, 1))
    jq = np.asarray(m.jq_idx)
    if jq.size:
        q[:, jq] += scale * rng.standard_normal((N, jq.size))
        q[:, jq] = np.clip(q[:, jq], np.asarray(m.dof_limit_lower),
                           np.asarray(m.dof_limit_upper))
    for i in m.roots:
        if m.jtype[i] == JointType.FREE:
            a = m.q_adr[i]
            q[:, a:a + 3] += scale * rng.standard_normal((N, 3))
            q[:, a + 3:a + 7] += scale * rng.standard_normal((N, 4))
            q[:, a + 3:a + 7] /= np.linalg.norm(
                q[:, a + 3:a + 7], axis=1, keepdims=True)
    qd = vel * rng.standard_normal((N, m.nv))
    return (jnp.asarray(q, jnp.float32), jnp.asarray(qd, jnp.float32))


def main(name="ShadowHand", n_steps=8, N=256, seed=0):
    t0 = time.time()
    task = get_task(name)
    eng = task.engine
    m = task.model
    print(f"{name}: nb={m.nb} nq={m.nq} nv={m.nv} njd={m.njd} "
          f"ncp={int(m.cp_body.shape[0])} npair={int(m.pair_point.shape[0])} "
          f"nsurf={len(m.surf_type)} nt={m.nt} sensors={len(m.sensor_body)}")
    h = eng.params.dt / eng.params.substeps
    fused = fs.build_fused_substep(m, h, eng.params.gravity,
                                   eng.contact_params,
                                   has_height=eng.height_fn is not None)
    rng = np.random.default_rng(seed)
    q, qd = perturbed_batch(m, rng, N)
    eff = jnp.zeros((N, m.njd))
    ptg = jnp.asarray(np.tile(np.asarray(
        m.default_q, np.float32)[np.asarray(m.jq_idx)], (N, 1))) \
        if m.njd else jnp.zeros((N, 0))
    vtg = jnp.zeros((N, m.njd))
    fa = jnp.zeros((N, m.nb, 6))
    planes = jnp.zeros((N, int(m.cp_body.shape[0]), 3)) \
        if eng.height_fn is not None else None

    def ref_step(q1, qd1):
        ctrl = eng.default_control().replace(
            pos_target=ptg[0] * 0 + ptg[0])

        def body(carry, _):
            qq, dd = carry
            qq, dd, _ = eng._substep(qq, dd, ctrl, jnp.zeros((m.nb, 6)), h)
            return (qq, dd), None

        (qq, dd), _ = jax.lax.scan(body, (q1, qd1), None, length=n_steps)
        return qq, dd

    print(f"build {time.time()-t0:.1f}s; compiling XLA ref...", flush=True)
    t0 = time.time()
    ref_q, ref_qd = jax.jit(jax.vmap(ref_step))(q, qd)
    ref_q.block_until_ready()
    print(f"XLA ref done {time.time()-t0:.1f}s; compiling fused...",
          flush=True)
    t0 = time.time()
    args = (q, qd, eff, ptg, vtg, fa)
    kw = dict(planes=planes) if planes is not None else {}
    fq, fqd, _sf, _p, _qt, _av, _lv = jax.jit(
        lambda *a: fused.step(*a, n_steps, **kw))(*args)
    fq.block_until_ready()
    print(f"fused done {time.time()-t0:.1f}s", flush=True)

    dq = jnp.abs(fq - ref_q)
    dqd = jnp.abs(fqd - ref_qd)
    print(f"max|dq|={float(jnp.max(dq)):.3e} "
          f"max|dqd|={float(jnp.max(dqd)):.3e}")
    # worst dof
    iworst = int(jnp.argmax(jnp.max(dq, axis=0)))
    print(f"worst q index {iworst}: "
          f"ref={float(ref_q[0, iworst]):.4f} fused={float(fq[0, iworst]):.4f}")
    # per free-root z comparison
    for i in m.roots:
        if m.jtype[i] == JointType.FREE:
            a = m.q_adr[i]
            print(f"  free root body {i}: z ref="
                  f"{float(jnp.mean(ref_q[:, a + 2])):.4f} fused="
                  f"{float(jnp.mean(fq[:, a + 2])):.4f} "
                  f"dq_pose={float(jnp.max(dq[:, a:a+7])):.3e}")


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "ShadowHand"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    main(name, n_steps, N)
