"""Localize the fused ShadowHand divergence with an f64 eager ground truth.

From a PRODUCT reset state (cube resting on palm, captured in a subprocess
on the XLA path without x64):
  gtA64: engine._substep in eager f64 (no jit, CPU)
  gtB64: fused.substep_math in eager f64 (no jit, CPU)
  A32:   engine._substep jitted f32 on TPU
  B32:   substep_math jitted f32 on TPU
Reports the object root's mean z-velocity after one substep for each: tells
whether the sink is (a) a formulation difference (gtB64 != gtA64) or (b) a
TPU f32 evaluation issue in one path.

Usage: python scripts/debug_groundtruth.py ShadowHand [N]
"""

import os as _os
import sys as _sys

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)


import os
import subprocess
import sys

STATE = "/tmp/oige_dbg_state.npz"


def capture(name, N):
    import jax.numpy as jnp
    import numpy as np

    from omniisaacgymenvs_tpu.envs.vec_env import VecEnv
    from omniisaacgymenvs_tpu.tasks import get_task
    from omniisaacgymenvs_tpu.utils.config import load_config

    cfg = load_config({"task": name})
    task = get_task(name, cfg["task"])
    env = VecEnv(task, N)
    es = env.reset(seed=0)
    acts = jnp.zeros((N, env.num_actions), jnp.float32)
    for _ in range(5):
        es = env.step(es, acts)
    np.savez(STATE, q=np.asarray(es.phys.q), qd=np.asarray(es.phys.qd))
    print("captured", flush=True)


def analyze(name, N):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_enable_x64", True)

    from omniisaacgymenvs_tpu.ops import fused_substep as fs
    from omniisaacgymenvs_tpu.tasks import get_task
    from omniisaacgymenvs_tpu.utils.config import load_config

    cfg = load_config({"task": name})
    task = get_task(name, cfg["task"])
    eng = task.engine
    m = task.model
    dat = np.load(STATE)
    q = np.asarray(dat["q"], np.float64)[:N]
    qd = np.asarray(dat["qd"], np.float64)[:N]
    h = eng.params.dt / eng.params.substeps
    obj_vz = m.root_v_adr("object") + 5
    qa = m.root_q_adr("object")
    print(f"start: mean z={q[:, qa+2].mean():.5f} "
          f"mean vz={qd[:, obj_vz].mean():.5f}")

    fused = fs.build_fused_substep(m, h, eng.params.gravity,
                                   eng.contact_params)
    njd, nb = m.njd, m.nb
    ptg = np.asarray(m.default_q, np.float64)[np.asarray(m.jq_idx)]

    def run_A(q, qd, dtype, dev):
        with jax.default_device(dev):
            qj = jnp.asarray(q, dtype)
            qdj = jnp.asarray(qd, dtype)
            ctrl = eng.default_control().replace(
                pos_target=jnp.asarray(ptg, dtype))

            def one(q1, qd1):
                return eng._substep(
                    q1, qd1, ctrl, jnp.zeros((nb, 6), dtype), h)[:2]

            if dtype == jnp.float64:
                with jax.disable_jit():
                    return jax.vmap(one)(qj, qdj)
            return jax.jit(jax.vmap(one))(qj, qdj)

    def run_B(q, qd, dtype, dev):
        with jax.default_device(dev):
            Nloc = q.shape[0]
            parts = [
                jnp.asarray(q.T, dtype), jnp.asarray(qd.T, dtype),
                jnp.zeros((njd, Nloc), dtype),
                jnp.tile(jnp.asarray(ptg, dtype)[:, None], (1, Nloc)),
                jnp.zeros((njd, Nloc), dtype),
                jnp.zeros((6 * nb, Nloc), dtype),
            ]
            ins = list(jnp.concatenate(parts, axis=0))

            def go(ins):
                outs = fused.substep_math(ins)
                return (jnp.stack(outs[:m.nq], 1),
                        jnp.stack(outs[m.nq:m.nq + m.nv], 1))

            if dtype == jnp.float64:
                with jax.disable_jit():
                    return go(ins)
            return jax.jit(go)(ins)

    cpu = jax.devices("cpu")[0]
    tpu = None
    for d in jax.devices():
        if d.platform != "cpu":
            tpu = d
    print("computing gtA64 (eager f64)...", flush=True)
    gtA = run_A(q, qd, jnp.float64, cpu)
    print("computing gtB64 (eager f64)...", flush=True)
    gtB = run_B(q, qd, jnp.float64, cpu)
    rows = [("gtA64", gtA), ("gtB64", gtB)]
    if tpu is not None:
        print("computing A32/B32 on TPU...", flush=True)
        rows.append(("A32_tpu", run_A(q, qd, jnp.float32, tpu)))
        rows.append(("B32_tpu", run_B(q, qd, jnp.float32, tpu)))
    base_q, base_qd = np.asarray(gtA[0]), np.asarray(gtA[1])
    for tag, (rq, rqd) in rows:
        rq, rqd = np.asarray(rq, np.float64), np.asarray(rqd, np.float64)
        print(f"{tag}: mean obj vz'={rqd[:, obj_vz].mean():+.6f} "
              f"max|dq vs gtA|={np.abs(rq - base_q).max():.3e} "
              f"max|dqd vs gtA|={np.abs(rqd - base_qd).max():.3e} "
              f"mean|dqd|={np.abs(rqd - base_qd).mean():.3e}")


def analyze_cpu32(name, N):
    """A and B in f32 EAGER on CPU vs the f64 ground truth — is the fused
    formulation's f32 fragility TPU-specific or inherent?"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_enable_x64", True)

    from omniisaacgymenvs_tpu.ops import fused_substep as fs
    from omniisaacgymenvs_tpu.tasks import get_task
    from omniisaacgymenvs_tpu.utils.config import load_config

    cfg = load_config({"task": name})
    task = get_task(name, cfg["task"])
    eng = task.engine
    m = task.model
    dat = np.load(STATE)
    q = np.asarray(dat["q"], np.float64)[:N]
    qd = np.asarray(dat["qd"], np.float64)[:N]
    h = eng.params.dt / eng.params.substeps
    obj_vz = m.root_v_adr("object") + 5
    fused = fs.build_fused_substep(m, h, eng.params.gravity,
                                   eng.contact_params)
    njd, nb = m.njd, m.nb
    ptg = np.asarray(m.default_q, np.float64)[np.asarray(m.jq_idx)]
    cpu = jax.devices("cpu")[0]

    def run_A(dtype):
        with jax.default_device(cpu), jax.disable_jit():
            ctrl = eng.default_control().replace(
                pos_target=jnp.asarray(ptg, dtype))

            def one(q1, qd1):
                return eng._substep(
                    q1, qd1, ctrl, jnp.zeros((nb, 6), dtype), h)[:2]

            return jax.vmap(one)(jnp.asarray(q, dtype), jnp.asarray(qd, dtype))

    def run_B(dtype):
        with jax.default_device(cpu), jax.disable_jit():
            Nloc = q.shape[0]
            parts = [
                jnp.asarray(q.T, dtype), jnp.asarray(qd.T, dtype),
                jnp.zeros((njd, Nloc), dtype),
                jnp.tile(jnp.asarray(ptg, dtype)[:, None], (1, Nloc)),
                jnp.zeros((njd, Nloc), dtype),
                jnp.zeros((6 * nb, Nloc), dtype),
            ]
            ins = list(jnp.concatenate(parts, axis=0))
            outs = fused.substep_math(ins)
            return (jnp.stack(outs[:m.nq], 1),
                    jnp.stack(outs[m.nq:m.nq + m.nv], 1))

    gtA = run_A(jnp.float64)
    base_q, base_qd = np.asarray(gtA[0]), np.asarray(gtA[1])
    for tag, fn, dt in [("A32_cpu", run_A, jnp.float32),
                        ("B32_cpu", run_B, jnp.float32)]:
        rq, rqd = fn(dt)
        rq, rqd = np.asarray(rq, np.float64), np.asarray(rqd, np.float64)
        print(f"{tag}: mean obj vz'={rqd[:, obj_vz].mean():+.6f} "
              f"max|dq vs gtA|={np.abs(rq - base_q).max():.3e} "
              f"max|dqd vs gtA|={np.abs(rqd - base_qd).max():.3e} "
              f"mean|dqd|={np.abs(rqd - base_qd).mean():.3e}")


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "ShadowHand"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    mode = sys.argv[3] if len(sys.argv) > 3 else "main"
    if mode == "capture":
        os.environ["OIGE_TPU_FUSED"] = "0"
        capture(name, N)
    elif mode == "analyze":
        analyze(name, N)
    elif mode == "cpu32":
        analyze_cpu32(name, N)
    else:
        if not os.path.exists(STATE):
            subprocess.run(
                [sys.executable, __file__, name, str(N), "capture"],
                env=dict(os.environ, OIGE_TPU_FUSED="0"), check=True,
                timeout=1200,
            )
        analyze(name, N)
