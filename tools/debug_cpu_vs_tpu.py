"""Compare each formulation against itself across CPU and TPU backends.

 A: engine._substep   B: fused.substep_math as XLA
Whichever changes between backends is the one mis-evaluating on TPU.

Usage: python scripts/debug_cpu_vs_tpu.py ShadowHand [N]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.ops import fused_substep as fs
from omniisaacgymenvs_tpu.tasks import get_task
from scripts.debug_task_fused_tpu import perturbed_batch


def main(name="ShadowHand", N=64, seed=0):
    task = get_task(name)
    eng = task.engine
    m = task.model
    h = eng.params.dt / eng.params.substeps
    fused = fs.build_fused_substep(m, h, eng.params.gravity,
                                   eng.contact_params,
                                   has_height=eng.height_fn is not None)
    rng = np.random.default_rng(seed)
    q, qd = perturbed_batch(m, rng, N)
    eff = jnp.zeros((N, m.njd))
    ptg = jnp.asarray(np.tile(np.asarray(
        m.default_q, np.float32)[np.asarray(m.jq_idx)], (N, 1)))
    vtg = jnp.zeros((N, m.njd))
    fa = jnp.zeros((N, m.nb, 6))
    ncp = int(m.cp_body.shape[0])
    planes = jnp.zeros((N, ncp, 3)) if eng.height_fn is not None else None

    def ref_batch(q, qd):
        def ref_one(q1, qd1):
            ctrl = eng.default_control().replace(pos_target=ptg[0])
            return eng._substep(q1, qd1, ctrl, jnp.zeros((m.nb, 6)), h)[:2]
        return jax.vmap(ref_one)(q, qd)

    parts = [q, qd, eff, ptg, vtg, fa.reshape(N, 6 * m.nb)]
    if planes is not None:
        parts.append(planes.reshape(N, -1))
    ins = jnp.concatenate(parts, axis=1).T

    def as_xla(ins):
        outs = fused.substep_math(list(ins))
        return jnp.stack(outs[:m.nq], 1), jnp.stack(outs[m.nq:m.nq + m.nv], 1)

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    res = {}
    for dev, tag in [(tpu, "tpu"), (cpu, "cpu")]:
        with jax.default_device(dev):
            qq = jax.device_put(q, dev)
            dd = jax.device_put(qd, dev)
            ii = jax.device_put(ins, dev)
            a = jax.jit(ref_batch, device=dev)(qq, dd)
            b = jax.jit(as_xla, device=dev)(ii)
            res[("A", tag)] = jax.device_get(a)
            res[("B", tag)] = jax.device_get(b)
    for f in ("A", "B"):
        dq = np.abs(res[(f, "tpu")][0] - res[(f, "cpu")][0]).max()
        dqd = np.abs(res[(f, "tpu")][1] - res[(f, "cpu")][1]).max()
        iw = np.abs(res[(f, "tpu")][1] - res[(f, "cpu")][1]).max(0).argmax()
        print(f"{f}: tpu-vs-cpu max|dq|={dq:.3e} max|dqd|={dqd:.3e} "
              f"(qd[{iw}])")
    dq = np.abs(res[("A", "cpu")][0] - res[("B", "cpu")][0]).max()
    dqd = np.abs(res[("A", "cpu")][1] - res[("B", "cpu")][1]).max()
    print(f"B-A on cpu: max|dq|={dq:.3e} max|dqd|={dqd:.3e}")


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "ShadowHand"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    main(name, N)
