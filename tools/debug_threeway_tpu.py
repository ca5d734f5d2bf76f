"""Three-way one-substep comparison on real TPU for a task model.

 A: engine._substep (vmapped XLA reference path)
 B: fused.substep_math evaluated as PLAIN XLA ops on (N,) field arrays
 C: fused.substep_math inside the Pallas kernel (fused(...) single substep)

B vs A isolates formulation differences; C vs B isolates Mosaic lowering.

Usage: python scripts/debug_threeway_tpu.py ShadowHand [N]
"""

import os as _os
import sys as _sys

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)


import sys

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.ops import fused_substep as fs
from omniisaacgymenvs_tpu.tasks import get_task
from scripts.debug_task_fused_tpu import perturbed_batch


def main(name="ShadowHand", N=256, seed=0):
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

    # ---- A: XLA reference
    def ref_one(q1, qd1):
        ctrl = eng.default_control().replace(pos_target=ptg[0])
        return eng._substep(q1, qd1, ctrl, jnp.zeros((m.nb, 6)), h)[:2]

    aq, aqd = jax.jit(jax.vmap(ref_one))(q, qd)

    # ---- B: substep_math as plain XLA on (N,) fields
    parts = [q, qd, eff, ptg, vtg, fa.reshape(N, 6 * m.nb)]
    if planes is not None:
        parts.append(planes.reshape(N, -1))
    ins = jnp.concatenate(parts, axis=1).T

    def as_xla(ins):
        outs = fused.substep_math(list(ins))
        return jnp.stack(outs[:m.nq], 1), jnp.stack(outs[m.nq:m.nq + m.nv], 1)

    bq, bqd = jax.jit(as_xla)(ins)

    # ---- C: Pallas kernel, one substep
    kw = dict(planes=planes) if planes is not None else {}
    cq, cqd, _sf = jax.jit(lambda *a: fused(*a, **kw))(
        q, qd, eff, ptg, vtg, fa)

    for tag, (xq, xqd), (yq, yqd) in [
        ("B-A (formulation)", (bq, bqd), (aq, aqd)),
        ("C-B (mosaic)", (cq, cqd), (bq, bqd)),
        ("C-A (total)", (cq, cqd), (aq, aqd)),
    ]:
        dq = jnp.abs(xq - yq)
        dqd = jnp.abs(xqd - yqd)
        iw = int(jnp.argmax(jnp.max(dq, axis=0)))
        iwd = int(jnp.argmax(jnp.max(dqd, axis=0)))
        print(f"{tag}: max|dq|={float(jnp.max(dq)):.3e} (q[{iw}]) "
              f"max|dqd|={float(jnp.max(dqd)):.3e} (qd[{iwd}])")


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "ShadowHand"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    main(name, N)
