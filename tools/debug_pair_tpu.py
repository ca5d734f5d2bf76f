"""Minimal real-TPU repro for the fused-kernel pair-contact divergence.

Round-2 VERDICT item 1: on real TPU the fused Pallas pair path misbehaves
(ShadowHand cube falls through palm, BallBalance hangs) while CPU interpret
mode matches the XLA path exactly. This script builds tiny one-point-vs-one-
surface scenes (sphere / capsule / box receivers), runs the fused kernel and
the XLA reference path side by side ON THE REAL CHIP, and reports max abs
divergence after 1 and N substeps.

Usage: python scripts/debug_pair_tpu.py [sphere|capsule|box|all]
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
from omniisaacgymenvs_tpu.physics.engine import PhysicsEngine, SimParams
from omniisaacgymenvs_tpu.physics.model import JointType, ModelBuilder


def build_scene(surface: str):
    """One free 'ball' body (single contact point, r=3cm) falling onto a
    fixed-root receiver surface 0.5m above ground."""
    b = ModelBuilder(f"pair_{surface}")
    # fixed receiver tree: one fixed root + one revolute child carrying the
    # surface (so the surface body is NOT a root — matches palm/tray/drawer)
    root = b.add_body("base", parent=-1, joint_type=JointType.FIXED,
                      joint_pos=(0.0, 0.0, 0.5))
    holder = b.add_body(
        "holder", parent=root, joint_type=JointType.REVOLUTE,
        joint_axis=(0, 0, 1), mass=2.0, inertia=(0.02, 0.02, 0.02),
        stiffness=100.0, drive_damping=10.0, limit=(-1.0, 1.0),
    )
    if surface == "sphere":
        b.add_sphere_collider(holder, (0, 0, 0), 0.12, receive=True)
    elif surface == "capsule":
        b.add_capsule_collider(holder, (-0.1, 0, 0), (0.1, 0, 0), 0.08,
                               receive=True)
    else:
        b.add_box_collider(holder, (0, 0, 0), (0.15, 0.15, 0.04),
                           receive=True)
    ball = b.add_body(
        "ball", parent=-1, joint_type=JointType.FREE, mass=0.5,
        inertia=(0.001, 0.001, 0.001),
        default_pos=(0.0, 0.02, 0.75),
    )
    b.add_contact_point(ball, (0, 0, 0), radius=0.03)
    m = b.finalize()
    eng = PhysicsEngine(m, SimParams(dt=1 / 60, substeps=4))
    return m, eng


def run_case(surface: str, N=256, n_steps=8, seed=0):
    m, eng = build_scene(surface)
    h = eng.params.dt / eng.params.substeps
    fused = fs.build_fused_substep(m, h, eng.params.gravity,
                                   eng.contact_params)
    rng = np.random.default_rng(seed)
    q = np.tile(np.asarray(m.default_q, np.float64), (N, 1))
    ball_qa = m.q_adr[m.body_index("ball")]
    q[:, ball_qa:ball_qa + 3] += 0.05 * rng.standard_normal((N, 3))
    quat = q[:, ball_qa + 3:ball_qa + 7] + 0.05 * rng.standard_normal((N, 4))
    q[:, ball_qa + 3:ball_qa + 7] = quat / np.linalg.norm(
        quat, axis=1, keepdims=True)
    qd = 0.1 * rng.standard_normal((N, m.nv))
    q = jnp.asarray(q, jnp.float32)
    qd = jnp.asarray(qd, jnp.float32)
    eff = jnp.zeros((N, m.njd))
    ptg = jnp.zeros((N, m.njd))
    vtg = jnp.zeros((N, m.njd))
    fa = jnp.zeros((N, m.nb, 6))

    # XLA reference: vmapped per-env _substep chain
    def ref_step(q1, qd1):
        ctrl = eng.default_control()

        def body(carry, _):
            qq, dd = carry
            qq, dd, _ = eng._substep(qq, dd, ctrl, jnp.zeros((m.nb, 6)), h)
            return (qq, dd), None

        (qq, dd), _ = jax.lax.scan(body, (q1, qd1), None, length=n_steps)
        return qq, dd

    ref_q, ref_qd = jax.jit(jax.vmap(ref_step))(q, qd)
    ref_q.block_until_ready()

    # fused kernel: whole-step path (the one the engine uses)
    fq, fqd, _sf, _p, _qt, _av, _lv = jax.jit(
        lambda *a: fused.step(*a, n_steps)
    )(q, qd, eff, ptg, vtg, fa)
    fq.block_until_ready()

    # fused kernel: one-substep-at-a-time path
    def fused_chain(q0, qd0):
        qq, dd = q0, qd0
        for _ in range(n_steps):
            qq, dd, _ = fused(qq, dd, eff, ptg, vtg, fa)
        return qq, dd

    sq, sqd = jax.jit(fused_chain)(q, qd)
    sq.block_until_ready()

    dq = float(jnp.max(jnp.abs(fq - ref_q)))
    dqd = float(jnp.max(jnp.abs(fqd - ref_qd)))
    dq_s = float(jnp.max(jnp.abs(sq - ref_q)))
    zmin_ref = float(jnp.min(ref_q[:, ball_qa + 2]))
    zmin_f = float(jnp.min(fq[:, ball_qa + 2]))
    print(f"[{surface}] N={N} steps={n_steps}: "
          f"|dq|={dq:.3e} |dqd|={dqd:.3e} (substep-chain dq={dq_s:.3e}) "
          f"ball zmin ref={zmin_ref:.4f} fused={zmin_f:.4f}")
    return dq, dqd


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cases = ["sphere", "capsule", "box"] if which == "all" else [which]
    print("devices:", jax.devices())
    for c in cases:
        run_case(c)
