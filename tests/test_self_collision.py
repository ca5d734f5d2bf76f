"""Intra-articulation (self) collision — reference per-actor
enable_self_collisions (sim_config.py:389-392; the hands enable it)."""

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.models.shadow_hand import build_shadow_hand
from omniisaacgymenvs_tpu.physics.contacts import ContactParams
from omniisaacgymenvs_tpu.physics.engine import PhysicsEngine, SimParams
from omniisaacgymenvs_tpu.physics.model import JointType, ModelBuilder


def _two_finger_rig(self_collide: bool):
    """Two capsule 'fingers' on one base; finger A sweeps about z into
    finger B's volume."""
    b = ModelBuilder("rig")
    base = b.add_body("base", parent=-1, joint_type=JointType.FIXED,
                      joint_pos=(0, 0, 0.5), mass=1.0, inertia=(0.01,) * 3,
                      gravity_comp=True)
    fa = b.add_body(
        "A", parent=base, joint_type=JointType.REVOLUTE,
        joint_axis=(0, 0, 1), joint_pos=(-0.03, 0, 0),
        limit=(-1.5, 1.5), mass=0.01, inertia=(3e-6,) * 3,
        stiffness=2.0, drive_damping=0.2, max_effort=2.0, armature=5e-4,
        gravity_comp=True,
    )
    b.add_capsule_collider(fa, (0, 0, 0), (0, 0.08, 0), 0.01,
                           n_extra=2, receive_self=True)
    fb = b.add_body(
        "B", parent=base, joint_type=JointType.REVOLUTE,
        joint_axis=(0, 0, 1), joint_pos=(0.03, 0, 0),
        limit=(-1.5, 1.5), mass=0.01, inertia=(3e-6,) * 3,
        stiffness=2.0, drive_damping=0.2, max_effort=2.0, armature=5e-4,
        gravity_comp=True,
    )
    b.add_capsule_collider(fb, (0, 0, 0), (0, 0.08, 0), 0.01,
                           n_extra=2, receive_self=True)
    if self_collide:
        b.enable_self_collisions(base)
    return b.finalize()


def _sweep(m, steps=240):
    # explicit stiff-ish gains: the auto per-effective-mass heuristic
    # ignores armature reflection and is very soft for gram-scale links;
    # armature (5e-4 at 0.08 m lever ~ 0.08 kg reflected) keeps this stable
    contact = ContactParams(kn=500.0, kd=2.0, kt=5.0, mu=1.0, fn_max=1e3)
    eng = PhysicsEngine(m, SimParams(dt=1.0 / 120.0, substeps=2,
                                     gravity=(0.0, 0.0, 0.0),
                                     contact=contact))
    st = eng.init_state()
    # drive A toward B's side; B holds position
    ctrl = eng.default_control().replace(pos_target=jnp.array([-1.2, 0.0]))

    @jax.jit
    def run(st):
        def body(s, _):
            return eng.step(s, ctrl), None
        return jax.lax.scan(body, st, None, length=steps)[0]

    st = run(st)
    return np.asarray(st.q)


def test_self_collision_pairs_and_blocking():
    m_off = _two_finger_rig(False)
    m_on = _two_finger_rig(True)
    # same-tree candidate pairs exist only when enabled (adjacent
    # parent-child pairs excluded)
    assert m_off.pair_point.shape[0] == 0
    assert m_on.pair_point.shape[0] > 0

    q_off = _sweep(m_off)
    q_on = _sweep(m_on)
    a_off, a_on = q_off[0], q_on[0]
    b_off, b_on = q_off[1], q_on[1]
    # without self-collision, A sweeps through B to its target and B is
    # untouched
    assert a_off < -1.1, a_off
    assert abs(b_off) < 1e-3, b_off
    # with self-collision, the fingers interact: A is obstructed and/or B
    # is pushed out of the way
    assert (a_on > a_off + 5e-3) or (abs(b_on) > 5e-3), (a_on, b_on)
    assert abs(b_on) > 1e-3, b_on
    assert np.all(np.isfinite(q_on))


def test_shadow_hand_self_collision_builds_and_steps():
    m = build_shadow_hand(self_collisions=True)
    m0 = build_shadow_hand(self_collisions=False)
    extra = m.pair_point.shape[0] - m0.pair_point.shape[0]
    assert extra > 0
    eng = PhysicsEngine(m, SimParams(dt=1.0 / 120.0, substeps=2))
    st = eng.init_state()
    ctrl = eng.default_control()

    @jax.jit
    def run(st):
        def body(s, _):
            return eng.step(s, ctrl), None
        return jax.lax.scan(body, st, None, length=30)[0]

    st = run(st)
    assert np.all(np.isfinite(np.asarray(st.q)))
