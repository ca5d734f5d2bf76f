"""Multi-articulation (forest) scenes + pairwise point-vs-surface contacts
(the reference's multi-actor envs: tray+ball, hand+object — SURVEY.md §2.2).
"""

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.physics.engine import PhysicsEngine, SimParams
from omniisaacgymenvs_tpu.physics.model import JointType, ModelBuilder


def _ball_on_table(table_free=False, table_h=0.5, ball_h=1.0):
    b = ModelBuilder("BallTable")
    table = b.add_body(
        "table", parent=-1,
        joint_type=JointType.FREE if table_free else JointType.FIXED,
        joint_pos=(0, 0, table_h) if not table_free else (0, 0, 0),
        mass=4.0, inertia=(0.2, 0.2, 0.2),
        default_pos=(0, 0, table_h),
    )
    b.add_box_collider(table, (0, 0, 0), (0.5, 0.5, 0.05), receive=True)
    ball = b.add_body(
        "ball", parent=-1, joint_type=JointType.FREE,
        mass=0.5, inertia=(0.002,) * 3,
        default_pos=(0.1, 0.0, ball_h),
    )
    b.add_sphere_collider(ball, (0, 0, 0), 0.1)
    return b.finalize()


def test_forest_addressing():
    m = _ball_on_table()
    assert m.nq == 7 and m.nv == 6  # fixed table + free ball
    m2 = _ball_on_table(table_free=True)
    assert m2.nq == 14 and m2.nv == 12
    assert m2.root_q_adr("ball") == 7
    assert len(m.pair_surf) > 0  # ball point vs table box surface


def test_ball_rests_on_table():
    m = _ball_on_table()
    eng = PhysicsEngine(m, SimParams(dt=1.0 / 240.0, substeps=1))
    state = eng.init_state()
    step = jax.jit(eng.step)
    ctrl = eng.default_control()
    for _ in range(480):  # 2 s
        state = step(state, ctrl)
    ball_adr = m.root_q_adr("ball")
    z = float(state.q[ball_adr + 2])
    # rest height = table top 0.55 + ball radius 0.1 (minus penetration)
    assert 0.58 < z < 0.68, z
    speed = float(jnp.linalg.norm(state.qd[m.root_v_adr("ball"):]))
    assert speed < 0.1, speed


def test_pair_contact_momentum_conservation():
    """Zero gravity: ball hits a free box; total linear momentum conserved
    (equal and opposite pair forces). Bodies placed high so the recoiling
    table's corners never graze the ground plane (an external force)."""
    m = _ball_on_table(table_free=True, table_h=3.0, ball_h=3.5)
    eng = PhysicsEngine(
        m,
        SimParams(dt=1.0 / 240.0, substeps=1, gravity=(0.0, 0.0, 0.0)),
    )
    state = eng.init_state()
    # ball flying downward at the table
    va = m.root_v_adr("ball")
    state = state.replace(
        qd=state.qd.at[va + 3 : va + 6].set(jnp.array([0.0, 0.0, -3.0]))
    )
    step = jax.jit(eng.step)
    ctrl = eng.default_control()

    def momentum(s):
        p = jnp.zeros(3)
        for name, mass in (("table", 4.0), ("ball", 0.5)):
            i = m.body_index(name)
            p = p + mass * s.body_lvel[i]
        return p

    p0 = np.array([0.0, 0.0, 0.5 * -3.0])  # ball mass * velocity
    for _ in range(240):
        state = step(state, ctrl)
    p1 = np.asarray(momentum(state))
    np.testing.assert_allclose(p1, p0, atol=0.05)
    # the box must have picked up downward momentum (collision happened)
    assert float(state.body_lvel[m.body_index("table")][2]) < -0.1
