"""Analytic dynamics checks (SURVEY.md §4: pendulum/cartpole analytic tests,
energy conservation, vmap-vs-loop equivalence)."""

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.models import (
    build_ant,
    build_cartpole,
    build_double_pendulum,
    build_humanoid,
    build_pendulum,
)
from omniisaacgymenvs_tpu.physics import dynamics
from omniisaacgymenvs_tpu.physics.engine import PhysicsEngine, SimParams

G = 9.81


def _qdd(model, q, qd, tau=None):
    kin = dynamics.kinematics(model, q, qd)
    njd = model.njd
    tau = jnp.zeros(njd) if tau is None else tau
    f_ext = jnp.zeros((model.nb, 6))
    return dynamics.aba(
        model, q, qd, tau, f_ext, kin, jnp.array([0.0, 0.0, -G])
    )


def test_pendulum_analytic():
    m, l = 1.3, 0.7
    model = build_pendulum(mass=m, length=l)
    for theta in [0.0, 0.4, -1.1, 2.5]:
        q = jnp.array([theta])
        qd = jnp.zeros(1)
        qdd = _qdd(model, q, qd)
        # point mass pendulum about +y axis, com at (0,0,-l):
        # theta>0 tips com toward -x... verify against energy-based formula
        expected = -(m * G * l) * np.sin(theta) / (m * l * l + 1e-6 * 1)
        np.testing.assert_allclose(qdd[0], expected, rtol=2e-3, atol=1e-4)


def test_pendulum_applied_torque_at_rest():
    m, l = 1.0, 1.0
    model = build_pendulum(mass=m, length=l)
    q, qd = jnp.zeros(1), jnp.zeros(1)
    qdd = _qdd(model, q, qd, tau=jnp.array([2.0]))
    np.testing.assert_allclose(qdd[0], 2.0 / (m * l * l + 1e-6), rtol=1e-3)


def _cartpole_analytic(mc, mp, l, Ip, x, th, xd, thd, F):
    """Standard cartpole ODE, theta from upright, pole tips toward +x.

    (mc+mp) xdd + mp l (thdd cos th - thd^2 sin th) = F
    (Ip + mp l^2) thdd + mp l xdd cos th - mp g l sin th = 0
    """
    A = np.array(
        [[mc + mp, mp * l * np.cos(th)], [mp * l * np.cos(th), Ip + mp * l * l]]
    )
    b = np.array(
        [F + mp * l * thd * thd * np.sin(th), mp * G * l * np.sin(th)]
    )
    return np.linalg.solve(A, b)


def test_cartpole_analytic():
    mc, mp, hl = 1.0, 1.0, 0.5
    model = build_cartpole(cart_mass=mc, pole_mass=mp, pole_half_length=hl)
    Ip = mp * (2 * hl) ** 2 / 12.0
    rng = np.random.default_rng(3)
    for _ in range(5):
        x, th = rng.uniform(-1, 1), rng.uniform(-1.0, 1.0)
        xd, thd = rng.uniform(-1, 1), rng.uniform(-2, 2)
        F = rng.uniform(-5, 5)
        q = jnp.array([x, th])
        qd = jnp.array([xd, thd])
        qdd = _qdd(model, q, qd, tau=jnp.array([F, 0.0]))
        expected = _cartpole_analytic(mc, mp, hl, Ip, x, th, xd, thd, F)
        # f32 model: ~1e-7 agreement in f64 (verified), a few 1e-3 in f32
        np.testing.assert_allclose(np.asarray(qdd), expected, rtol=5e-2, atol=2e-2)


def test_double_pendulum_energy_conservation():
    model = build_double_pendulum()
    engine = PhysicsEngine(
        model, SimParams(dt=1.0 / 1000.0, substeps=1, gravity=(0, 0, -G))
    )
    state = engine.init_state(q=jnp.array([1.2, 0.5]))
    ctrl = engine.default_control()
    step = jax.jit(engine.step)

    def energy(s):
        kin = dynamics.kinematics(model, s.q, s.qd)
        from omniisaacgymenvs_tpu.physics import spatial

        ke = 0.0
        pe = 0.0
        for i in range(model.nb):
            Ib = spatial.spatial_inertia(
                model.body_mass[i], model.body_com[i], model.body_inertia[i]
            )
            ke = ke + 0.5 * kin.v[i] @ Ib @ kin.v[i]
            com_w = kin.pw[i] + kin.Rw[i] @ model.body_com[i]
            pe = pe + model.body_mass[i] * G * com_w[2]
        return ke + pe

    e0 = energy(state)
    for _ in range(500):  # 0.5 s
        state = step(state, ctrl)
    e1 = energy(state)
    # semi-implicit Euler at 1 kHz: small drift only
    assert abs(e1 - e0) / abs(e0) < 0.02


def test_free_body_projectile():
    # Ant torso in flight: ballistic center-of-mass trajectory
    model = build_ant()
    engine = PhysicsEngine(
        model, SimParams(dt=1.0 / 240.0, substeps=1, gravity=(0, 0, -G))
    )
    q0 = model.default_q.at[2].set(5.0)  # well above ground, no contact
    state = engine.init_state(q=q0)
    # give it world-frame upward+forward velocity (root qd is body frame but
    # initial quat is identity so body==world)
    state = state.replace(qd=state.qd.at[3:6].set(jnp.array([1.0, 0.0, 2.0])))
    step = jax.jit(engine.step)
    T = 48
    for _ in range(T):
        state = step(state, engine.default_control())
    t = T / 240.0
    np.testing.assert_allclose(state.q[0], 1.0 * t, rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(
        state.q[2], 5.0 + 2.0 * t - 0.5 * G * t * t, rtol=1e-2, atol=5e-3
    )


def test_vmap_matches_single():
    model = build_cartpole()
    engine = PhysicsEngine(model, SimParams(dt=1.0 / 120.0))
    rng = np.random.default_rng(7)
    qs = jnp.asarray(rng.uniform(-0.5, 0.5, (4, model.nq)), jnp.float32)
    qds = jnp.asarray(rng.uniform(-0.5, 0.5, (4, model.nv)), jnp.float32)
    init = jax.vmap(engine.init_state)(qs, qds)
    ctrl = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (4,) + x.shape), engine.default_control()
    )
    batched = jax.jit(jax.vmap(engine.step))(init, ctrl)
    for i in range(4):
        single = engine.step(
            engine.init_state(qs[i], qds[i]),
            engine.default_control(),
        )
        np.testing.assert_allclose(
            batched.q[i], single.q, rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            batched.qd[i], single.qd, rtol=1e-4, atol=1e-4
        )


def test_models_build():
    for build in (build_cartpole, build_ant, build_humanoid):
        m = build()
        assert m.nb >= 3
    ant = build_ant()
    assert ant.njd == 8 and ant.nv == 14 and ant.nq == 15
    assert ant.num_sensors == 4
    hum = build_humanoid()
    assert hum.njd == 21 and hum.nv == 27
    assert hum.num_sensors == 2
    cart = build_cartpole()
    assert cart.dof_index("cartJoint") == 0
    assert cart.dof_index("poleJoint") == 1


def test_ant_standing_settles():
    """Ant dropped from default pose settles on its feet (contact sanity)."""
    model = build_ant()
    engine = PhysicsEngine(
        model, SimParams(dt=1.0 / 120.0, substeps=2, gravity=(0, 0, -G))
    )
    state = engine.init_state()
    step = jax.jit(engine.step)
    for _ in range(120):  # 1 s
        state = step(state, engine.default_control())
    h = float(state.q[2])
    assert 0.15 < h < 0.6, f"torso height {h}"
    # roughly upright
    assert float(state.q[3]) > 0.9, f"quat w {state.q[3]}"
