"""Fused substep kernel math vs the reference XLA path (CPU, no Pallas)."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniisaacgymenvs_tpu.ops import fused_substep as fs
from omniisaacgymenvs_tpu.physics.model import JointType
from omniisaacgymenvs_tpu.tasks import get_task


def _perturbed_batch(m, rng, N, scale=0.02, vel=0.2):
    """Batch of states near default_q: joint dofs jittered within limits,
    FREE-root poses jittered with renormalized quaternions."""
    q = np.tile(np.asarray(m.default_q, np.float64), (N, 1))
    jq = np.asarray(m.jq_idx)
    if jq.size:
        q[:, jq] += scale * rng.standard_normal((N, jq.size))
        q[:, jq] = np.clip(
            q[:, jq],
            np.asarray(m.dof_limit_lower),
            np.asarray(m.dof_limit_upper),
        )
    for i in m.roots:
        if m.jtype[i] == JointType.FREE:
            a = m.q_adr[i]
            q[:, a:a + 3] += scale * rng.standard_normal((N, 3))
            q[:, a + 3:a + 7] += scale * rng.standard_normal((N, 4))
            q[:, a + 3:a + 7] /= np.linalg.norm(
                q[:, a + 3:a + 7], axis=1, keepdims=True
            )
    qd = vel * rng.standard_normal((N, m.nv))
    return jnp.asarray(q, jnp.float32), jnp.asarray(qd, jnp.float32)


def _run_both(eng, m, q, qd, eff, ptg, vtg, fa, planes=None, dr=None):
    """(fused substep_math outputs, XLA _substep outputs) on a batch.
    dr: optional dict of batched DR-overlay arrays (engine overlay keys)."""
    h = eng.params.dt / eng.params.substeps
    dr_keys = tuple(sorted(dr)) if dr else ()
    fused = fs.build_fused_substep(
        m, h, eng.params.gravity, eng.contact_params,
        has_height=planes is not None, dr_keys=dr_keys,
    )
    N = q.shape[0]

    def ref_one(q1, qd1, e1, p1, v1, fa1, ov):
        ctrl = eng.default_control().replace(
            effort=e1, pos_target=p1, vel_target=v1
        )
        return eng._substep(q1, qd1, ctrl, fa1, h, ov or None)

    ref = jax.jit(jax.vmap(ref_one))(q, qd, eff, ptg, vtg, fa, dr or {})

    parts = [q, qd, eff, ptg, vtg, fa.reshape(N, 6 * m.nb)]
    if planes is not None:
        parts.append(planes.reshape(N, -1))
    for key in dr_keys:
        parts.append(dr[key].reshape(N, -1))
    ins = list(jnp.concatenate(parts, axis=1).T)
    outs = jax.jit(lambda ins: fused.substep_math(ins))(ins)
    nq, nv = m.nq, m.nv
    qf = jnp.stack(outs[:nq], axis=1)
    qdf = jnp.stack(outs[nq:nq + nv], axis=1)
    return (qf, qdf, outs), ref


@pytest.mark.parametrize("name", ["Ant"])  # bigger models are compile-heavy on CPU; covered on TPU
def test_fused_math_matches_reference(name):
    task = get_task(name)
    eng = task.engine
    m = task.model
    assert fs.eligible(m, eng)
    h = eng.params.dt / eng.params.substeps
    fused = fs.build_fused_substep(m, h, eng.params.gravity,
                                   eng.contact_params)

    rng = np.random.default_rng(0)
    N = 8
    q = np.tile(np.asarray(m.default_q), (N, 1))
    q += 0.03 * rng.standard_normal(q.shape)
    q[:, 3:7] /= np.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    qd = 0.3 * rng.standard_normal((N, m.nv))
    eff = 0.5 * rng.standard_normal((N, m.njd)).astype(np.float32)
    ptg = 0.1 * rng.standard_normal((N, m.njd)).astype(np.float32)
    vtg = np.zeros((N, m.njd), np.float32)

    q = jnp.asarray(q, jnp.float32)
    qd = jnp.asarray(qd, jnp.float32)

    def ref_one(q1, qd1, e1, p1, v1):
        ctrl = eng.default_control().replace(
            effort=e1, pos_target=p1, vel_target=v1
        )
        return eng._substep(q1, qd1, ctrl, jnp.zeros((m.nb, 6)), h)

    qr, qdr, sfr = jax.jit(jax.vmap(ref_one))(q, qd, eff, ptg, vtg)

    # run the kernel math directly on (N,)-shaped scalar fields
    ins = list(jnp.concatenate(
        [q, qd, jnp.asarray(eff), jnp.asarray(ptg), jnp.asarray(vtg),
         jnp.zeros((N, 6 * m.nb))], axis=1
    ).T)
    outs = jax.jit(lambda ins: fused.substep_math(ins))(ins)
    nq, nv = m.nq, m.nv
    qf = jnp.stack(outs[:nq], axis=1)
    qdf = jnp.stack(outs[nq:nq + nv], axis=1)

    np.testing.assert_allclose(np.asarray(qf), np.asarray(qr),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(qdf), np.asarray(qdr),
                               rtol=5e-3, atol=5e-3)
    if m.num_sensors:
        ns = m.num_sensors
        sff = jnp.stack(outs[nq + nv:nq + nv + 6 * ns], axis=1).reshape(
            N, ns, 6
        )
        np.testing.assert_allclose(np.asarray(sff), np.asarray(sfr),
                                   rtol=1e-3, atol=1e-2)


def test_fused_whole_step_kernel_interpret():
    """The multi-substep whole-step kernel (pack -> fori_loop substeps ->
    report FK -> unpack) vs the XLA step_n path, via Pallas interpret mode
    on CPU."""
    task = get_task("Ant")
    eng = task.engine
    m = task.model
    h = eng.params.dt / eng.params.substeps
    fused = fs.build_fused_substep(m, h, eng.params.gravity,
                                   eng.contact_params)

    rng = np.random.default_rng(1)
    N = 8
    n_steps = 3
    q = np.tile(np.asarray(m.default_q), (N, 1))
    q += 0.02 * rng.standard_normal(q.shape)
    q[:, 3:7] /= np.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    qd = 0.2 * rng.standard_normal((N, m.nv))
    eff = 0.4 * rng.standard_normal((N, m.njd)).astype(np.float32)
    zt = jnp.zeros((N, m.njd), jnp.float32)
    fa = jnp.zeros((N, m.nb, 6), jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    qd = jnp.asarray(qd, jnp.float32)
    eff = jnp.asarray(eff)

    qf, qdf, sff, posf, quatf, avelf, lvelf = fused.step(
        q, qd, eff, zt, zt, fa, n_steps, interpret=True
    )

    def ref_one(q1, qd1, e1):
        ctrl = eng.default_control().replace(effort=e1)
        sf = jnp.zeros((m.num_sensors, 6))
        for _ in range(n_steps):
            q1, qd1, sf = eng._substep(q1, qd1, ctrl, jnp.zeros((m.nb, 6)), h)
        st = eng._report_xla(q1, qd1, sf)
        return (q1, qd1, sf, st.body_pos, st.body_quat, st.body_avel,
                st.body_lvel)

    qr, qdr, sfr, posr, quatr, avelr, lvelr = jax.jit(jax.vmap(ref_one))(
        q, qd, eff
    )
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qr),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(qdf), np.asarray(qdr),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(posf), np.asarray(posr),
                               rtol=1e-3, atol=1e-4)
    # quats sign-aligned
    sgn = np.sign(np.sum(np.asarray(quatf) * np.asarray(quatr), axis=-1,
                         keepdims=True))
    np.testing.assert_allclose(np.asarray(quatf) * sgn, np.asarray(quatr),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sff), np.asarray(sfr),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(avelf), np.asarray(avelr),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(lvelf), np.asarray(lvelr),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("name", ["BallBalance", "FrankaCabinet"])
def test_fused_math_forests_pairs_gravity_comp(name):
    """The newly fused scene features vs the XLA path: multi-articulation
    forests with FIXED and FREE roots, cross-tree pairwise contacts
    (tray+ball / gripper+cabinet), gravity compensation, and applied body
    wrenches."""
    task = get_task(name)
    eng = task.engine
    m = task.model
    assert fs.eligible(m, eng)
    rng = np.random.default_rng(3)
    N = 8
    q, qd = _perturbed_batch(m, rng, N)
    eff = jnp.asarray(0.3 * rng.standard_normal((N, m.njd)), jnp.float32)
    ptg = jnp.asarray(0.05 * rng.standard_normal((N, m.njd)), jnp.float32)
    vtg = jnp.zeros((N, m.njd), jnp.float32)
    fa = jnp.asarray(0.5 * rng.standard_normal((N, m.nb, 6)), jnp.float32)

    (qf, qdf, _), (qr, qdr, _) = _run_both(eng, m, q, qd, eff, ptg, vtg, fa)
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qr),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(qdf), np.asarray(qdr),
                               rtol=5e-3, atol=5e-3)


def test_fused_heightfield_local_plane_exact():
    """For a globally planar height field the per-contact-point local plane
    [c0, gx, gy] IS the field, so the fused kernel (frozen local planes)
    must match the XLA path (fresh height_fn samples) exactly. Uses a tiny
    biped (FREE base + 2 revolute legs with sphere feet): full-size models
    make XLA:CPU chew >10 min on the unrolled scalar trace (the TPU Mosaic
    backend compiles them in seconds; covered by the on-TPU task suite)."""
    from omniisaacgymenvs_tpu.physics.engine import PhysicsEngine, SimParams
    from omniisaacgymenvs_tpu.physics.model import ModelBuilder

    GX, GY, C0 = 0.06, -0.04, 0.02

    def height_fn(x, y):
        h = C0 + GX * x + GY * y
        inv = 1.0 / np.sqrt(1.0 + GX * GX + GY * GY)
        n = jnp.broadcast_to(
            jnp.asarray([-GX * inv, -GY * inv, inv], jnp.float32),
            x.shape + (3,),
        )
        return h, n

    b = ModelBuilder("MiniBiped")
    base = b.add_body(
        "base", parent=-1, joint_type=JointType.FREE, mass=2.0,
        inertia=(0.02, 0.02, 0.02), default_pos=(0.0, 0.0, 0.3),
    )
    for name, sy in (("L", 0.1), ("R", -0.1)):
        leg = b.add_body(
            f"leg{name}", parent=base, joint_type=JointType.REVOLUTE,
            joint_axis=(0.0, 1.0, 0.0), joint_pos=(0.0, sy, 0.0),
            mass=0.5, com=(0.0, 0.0, -0.125), inertia=(0.005, 0.005, 1e-4),
            limit=(-1.0, 1.0), armature=0.01, stiffness=20.0,
            drive_damping=1.0, max_effort=30.0,
        )
        # foot: resting at z ~ 0.05 so the raised plane (C0 + slope)
        # penetrates it
        b.add_sphere_collider(leg, (0.0, 0.0, -0.25), 0.05)
    m = b.finalize()
    eng = PhysicsEngine(m, SimParams(dt=1.0 / 60.0, substeps=2),
                        height_fn=height_fn)
    rng = np.random.default_rng(4)
    N = 8
    q, qd = _perturbed_batch(m, rng, N, scale=0.01)
    eff = jnp.asarray(0.3 * rng.standard_normal((N, m.njd)), jnp.float32)
    zt = jnp.zeros((N, m.njd), jnp.float32)
    fa = jnp.zeros((N, m.nb, 6), jnp.float32)

    def planes_one(q1, qd1):
        st = eng._report_xla(q1, qd1, jnp.zeros((m.num_sensors, 6)))
        return eng._contact_planes(st)

    planes = jax.jit(jax.vmap(planes_one))(q, qd)

    # sanity: the scenario actually has active contacts
    from omniisaacgymenvs_tpu.physics import dynamics
    kin = dynamics.kinematics(m, q[0], qd[0])
    cb = np.asarray(m.cp_body)
    pt = kin.pw[cb] + jnp.einsum("cij,cj->ci", kin.Rw[cb], m.cp_pos)
    h0, _ = height_fn(pt[:, 0], pt[:, 1])
    assert np.any(np.asarray(m.cp_radius) - np.asarray(pt[:, 2] - h0) > 0)

    (qf, qdf, _), (qr, qdr, _) = _run_both(
        eng, m, q, qd, eff, zt, zt, fa, planes=planes
    )
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qr),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(qdf), np.asarray(qdr),
                               rtol=5e-3, atol=5e-3)


def test_fused_math_dr_overlay():
    """Domain-randomization overlays as fused-kernel inputs vs the XLA
    path's overlay handling (engine._substep ov.*): per-env mass,
    stiffness/damping, friction scales and gravity delta."""
    task = get_task("BallBalance")
    eng = task.engine
    m = task.model
    rng = np.random.default_rng(7)
    N = 8
    q, qd = _perturbed_batch(m, rng, N)
    eff = jnp.asarray(0.3 * rng.standard_normal((N, m.njd)), jnp.float32)
    zt = jnp.zeros((N, m.njd), jnp.float32)
    fa = jnp.zeros((N, m.nb, 6), jnp.float32)
    u = lambda shape, lo, hi: jnp.asarray(
        rng.uniform(lo, hi, shape), jnp.float32
    )
    dr = {
        "mass_scale": u((N, m.nb), 0.7, 1.3),
        "stiffness_scale": u((N, m.njd), 0.8, 1.2),
        "damping_scale": u((N, m.njd), 0.8, 1.2),
        "friction_scale": u((N, m.nb), 0.6, 1.4),
        "geom_scale": u((N, m.nb), 0.9, 1.1),
        "gravity_delta": u((N, 3), -0.5, 0.5),
        "limit_lower_delta": u((N, m.njd), -0.05, 0.0),
        "limit_upper_delta": u((N, m.njd), 0.0, 0.05),
    }

    (qf, qdf, _), (qr, qdr, _) = _run_both(
        eng, m, q, qd, eff, zt, zt, fa, dr=dr
    )
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qr),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(qdf), np.asarray(qdr),
                               rtol=5e-3, atol=5e-3)
