"""Fused substep kernel math vs the reference XLA path (CPU, no Pallas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omniisaacgymenvs_tpu.ops import fused_substep as fs
from omniisaacgymenvs_tpu.tasks import get_task


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
