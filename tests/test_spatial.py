import jax.numpy as jnp
import numpy as np
import pytest

from omniisaacgymenvs_tpu.physics import spatial


@pytest.fixture
def rng():
    return np.random.default_rng(1)


def _rand_transform(rng):
    # random rotation via QR
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return jnp.asarray(Q, jnp.float32), jnp.asarray(
        rng.standard_normal(3), jnp.float32
    )


def test_motion_transform_matches_explicit(rng):
    E, r = _rand_transform(rng)
    v = jnp.asarray(rng.standard_normal(6), jnp.float32)
    X = spatial.motion_transform(E, r)
    np.testing.assert_allclose(
        spatial.transform_motion(E, r, v), X @ v, atol=1e-5
    )


def test_motion_roundtrip(rng):
    E, r = _rand_transform(rng)
    v = jnp.asarray(rng.standard_normal(6), jnp.float32)
    v2 = spatial.transform_motion_inv(E, r, spatial.transform_motion(E, r, v))
    np.testing.assert_allclose(v2, v, atol=1e-5)


def test_force_transform_is_inverse_transpose(rng):
    E, r = _rand_transform(rng)
    f = jnp.asarray(rng.standard_normal(6), jnp.float32)
    X = spatial.motion_transform(E, r)
    np.testing.assert_allclose(
        spatial.transform_force(E, r, f),
        jnp.linalg.inv(X).T @ f,
        atol=1e-4,
    )


def test_force_roundtrip(rng):
    E, r = _rand_transform(rng)
    f = jnp.asarray(rng.standard_normal(6), jnp.float32)
    f2 = spatial.transform_force_inv(E, r, spatial.transform_force(E, r, f))
    np.testing.assert_allclose(f2, f, atol=1e-5)


def test_power_invariance(rng):
    # f . v is invariant under coordinate change
    E, r = _rand_transform(rng)
    v = jnp.asarray(rng.standard_normal(6), jnp.float32)
    f = jnp.asarray(rng.standard_normal(6), jnp.float32)
    p1 = jnp.dot(f, v)
    p2 = jnp.dot(
        spatial.transform_force(E, r, f), spatial.transform_motion(E, r, v)
    )
    np.testing.assert_allclose(p1, p2, atol=1e-4)


def test_spatial_inertia_point_mass():
    # point mass at com: kinetic energy 1/2 m v^2 for pure translation
    m = jnp.asarray(2.0)
    I = spatial.spatial_inertia(m, jnp.zeros(3), jnp.zeros((3, 3)))
    v = jnp.array([0.0, 0.0, 0.0, 1.0, 2.0, 3.0])
    ke = 0.5 * v @ I @ v
    np.testing.assert_allclose(ke, 0.5 * 2.0 * 14.0, atol=1e-5)


def test_inertia_transform_preserves_energy(rng):
    E, r = _rand_transform(rng)
    m = jnp.asarray(1.5)
    com = jnp.asarray(rng.standard_normal(3) * 0.1, jnp.float32)
    Ic = jnp.asarray(np.diag(rng.uniform(0.1, 1.0, 3)), jnp.float32)
    I_B = spatial.spatial_inertia(m, com, Ic)
    v_B = jnp.asarray(rng.standard_normal(6), jnp.float32)
    ke_B = 0.5 * v_B @ I_B @ v_B
    # express in A coordinates
    I_A = spatial.transform_inertia(E, r, I_B)
    v_A = spatial.transform_motion_inv(E, r, v_B)
    ke_A = 0.5 * v_A @ I_A @ v_A
    np.testing.assert_allclose(ke_A, ke_B, rtol=1e-4)


def test_cross_motion_antisymmetry(rng):
    v = jnp.asarray(rng.standard_normal(6), jnp.float32)
    np.testing.assert_allclose(
        spatial.cross_motion(v, v), jnp.zeros(6), atol=1e-6
    )
