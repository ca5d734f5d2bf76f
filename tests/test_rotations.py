import jax.numpy as jnp
import numpy as np
import pytest

from omniisaacgymenvs_tpu.physics import rotations as rot


def _rand_quat(rng):
    q = rng.standard_normal(4)
    return jnp.asarray(q / np.linalg.norm(q), jnp.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_mul_identity(rng):
    q = _rand_quat(rng)
    np.testing.assert_allclose(
        rot.quat_mul(q, rot.quat_identity()), q, atol=1e-6
    )
    np.testing.assert_allclose(
        rot.quat_mul(rot.quat_identity(), q), q, atol=1e-6
    )


def test_quat_inverse(rng):
    q = _rand_quat(rng)
    np.testing.assert_allclose(
        rot.quat_mul(q, rot.quat_conjugate(q)), rot.quat_identity(), atol=1e-6
    )


def test_quat_rotate_matches_matrix(rng):
    for _ in range(5):
        q = _rand_quat(rng)
        v = jnp.asarray(rng.standard_normal(3), jnp.float32)
        R = rot.quat_to_rotmat(q)
        np.testing.assert_allclose(rot.quat_rotate(q, v), R @ v, atol=1e-5)
        np.testing.assert_allclose(
            rot.quat_rotate_inverse(q, v), R.T @ v, atol=1e-5
        )


def test_quat_rotate_composition(rng):
    q1, q2 = _rand_quat(rng), _rand_quat(rng)
    v = jnp.asarray(rng.standard_normal(3), jnp.float32)
    lhs = rot.quat_rotate(rot.quat_mul(q1, q2), v)
    rhs = rot.quat_rotate(q1, rot.quat_rotate(q2, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_angle_axis_90deg():
    q = rot.quat_from_angle_axis(jnp.pi / 2, jnp.array([0.0, 0.0, 1.0]))
    v = jnp.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(
        rot.quat_rotate(q, v), jnp.array([0.0, 1.0, 0.0]), atol=1e-6
    )


def test_rotmat_quat_roundtrip(rng):
    for _ in range(10):
        q = _rand_quat(rng)
        q2 = rot.rotmat_to_quat(rot.quat_to_rotmat(q))
        # q and -q are the same rotation
        sign = jnp.sign(jnp.sum(q * q2))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_quat_integrate_constant_rate():
    # integrate pi/2 about z in 100 steps
    q = rot.quat_identity()
    omega = jnp.array([0.0, 0.0, jnp.pi / 2])
    for _ in range(100):
        q = rot.quat_integrate_body(q, omega, 0.01)
    expected = rot.quat_from_angle_axis(jnp.pi / 2, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(q, expected, atol=1e-4)


def test_euler_xyz(rng):
    yaw = 0.3
    q = rot.quat_from_angle_axis(jnp.asarray(yaw), jnp.array([0.0, 0.0, 1.0]))
    r, p, y = rot.get_euler_xyz(q)
    np.testing.assert_allclose(y, yaw, atol=1e-6)
    np.testing.assert_allclose(r, 0.0, atol=1e-6)


def test_unscale():
    lo, hi = jnp.array([-1.0]), jnp.array([3.0])
    np.testing.assert_allclose(rot.unscale(jnp.array([1.0]), lo, hi), [0.0])
    np.testing.assert_allclose(rot.unscale(jnp.array([3.0]), lo, hi), [1.0])
    np.testing.assert_allclose(
        rot.scale(rot.unscale(jnp.array([2.0]), lo, hi), lo, hi), [2.0]
    )
