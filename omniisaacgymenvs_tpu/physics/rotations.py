"""Quaternion / rotation math, wxyz convention.

The reference framework uses wxyz quaternions and breadth-first joint ordering
(reference: docs/transfering_policies_from_isaac_gym.md:28-56). All helpers
here operate on single vectors; batch with vmap or rely on broadcasting over
leading axes (every op is written to broadcast over arbitrary leading dims).

Also provides JAX equivalents of the omni.isaac.core torch rotation helpers the
reference tasks call (compute_heading_and_up / compute_rot / get_euler_xyz,
used by reference tasks/shared/locomotion.py:91-95, 225-231).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_identity() -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b, wxyz."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


quat_inverse = quat_conjugate  # unit quaternions only


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-9)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by unit quaternion q (active rotation, body->world)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by q^-1 (world->body for a body-attitude quaternion)."""
    return quat_rotate(quat_conjugate(q), v)


def quat_from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """Unit quaternion for rotation of `angle` radians about unit `axis`."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], s[..., None] * axis], axis=-1
    )


def quat_exp_approx(omega_dt: jax.Array) -> jax.Array:
    """Quaternion exponential of a scaled rotation vector (exact map).

    Returns exp([0, omega_dt/2]) — the incremental rotation for angular
    velocity * dt. Safe at zero via the sinc formulation.
    """
    half = 0.5 * omega_dt
    angle = jnp.linalg.norm(half, axis=-1, keepdims=True)
    # sinc(x/pi) = sin(x)/x, well-defined at 0
    s = jnp.sinc(angle / jnp.pi)
    return quat_normalize(
        jnp.concatenate([jnp.cos(angle), s * half], axis=-1)
    )


def quat_integrate_body(q: jax.Array, omega_body: jax.Array, dt) -> jax.Array:
    """Integrate attitude with body-frame angular velocity: q' = q ⊗ exp(ω dt)."""
    return quat_mul(q, quat_exp_approx(omega_body * dt))


def quat_integrate_world(q: jax.Array, omega_world: jax.Array, dt) -> jax.Array:
    """Integrate attitude with world-frame angular velocity."""
    return quat_mul(quat_exp_approx(omega_world * dt), q)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Rotation matrix R with x_world = R @ x_body (columns = body axes)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix -> wxyz quaternion (branch-free Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw = 0.5 * safe_sqrt(1.0 + tr)
    qx = 0.5 * safe_sqrt(1.0 + m00 - m11 - m22)
    qy = 0.5 * safe_sqrt(1.0 - m00 + m11 - m22)
    qz = 0.5 * safe_sqrt(1.0 - m00 - m11 + m22)
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    return quat_normalize(jnp.stack([qw, qx, qy, qz], axis=-1))


def normalize_angle(x: jax.Array) -> jax.Array:
    """Wrap to (-pi, pi] (reference tasks/shared/locomotion.py:190-192)."""
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


def get_euler_xyz(q: jax.Array):
    """wxyz quaternion -> (roll, pitch, yaw), matching the reference's
    omni.isaac.core torch get_euler_xyz semantics (used via compute_rot,
    reference tasks/shared/locomotion.py:229-231)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = 2.0 * (w * y - z * x)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.copysign(jnp.pi / 2.0, sinp),
        jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)),
    )
    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll, pitch, yaw


def compute_heading_and_up(
    torso_rotation: jax.Array,
    inv_start_rot: jax.Array,
    to_target: jax.Array,
    vec0: jax.Array,
    vec1: jax.Array,
    up_idx: int,
):
    """JAX port of the isaac torch helper (reference locomotion.py:225-227).

    Returns (torso_quat, up_proj, heading_proj, up_vec, heading_vec).
    """
    torso_quat = quat_mul(torso_rotation, inv_start_rot)
    up_vec = quat_rotate(torso_quat, vec1)
    heading_vec = quat_rotate(torso_quat, vec0)
    up_proj = up_vec[..., up_idx]
    target_dir = to_target / jnp.linalg.norm(
        to_target, axis=-1, keepdims=True
    ).clip(1e-9)
    heading_proj = jnp.sum(heading_vec * target_dir, axis=-1)
    return torso_quat, up_proj, heading_proj, up_vec, heading_vec


def compute_rot(
    torso_quat: jax.Array,
    velocity: jax.Array,
    ang_velocity: jax.Array,
    targets: jax.Array,
    torso_positions: jax.Array,
):
    """JAX port of the isaac torch helper (reference locomotion.py:229-231).

    Reproduces the reference's indexing (atan2 over the (z, x) components)
    so observations match bit-for-bit in semantics.
    """
    vel_loc = quat_rotate_inverse(torso_quat, velocity)
    angvel_loc = quat_rotate_inverse(torso_quat, ang_velocity)
    roll, pitch, yaw = get_euler_xyz(torso_quat)
    walk_target_angle = jnp.arctan2(
        targets[..., 2] - torso_positions[..., 2],
        targets[..., 0] - torso_positions[..., 0],
    )
    angle_to_target = walk_target_angle - yaw
    return vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target


def unscale(x: jax.Array, lower: jax.Array, upper: jax.Array) -> jax.Array:
    """Map [lower, upper] -> [-1, 1] (isaac maths.unscale)."""
    return (2.0 * x - upper - lower) / (upper - lower)


def scale(x: jax.Array, lower: jax.Array, upper: jax.Array) -> jax.Array:
    """Map [-1, 1] -> [lower, upper] (isaac maths.scale)."""
    return 0.5 * (x + 1.0) * (upper - lower) + lower
