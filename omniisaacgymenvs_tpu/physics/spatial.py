"""Spatial (6D) vector algebra for articulated rigid-body dynamics.

Featherstone convention: a spatial motion vector is [angular; linear] and a
spatial force vector is [torque; force]. A coordinate transform from frame A
to frame B is given by (E, r): E is the 3x3 rotation taking A-coordinates to
B-coordinates (x_B = E @ x_A) and r is the position of B's origin expressed in
A coordinates.

Motion transform (6x6):  X  = [[E, 0], [-E @ skew(r), E]]
Force transform:         X* = [[E, -E @ skew(r)], [0, E]]  (= X^{-T})
Inertia transform child->parent frame: I_A = X^T @ I_B @ X.

All functions broadcast over leading batch dims; per-env code is written
single-env and vmapped over the environment axis (the TPU VPU vectorizes the
env axis; these small 6x6 ops become (N,6,6) batched elementwise/matmul work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(v: jax.Array) -> jax.Array:
    """3x3 cross-product matrix: skew(v) @ u = v x u."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    )
    return m.reshape(v.shape[:-1] + (3, 3))


def motion_transform(E: jax.Array, r: jax.Array) -> jax.Array:
    """6x6 spatial motion transform X for (E, r) as defined above."""
    Z = jnp.zeros_like(E)
    top = jnp.concatenate([E, Z], axis=-1)
    bot = jnp.concatenate([-E @ skew(r), E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def transform_motion(E: jax.Array, r: jax.Array, v: jax.Array) -> jax.Array:
    """Apply motion transform without materializing the 6x6: v_B = X v_A."""
    w, vl = v[..., 0:3], v[..., 3:6]
    wB = (E @ w[..., None])[..., 0]
    vB = (E @ (vl - jnp.cross(r, w))[..., None])[..., 0]
    return jnp.concatenate([wB, vB], axis=-1)


def transform_motion_inv(E: jax.Array, r: jax.Array, v: jax.Array) -> jax.Array:
    """Inverse motion transform: v_A = X^{-1} v_B."""
    w, vl = v[..., 0:3], v[..., 3:6]
    ET = jnp.swapaxes(E, -1, -2)
    wA = (ET @ w[..., None])[..., 0]
    vA = (ET @ vl[..., None])[..., 0] + jnp.cross(r, wA)
    return jnp.concatenate([wA, vA], axis=-1)


def transform_force(E: jax.Array, r: jax.Array, f: jax.Array) -> jax.Array:
    """Apply force transform: f_B = X* f_A."""
    n, fl = f[..., 0:3], f[..., 3:6]
    nB = (E @ (n - jnp.cross(r, fl))[..., None])[..., 0]
    fB = (E @ fl[..., None])[..., 0]
    return jnp.concatenate([nB, fB], axis=-1)


def transform_force_inv(E: jax.Array, r: jax.Array, f: jax.Array) -> jax.Array:
    """Inverse force transform: f_A = X*^{-1} f_B (i.e. X^T f_B)."""
    n, fl = f[..., 0:3], f[..., 3:6]
    ET = jnp.swapaxes(E, -1, -2)
    fA = (ET @ fl[..., None])[..., 0]
    nA = (ET @ n[..., None])[..., 0] + jnp.cross(r, fA)
    return jnp.concatenate([nA, fA], axis=-1)


def cross_motion(v: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial motion cross product v x m (both motion vectors)."""
    w, vl = v[..., 0:3], v[..., 3:6]
    mw, mv = m[..., 0:3], m[..., 3:6]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vl, mw)], axis=-1
    )


def cross_force(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial force cross product v x* f (motion x force)."""
    w, vl = v[..., 0:3], v[..., 3:6]
    n, fl = f[..., 0:3], f[..., 3:6]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1
    )


def spatial_inertia(mass: jax.Array, com: jax.Array, inertia_com: jax.Array) -> jax.Array:
    """6x6 spatial inertia about the body frame origin.

    mass: scalar, com: (3,) body-frame CoM, inertia_com: (3,3) rotational
    inertia about the CoM in body coordinates.

    I = [[I_com + m c̃ c̃^T, m c̃], [m c̃^T, m 1]]  with c̃ = skew(com).
    """
    c = skew(com)
    mc = mass[..., None, None] * c
    eye = jnp.broadcast_to(jnp.eye(3), c.shape)
    top = jnp.concatenate(
        [inertia_com + mc @ jnp.swapaxes(c, -1, -2), mc], axis=-1
    )
    bot = jnp.concatenate(
        [jnp.swapaxes(mc, -1, -2), mass[..., None, None] * eye], axis=-1
    )
    return jnp.concatenate([top, bot], axis=-2)


def transform_inertia(E: jax.Array, r: jax.Array, I_child: jax.Array) -> jax.Array:
    """Transform a 6x6 spatial inertia from child coords to parent coords.

    With X the motion transform parent->child: I_parent = X^T I_child X.
    """
    X = motion_transform(E, r)
    return jnp.swapaxes(X, -1, -2) @ I_child @ X
