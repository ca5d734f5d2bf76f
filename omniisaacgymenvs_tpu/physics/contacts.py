"""Ground contact model: compiled contact points vs plane / heightfield.

A regularized compliant contact (nonlinear spring-damper normal force +
Coulomb-capped viscous friction) replacing the reference's PhysX TGS contact
solver (SURVEY.md §2.3). Static shapes throughout: every model has a fixed,
compile-time set of candidate contact points (no broadphase needed for
plane contact); activity is a mask. Materials follow the reference's default
physics material (static/dynamic friction, restitution ->
cfg/task/*.yaml `default_physics_material`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Callable

import flax.struct
import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.physics.model import Model


@flax.struct.dataclass
class ContactParams:
    """Compliant contact material parameters.

    kn: normal stiffness [N/m]; kd: normal damping [N s/m];
    kt: tangential (stiction) velocity gain [N s/m];
    mu: Coulomb friction coefficient (scaled per contact point by the
    model's cp_friction).
    """

    kn: float = 5.0e4
    kd: float = 2.0e3
    kt: float = 1.0e3
    mu: float = 1.0
    # per-point normal force cap — the compliant analog of PhysX
    # max_depenetration_velocity (reference cfg/task/Ant.yaml physx block):
    # caps the velocity a contact can impart per substep.
    fn_max: float = 1.0e9


def auto_contact_params(model: Model, dt_sub: float, mu: float = 1.0,
                        omega_dt: float = 0.7, zeta: float = 0.5,
                        max_depenetration_velocity: float = 10.0) -> ContactParams:
    """Pick stable compliant-contact gains for a model and substep dt.

    Semi-implicit Euler is stable for an undamped contact spring up to
    omega*dt = 2 and for explicit damping up to kd*dt/m = 2. Gains are set
    from the lightest body that carries contact points:
      kn = (omega_dt / dt)^2 * m_min, kd = 2*zeta*sqrt(kn*m_min), kt = kd.
    This replaces the reference's PhysX implicit TGS solver stiffness
    semantics with an explicit-stable equivalent.
    """
    import numpy as np

    if model.cp_body.shape[0] == 0:
        return ContactParams(mu=mu)
    masses = np.asarray(model.body_mass)[np.asarray(model.cp_body)]
    m_min = float(masses.min())
    kn = (omega_dt / dt_sub) ** 2 * m_min
    kd = 2.0 * zeta * float(np.sqrt(kn * m_min))
    fn_max = m_min * max_depenetration_velocity / dt_sub
    return ContactParams(kn=kn, kd=kd, kt=kd, mu=mu, fn_max=fn_max)


class ContactResult(NamedTuple):
    f_ext: jax.Array          # (nb, 6) world wrench [torque; force] per body
    body_force: jax.Array     # (nb, 3) net world contact force per body
    body_torque: jax.Array    # (nb, 3) net world contact torque per body


def plane_contacts(
    model: Model,
    body_pos: jax.Array,     # (nb, 3) world
    body_rot: jax.Array,     # (nb, 3, 3) world rotation matrices
    body_avel: jax.Array,    # (nb, 3) world angular velocity
    body_lvel: jax.Array,    # (nb, 3) world linear velocity of body origin
    params: ContactParams,
    height_fn: Optional[Callable] = None,
) -> ContactResult:
    """Contact forces against the ground plane z=0 (or a heightfield given by
    height_fn(x, y) -> (h, normal))."""
    nb = model.nb
    if model.cp_body.shape[0] == 0:
        zeros = jnp.zeros((nb, 3))
        return ContactResult(jnp.zeros((nb, 6)), zeros, zeros)

    cb = model.cp_body  # (ncp,)
    # world contact point positions
    pt = body_pos[cb] + jnp.einsum("cij,cj->ci", body_rot[cb], model.cp_pos)
    if height_fn is None:
        h = jnp.zeros(pt.shape[0])
        n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), pt.shape)
    else:
        h, n = height_fn(pt[..., 0], pt[..., 1])
    pen = model.cp_radius - (pt[..., 2] - h)
    active = pen > 0.0

    # contact point velocity
    v_pt = body_lvel[cb] + jnp.cross(body_avel[cb], pt - body_pos[cb])
    vn = jnp.sum(v_pt * n, axis=-1)
    vt = v_pt - vn[..., None] * n

    fn = jnp.where(
        active, jnp.maximum(0.0, params.kn * pen - params.kd * vn), 0.0
    )
    fn = jnp.minimum(fn, params.fn_max)
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    mu = params.mu * model.cp_friction
    ft_mag = jnp.minimum(mu * fn, params.kt * vt_norm)
    ft = -ft_mag[..., None] * vt / (vt_norm[..., None] + 1e-6)

    f_w = fn[..., None] * n + ft                       # (ncp, 3)
    n_w = jnp.cross(pt - body_pos[cb], f_w)            # torque about origin

    body_force = jax.ops.segment_sum(f_w, cb, num_segments=nb)
    body_torque = jax.ops.segment_sum(n_w, cb, num_segments=nb)
    f_ext = jnp.concatenate([body_torque, body_force], axis=-1)
    return ContactResult(f_ext, body_force, body_torque)
