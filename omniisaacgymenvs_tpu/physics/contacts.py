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

from typing import Callable, NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.physics.model import Model, SurfaceType


@flax.struct.dataclass
class ContactParams:
    """Compliant contact material parameters.

    kn: normal stiffness [N/m]; kd: normal damping [N s/m];
    kt: tangential (stiction) velocity gain [N s/m];
    mu: Coulomb friction coefficient (scaled per contact point by the
    model's cp_friction).
    """

    kn: float = 5.0e4
    kd: float = 2.0      # Hunt-Crossley damping factor chi [s/m]:
                         # fn = kn*pen*(1 + chi*(-vn)) — penetration-scaled
                         # damping has no touch-instant force spike and stays
                         # stable under multi-point contact
    kt: float = 1.0e3
    mu: float = 1.0
    # per-point normal force cap — the compliant analog of PhysX
    # max_depenetration_velocity (reference cfg/task/Ant.yaml physx block):
    # caps the velocity a contact can impart per substep.
    fn_max: float = 1.0e9


def auto_contact_params(model: Model, dt_sub: float, mu: float = 1.0,
                        omega_dt: float = 0.5, chi: float = 2.0,
                        max_depenetration_velocity: float = 10.0) -> ContactParams:
    """Pick stable compliant-contact gains for a model and substep dt.

    Semi-implicit Euler is stable for the contact spring up to
    omega*dt = 2; omega_dt=0.5 leaves headroom for several simultaneous
    contact points on one body (box corners). Stiffness comes from the
    lightest body that carries contact points:
      kn = (omega_dt / dt)^2 * m_min.
    Damping is Hunt-Crossley (penetration-scaled, chi [s/m]) so there is no
    force spike at first touch and no explicit-damper instability; the
    tangential gain kt satisfies kt*dt/m = omega_dt^2 < 1. This replaces
    the reference's PhysX implicit TGS solver semantics with an
    explicit-stable equivalent.
    """
    import numpy as np

    if model.cp_body.shape[0] == 0:
        return ContactParams(mu=mu)
    masses = np.asarray(model.body_mass)[np.asarray(model.cp_body)]
    m_min = float(masses.min())
    kn = (omega_dt / dt_sub) ** 2 * m_min
    kt = kn * dt_sub
    fn_max = m_min * max_depenetration_velocity / dt_sub
    return ContactParams(kn=kn, kd=chi, kt=kt, mu=mu, fn_max=fn_max)


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

    # Hunt-Crossley: damping scaled by penetration (no touch spike)
    fn = jnp.where(
        active,
        params.kn * jnp.maximum(pen, 0.0)
        * jnp.clip(1.0 - params.kd * vn, 0.0, 5.0),
        0.0,
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


# ----------------------------------------------------------------------
# Pairwise contacts: this tree's points vs other trees' surfaces
# (tray+ball, hand+object, gripper+cabinet — reference scenes with several
# actors per env; PhysX does this with its GPU narrowphase, here it is a
# static candidate-pair list compiled per model, SURVEY.md §7.3 items 1-2).
# ----------------------------------------------------------------------

class PairGroups(NamedTuple):
    """Static candidate pairs grouped by surface type (numpy, build-time)."""

    sphere: dict
    capsule: dict
    box: dict


def build_pair_groups(model: Model) -> PairGroups:
    pts = np.asarray(model.pair_point)
    groups = {SurfaceType.SPHERE: [], SurfaceType.CAPSULE: [], SurfaceType.BOX: []}
    for k in range(pts.shape[0]):
        si = model.pair_surf[k]
        groups[SurfaceType(model.surf_type[si])].append((int(pts[k]), si))

    def pack(pairs, nparams):
        if not pairs:
            return dict(
                pt=np.zeros(0, np.int32), sbody=np.zeros(0, np.int32),
                params=np.zeros((0, nparams)),
            )
        pt = np.array([p for p, _ in pairs], np.int32)
        sbody = np.array([model.surf_body[s] for _, s in pairs], np.int32)
        params = np.array([model.surf_params[s] for _, s in pairs])
        return dict(pt=pt, sbody=sbody, params=params)

    return PairGroups(
        sphere=pack(groups[SurfaceType.SPHERE], 4),
        capsule=pack(groups[SurfaceType.CAPSULE], 7),
        box=pack(groups[SurfaceType.BOX], 10),
    )


def _contact_force(pen, n, vrel, mu, params: ContactParams):
    """Compliant normal (Hunt-Crossley damped) + capped viscous friction.
    Returns world-frame force on the POINT body."""
    active = pen > 0.0
    vn = jnp.sum(vrel * n, axis=-1)
    vt = vrel - vn[..., None] * n
    fn = jnp.where(
        active,
        params.kn * jnp.maximum(pen, 0.0)
        * jnp.clip(1.0 - params.kd * vn, 0.0, 5.0),
        0.0,
    )
    fn = jnp.minimum(fn, params.fn_max)
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    ft_mag = jnp.minimum(mu * fn, params.kt * vt_norm)
    ft = -ft_mag[..., None] * vt / (vt_norm[..., None] + 1e-6)
    return fn[..., None] * n + ft


def pair_contacts(
    model: Model,
    groups: PairGroups,
    body_pos: jax.Array,
    body_rot: jax.Array,
    body_avel: jax.Array,
    body_lvel: jax.Array,
    params: ContactParams,
) -> jax.Array:
    """Cross-tree point-vs-surface contact wrenches -> (nb, 6) [torque;
    force] per body in world coordinates. Static shapes: the candidate pair
    list is compiled into the model."""
    nb = model.nb
    f_ext = jnp.zeros((nb, 6))
    total = (
        groups.sphere["pt"].shape[0]
        + groups.capsule["pt"].shape[0]
        + groups.box["pt"].shape[0]
    )
    if total == 0:
        return f_ext

    def point_world(pi):
        cb = model.cp_body[pi]
        return cb, body_pos[cb] + jnp.einsum(
            "cij,cj->ci", body_rot[cb], model.cp_pos[pi]
        )

    def vel_at(b, x):
        return body_lvel[b] + jnp.cross(body_avel[b], x - body_pos[b])

    def accumulate(f_ext, pb, sb, pt_w, f):
        n_pt = jnp.cross(pt_w - body_pos[pb], f)
        n_sf = jnp.cross(pt_w - body_pos[sb], -f)
        f_ext = f_ext.at[pb, 0:3].add(n_pt).at[pb, 3:6].add(f)
        f_ext = f_ext.at[sb, 0:3].add(n_sf).at[sb, 3:6].add(-f)
        return f_ext

    # ---- sphere surfaces ----
    g = groups.sphere
    if g["pt"].shape[0]:
        pi = jnp.asarray(g["pt"])
        sb = jnp.asarray(g["sbody"])
        prm = jnp.asarray(g["params"], jnp.float32)
        pb, pt_w = point_world(pi)
        c_w = body_pos[sb] + jnp.einsum("cij,cj->ci", body_rot[sb], prm[:, 0:3])
        d = pt_w - c_w
        dist = jnp.linalg.norm(d, axis=-1)
        n = d / (dist[..., None] + 1e-9)
        pen = prm[:, 3] + model.cp_radius[pi] - dist
        vrel = vel_at(pb, pt_w) - vel_at(sb, pt_w)
        mu = params.mu * model.cp_friction[pi]
        f = _contact_force(pen, n, vrel, mu, params)
        f_ext = accumulate(f_ext, pb, sb, pt_w, f)

    # ---- capsule surfaces ----
    g = groups.capsule
    if g["pt"].shape[0]:
        pi = jnp.asarray(g["pt"])
        sb = jnp.asarray(g["sbody"])
        prm = jnp.asarray(g["params"], jnp.float32)
        pb, pt_w = point_world(pi)
        p0 = body_pos[sb] + jnp.einsum("cij,cj->ci", body_rot[sb], prm[:, 0:3])
        p1 = body_pos[sb] + jnp.einsum("cij,cj->ci", body_rot[sb], prm[:, 3:6])
        seg = p1 - p0
        t = jnp.clip(
            jnp.sum((pt_w - p0) * seg, axis=-1)
            / (jnp.sum(seg * seg, axis=-1) + 1e-9),
            0.0, 1.0,
        )
        c_w = p0 + t[..., None] * seg
        d = pt_w - c_w
        dist = jnp.linalg.norm(d, axis=-1)
        n = d / (dist[..., None] + 1e-9)
        pen = prm[:, 6] + model.cp_radius[pi] - dist
        vrel = vel_at(pb, pt_w) - vel_at(sb, c_w)
        mu = params.mu * model.cp_friction[pi]
        f = _contact_force(pen, n, vrel, mu, params)
        f_ext = accumulate(f_ext, pb, sb, pt_w, f)

    # ---- box surfaces ----
    g = groups.box
    if g["pt"].shape[0]:
        pi = jnp.asarray(g["pt"])
        sb = jnp.asarray(g["sbody"])
        prm = jnp.asarray(g["params"], jnp.float32)
        pb, pt_w = point_world(pi)
        center, half, bq = prm[:, 0:3], prm[:, 3:6], prm[:, 6:10]
        from omniisaacgymenvs_tpu.physics import rotations as _rot

        R_box = body_rot[sb] @ _rot.quat_to_rotmat(bq)  # box frame -> world
        c_w = body_pos[sb] + jnp.einsum("cij,cj->ci", body_rot[sb], center)
        p_l = jnp.einsum("cji,cj->ci", R_box, pt_w - c_w)  # world -> box
        clamped = jnp.clip(p_l, -half, half)
        d_out = p_l - clamped
        dist_out = jnp.linalg.norm(d_out, axis=-1)
        outside = dist_out > 1e-9
        n_out = d_out / (dist_out[..., None] + 1e-9)
        # inside: push out through nearest face
        face_d = half - jnp.abs(p_l)          # distance to each face
        ax = jnp.argmin(face_d, axis=-1)
        n_in = (
            jax.nn.one_hot(ax, 3) * jnp.sign(
                jnp.take_along_axis(p_l, ax[..., None], axis=-1)
            )
        )
        pen_in = -jnp.min(face_d, axis=-1)    # negative depth inside
        n_l = jnp.where(outside[..., None], n_out, n_in)
        pen = jnp.where(
            outside,
            model.cp_radius[pi] - dist_out,
            model.cp_radius[pi] - pen_in,
        )
        n = jnp.einsum("cij,cj->ci", R_box, n_l)
        vrel = vel_at(pb, pt_w) - vel_at(sb, pt_w)
        mu = params.mu * model.cp_friction[pi]
        f = _contact_force(pen, n, vrel, mu, params)
        f_ext = accumulate(f_ext, pb, sb, pt_w, f)

    return f_ext
