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

from omniisaacgymenvs_tpu.physics.model import JointType, Model, SurfaceType


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
    # --- per-mass mode (auto_contact_params): gains scale with the
    # effective contact mass so every contact runs at ITS stability limit
    # instead of the global lightest body's. Ground point: m = mass of the
    # point's body; pair: m = min(point body, surface body). This is what
    # gives a 70 g cube on a 200 g palm a ~0.5 mm (not 7 mm) penetration and
    # a near-stiction tangential response while staying explicit-stable for
    # 7 g fingertips.
    per_mass: bool = False
    kn_pm: float = 0.0    # normal stiffness per kg [1/s^2]
    kt_pm: float = 0.0    # tangential (stiction) gain per kg [1/s]
    fnm_pm: float = 0.0   # force cap per kg [m/s^2 -> N/kg]


def auto_contact_params(model: Model, dt_sub: float, mu: float = 1.0,
                        omega_dt: float = 0.5, chi: float = 2.0,
                        max_depenetration_velocity: float = 10.0) -> ContactParams:
    """Pick stable compliant-contact gains for a model and substep dt.

    Semi-implicit Euler is stable for the contact spring up to
    omega*dt = 2; omega_dt=0.5 leaves headroom for several simultaneous
    contact points on one body (box corners). Gains are PER EFFECTIVE MASS
    (ContactParams.per_mass): each ground point uses its own body's mass,
    each cross-tree pair the lighter of its two bodies, so every contact
    sits at its stability margin instead of the globally lightest body's:
      kn = (omega_dt / dt)^2 * m_eff.
    Normal damping is Hunt-Crossley (penetration-scaled, chi [s/m]) so
    there is no force spike at first touch and no explicit-damper
    instability. The tangential gain is the IMPULSE-CAPPED stiction limit
      kt = m_eff / dt
    (the force that stops the slip velocity within one substep, capped by
    mu*fn) — the practical explicit analog of static friction; anything
    smaller turns Coulomb stick into fast viscous creep (a 70 g cube crept
    off the ShadowHand palm at ~8 cm/s before this). Replaces the
    reference's PhysX implicit TGS solver semantics with an
    explicit-stable equivalent.
    """
    import numpy as np

    if model.cp_body.shape[0] == 0:
        return ContactParams(mu=mu)
    m_min = float(point_effective_masses(model).min())
    kn_pm = (omega_dt / dt_sub) ** 2
    # 0.7x the exact one-substep stopping impulse: per-point effective
    # masses already discount rotational coupling, so several simultaneous
    # points on one body still sum below the translational stability bound
    # (humanoid foot box, 8 corners: 8 * 0.7 * (m_eff/m) ~ 1.1 < 2;
    # 65 mm cube, 4 corners: ~0.5) while halving the residual slip creep
    kt_pm = 0.7 / dt_sub
    fnm_pm = max_depenetration_velocity / dt_sub
    return ContactParams(
        kn=kn_pm * m_min, kd=chi, kt=kt_pm * m_min, mu=mu,
        # scalar fallback cap: lightest FULL body mass (mdv caps body-level
        # velocity — point_body_masses); per-mass paths compute per row
        fn_max=fnm_pm * float(point_body_masses(model).min()),
        per_mass=True, kn_pm=kn_pm, kt_pm=kt_pm, fnm_pm=fnm_pm,
    )


def _eff_mass(m, I_min, r2):
    """Effective mass seen by a contact force applied at lever^2 = r2 from
    the CoM of a body with mass m and min principal inertia I_min:
    1/m_eff = 1/m + r^2/I — the rotational coupling that makes a box corner
    ~5x 'lighter' than the box. Contact gains must use THIS mass or corner
    impacts run past the explicit stability limit and pump energy."""
    return 1.0 / (
        1.0 / np.maximum(m, 1e-9) + r2 / np.maximum(I_min, 1e-12)
    )


def point_body_masses(model: Model) -> np.ndarray:
    """(ncp,) FULL mass of each ground contact point's body (numpy).

    Used for the max_depenetration_velocity force cap: PhysX's cap limits
    the translational velocity a contact can impart to the BODY
    (F*dt/m_body <= mdv), so the cap must scale with the full body mass.
    Scaling it with the lever-discounted point effective mass (as the
    stiffness gains correctly do) capped an Anymal foot at ~60 N — below
    the ~125 N static load per foot — and the robot sank through the
    floor in free fall."""
    cb = np.asarray(model.cp_body)
    if cb.shape[0] == 0:
        return np.zeros(0)
    return np.asarray(model.body_mass)[cb]


# static-load gain floor (ground_point_gains): target penetration at
# static tree weight, and the gravity it is defined against
_LOAD_DELTA = 0.005   # [m]
_LOAD_G = 9.81        # [m/s^2]


def point_share_masses(model: Model) -> np.ndarray:
    """(ncp,) per-point SHARE of its kinematic tree's total mass:
    m_share = 2 * M_tree / n_points_tree for trees with a FREE root
    (assume half the points bear the weight), 0 for fixed-base trees
    (Franka, mounted hands — they hang from the world, not the ground).

    Why: per-effective-mass stability gains are right for light free
    bodies (a cube corner) but orders of magnitude below what statics
    demands for a heavy drive-held articulation: an Anymal foot's
    lever-discounted m_eff (~0.08 kg) gave kn ~ 770 N/m — a 16 cm
    equilibrium penetration under the 125 N static foot load, i.e. the
    robot sank through the floor (free-fall until the 0.51 m fall
    termination). The free-body m_eff analysis is over-conservative
    there anyway: the foot's rotation is held by the knee DRIVE
    (Kp ~ 400 Nm/rad), so the articulated effective mass is far larger
    (round 1 ran Anymal feet at omega*dt ~ 2.5 by the free-body metric,
    stably, for 800 epochs). Ground-contact gains are floored with this
    share mass (ground_point_gains); light objects get a negligible
    floor, so the hand-manipulation regime tuned at omega_dt=0.5 is
    untouched."""
    cb = np.asarray(model.cp_body)
    if cb.shape[0] == 0:
        return np.zeros(0)
    parents = np.asarray(model.parents)
    nb = parents.shape[0]
    # single forward pass resolves each body's kinematic-tree root ONLY if
    # parents are topologically ordered (parent index < child); the model
    # builder guarantees this — enforce it so a violation can never silently
    # mis-assign the static-load floor
    assert all(int(p) < i for i, p in enumerate(parents) if p >= 0), \
        "ModelBuilder must emit bodies in topological order"
    tree = np.arange(nb)
    for i in range(nb):
        if parents[i] >= 0:
            tree[i] = tree[parents[i]]
    masses = np.asarray(model.body_mass)
    jtype = np.asarray(model.jtype)
    share = np.zeros(cb.shape[0])
    for r in model.roots:
        if JointType(jtype[r]) != JointType.FREE:
            continue
        in_tree = tree == r
        pts = np.flatnonzero(in_tree[cb])
        if pts.size == 0:
            continue
        share[pts] = 2.0 * float(masses[in_tree].sum()) / pts.size
    return share


def ground_point_gains(model: Model, params: "ContactParams"):
    """Build-time (numpy) per-point (kn, kt, fn_max) for GROUND contacts
    under per-mass params:
      kn  = max(kn_pm * m_eff,  m_share * g / delta)   stability vs statics
      kt  = kt_pm * max(m_eff, m_share)                stiction holds weight
      fnm = fnm_pm * max(m_body, m_share)              mdv cap, body-level
    """
    meff = point_effective_masses(model)
    mb = point_body_masses(model)
    msh = point_share_masses(model)
    kn = np.maximum(params.kn_pm * meff, msh * (_LOAD_G / _LOAD_DELTA))
    kt = params.kt_pm * np.maximum(meff, msh)
    fnm = params.fnm_pm * np.maximum(mb, msh)
    return kn, kt, fnm


def point_effective_masses(model: Model) -> np.ndarray:
    """(ncp,) effective mass per ground contact point (numpy, build-time)."""
    cb = np.asarray(model.cp_body)
    if cb.shape[0] == 0:
        return np.zeros(0)
    m = np.asarray(model.body_mass)[cb]
    com = np.asarray(model.body_com)[cb]
    I = np.asarray(model.body_inertia)[cb]
    I_min = np.min(np.stack([I[:, 0, 0], I[:, 1, 1], I[:, 2, 2]], 1), axis=1)
    r2 = np.sum((np.asarray(model.cp_pos) - com) ** 2, axis=1)
    return _eff_mass(m, I_min, r2)


def surface_effective_mass(model: Model, si: int) -> float:
    """Conservative effective mass of a receiver surface's body: lever =
    the surface's farthest point from the CoM."""
    sb = model.surf_body[si]
    stype = SurfaceType(model.surf_type[si])
    prm = np.asarray(model.surf_params[si])
    com = np.asarray(model.body_com)[sb]
    if stype == SurfaceType.SPHERE:
        r_max = np.linalg.norm(prm[0:3] - com) + prm[3]
    elif stype == SurfaceType.CAPSULE:
        r_max = max(
            np.linalg.norm(prm[0:3] - com), np.linalg.norm(prm[3:6] - com)
        ) + prm[6]
    else:  # BOX
        r_max = np.linalg.norm(prm[0:3] - com) + np.linalg.norm(prm[3:6])
    m = float(np.asarray(model.body_mass)[sb])
    I = np.asarray(model.body_inertia)[sb]
    I_min = float(min(I[0, 0], I[1, 1], I[2, 2]))
    return float(_eff_mass(np.asarray(m), np.asarray(I_min),
                           np.asarray(r_max ** 2)))


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
    mu_scale: Optional[jax.Array] = None,
    geom_scale: Optional[jax.Array] = None,
    plane_fn: Optional[Callable] = None,
) -> ContactResult:
    """Contact forces against the ground plane z=0, a heightfield given by
    height_fn(x, y) -> (h, normal), or general per-point contact planes
    given by plane_fn(pt, radius) -> (n, d) with penetration
    radius - (n.pt - d) (supports vertical stair risers; takes precedence
    over height_fn).

    mu_scale: optional (nb,) per-body friction multiplier (DR
    material_properties overlay); geom_scale: optional (nb,) per-body
    collision geometry scale (DR on_startup `scale` overlay)."""
    nb = model.nb
    if model.cp_body.shape[0] == 0:
        zeros = jnp.zeros((nb, 3))
        return ContactResult(jnp.zeros((nb, 6)), zeros, zeros)

    cb = model.cp_body  # (ncp,)
    cp_pos, cp_radius = model.cp_pos, model.cp_radius
    if geom_scale is not None:
        gs = geom_scale[cb]
        cp_pos = cp_pos * gs[:, None]
        cp_radius = cp_radius * gs
    # world contact point positions
    pt = body_pos[cb] + jnp.einsum("cij,cj->ci", body_rot[cb], cp_pos)
    if plane_fn is not None:
        n, d = plane_fn(pt, cp_radius)
        pen = cp_radius - (jnp.sum(pt * n, axis=-1) - d)
    elif height_fn is not None:
        # normal (not vertical) distance to the plane through (x, y, h):
        # matches the fused kernel's general-plane penetration exactly
        h, n = height_fn(pt[..., 0], pt[..., 1])
        pen = cp_radius - (pt[..., 2] - h) * n[..., 2]
    else:
        n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), pt.shape)
        pen = cp_radius - pt[..., 2]
    active = pen > 0.0

    # contact point velocity
    v_pt = body_lvel[cb] + jnp.cross(body_avel[cb], pt - body_pos[cb])
    vn = jnp.sum(v_pt * n, axis=-1)
    vt = v_pt - vn[..., None] * n

    if params.per_mass:
        # per-point gains with the static-load floor (ground_point_gains)
        kn_np, kt_np, fnm_np = ground_point_gains(model, params)
        kn = jnp.asarray(kn_np, jnp.float32)
        kt = jnp.asarray(kt_np, jnp.float32)
        fnm = jnp.asarray(fnm_np, jnp.float32)
    else:
        kn, kt, fnm = params.kn, params.kt, params.fn_max
    # Hunt-Crossley: damping scaled by penetration (no touch spike)
    fn = jnp.where(
        active,
        kn * jnp.maximum(pen, 0.0)
        * jnp.clip(1.0 - params.kd * vn, 0.0, 5.0),
        0.0,
    )
    fn = jnp.minimum(fn, fnm)
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    mu = params.mu * model.cp_friction
    if mu_scale is not None:
        mu = mu * mu_scale[cb]
    ft_mag = jnp.minimum(mu * fn, kt * vt_norm)
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

    meff_pt = point_effective_masses(model)

    def pack(pairs, nparams):
        if not pairs:
            return dict(
                pt=np.zeros(0, np.int32), sbody=np.zeros(0, np.int32),
                params=np.zeros((0, nparams)), mmin=np.zeros(0),
                mbody=np.zeros(0),
            )
        pt = np.array([p for p, _ in pairs], np.int32)
        sbody = np.array([model.surf_body[s] for _, s in pairs], np.int32)
        params = np.array([model.surf_params[s] for _, s in pairs])
        # effective contact mass per pair: the lighter effective mass of
        # the point and the surface body (per-mass gains)
        mmin = np.minimum(
            meff_pt[pt],
            np.array([surface_effective_mass(model, s) for _, s in pairs]),
        )
        # full mass of the lighter body (mdv force cap, PhysX body-level
        # velocity semantics — see point_body_masses)
        bm = np.asarray(model.body_mass)
        mbody = np.minimum(bm[np.asarray(model.cp_body)[pt]], bm[sbody])
        return dict(pt=pt, sbody=sbody, params=params, mmin=mmin,
                    mbody=mbody)

    return PairGroups(
        sphere=pack(groups[SurfaceType.SPHERE], 4),
        capsule=pack(groups[SurfaceType.CAPSULE], 7),
        box=pack(groups[SurfaceType.BOX], 10),
    )


def _contact_force(pen, n, vrel, mu, params: ContactParams, mmin=None,
                   mbody=None):
    """Compliant normal (Hunt-Crossley damped) + stiction-capped friction.
    Returns world-frame force on the POINT body. mmin: per-row effective
    contact mass for per-mass gains (auto_contact_params); mbody: per-row
    full mass of the lighter body (mdv force cap)."""
    if params.per_mass and mmin is not None:
        kn, kt = params.kn_pm * mmin, params.kt_pm * mmin
        fnm = params.fnm_pm * (mbody if mbody is not None else mmin)
    else:
        kn, kt, fnm = params.kn, params.kt, params.fn_max
    active = pen > 0.0
    vn = jnp.sum(vrel * n, axis=-1)
    vt = vrel - vn[..., None] * n
    fn = jnp.where(
        active,
        kn * jnp.maximum(pen, 0.0)
        * jnp.clip(1.0 - params.kd * vn, 0.0, 5.0),
        0.0,
    )
    fn = jnp.minimum(fn, fnm)
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    ft_mag = jnp.minimum(mu * fn, kt * vt_norm)
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
    mu_scale: Optional[jax.Array] = None,
    geom_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Cross-tree point-vs-surface contact wrenches -> (nb, 6) [torque;
    force] per body in world coordinates. Static shapes: the candidate pair
    list is compiled into the model. mu_scale/geom_scale: optional (nb,)
    per-body DR multipliers (see plane_contacts)."""
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
        lp = model.cp_pos[pi]
        if geom_scale is not None:
            lp = lp * geom_scale[cb][:, None]
        return cb, body_pos[cb] + jnp.einsum(
            "cij,cj->ci", body_rot[cb], lp
        )

    def point_radius(pi, pb):
        r = model.cp_radius[pi]
        return r if geom_scale is None else r * geom_scale[pb]

    def surf_scale(sb):
        return 1.0 if geom_scale is None else geom_scale[sb]

    def pair_mu(pi, pb):
        mu = params.mu * model.cp_friction[pi]
        return mu if mu_scale is None else mu * mu_scale[pb]

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
        ss = surf_scale(sb)
        c_w = body_pos[sb] + jnp.einsum(
            "cij,cj->ci", body_rot[sb],
            prm[:, 0:3] if geom_scale is None else prm[:, 0:3] * ss[:, None],
        )
        d = pt_w - c_w
        dist = jnp.linalg.norm(d, axis=-1)
        n = d / (dist[..., None] + 1e-9)
        pen = prm[:, 3] * ss + point_radius(pi, pb) - dist
        vrel = vel_at(pb, pt_w) - vel_at(sb, pt_w)
        f = _contact_force(pen, n, vrel, pair_mu(pi, pb), params,
                           jnp.asarray(g["mmin"], jnp.float32),
                           jnp.asarray(g["mbody"], jnp.float32))
        f_ext = accumulate(f_ext, pb, sb, pt_w, f)

    # ---- capsule surfaces ----
    g = groups.capsule
    if g["pt"].shape[0]:
        pi = jnp.asarray(g["pt"])
        sb = jnp.asarray(g["sbody"])
        prm = jnp.asarray(g["params"], jnp.float32)
        pb, pt_w = point_world(pi)
        ss = surf_scale(sb)
        e0, e1 = prm[:, 0:3], prm[:, 3:6]
        if geom_scale is not None:
            e0, e1 = e0 * ss[:, None], e1 * ss[:, None]
        p0 = body_pos[sb] + jnp.einsum("cij,cj->ci", body_rot[sb], e0)
        p1 = body_pos[sb] + jnp.einsum("cij,cj->ci", body_rot[sb], e1)
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
        pen = prm[:, 6] * ss + point_radius(pi, pb) - dist
        vrel = vel_at(pb, pt_w) - vel_at(sb, c_w)
        f = _contact_force(pen, n, vrel, pair_mu(pi, pb), params,
                           jnp.asarray(g["mmin"], jnp.float32),
                           jnp.asarray(g["mbody"], jnp.float32))
        f_ext = accumulate(f_ext, pb, sb, pt_w, f)

    # ---- box surfaces ----
    g = groups.box
    if g["pt"].shape[0]:
        pi = jnp.asarray(g["pt"])
        sb = jnp.asarray(g["sbody"])
        prm = jnp.asarray(g["params"], jnp.float32)
        pb, pt_w = point_world(pi)
        ss = surf_scale(sb)
        center, half, bq = prm[:, 0:3], prm[:, 3:6], prm[:, 6:10]
        if geom_scale is not None:
            center, half = center * ss[:, None], half * ss[:, None]
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
        r_pt = point_radius(pi, pb)
        pen = jnp.where(outside, r_pt - dist_out, r_pt - pen_in)
        n = jnp.einsum("cij,cj->ci", R_box, n_l)
        vrel = vel_at(pb, pt_w) - vel_at(sb, pt_w)
        f = _contact_force(pen, n, vrel, pair_mu(pi, pb), params,
                           jnp.asarray(g["mmin"], jnp.float32),
                           jnp.asarray(g["mbody"], jnp.float32))
        f_ext = accumulate(f_ext, pb, sb, pt_w, f)

    return f_ext
