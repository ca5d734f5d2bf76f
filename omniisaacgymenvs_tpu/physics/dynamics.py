"""Forward kinematics and Featherstone articulated-body dynamics (ABA),
level-batched for TPU.

TPU-first formulation: all per-body math is batched ACROSS bodies (one set
of ops regardless of body count); only the tree recursions (velocity/pose
propagation, articulated-inertia accumulation, acceleration propagation)
are sequential, and they run per DEPTH LEVEL (humanoid: 7 levels for 31
bodies) with each level's bodies batched and parent accumulation done with
scatter-add. This keeps the traced XLA graph small (fast compiles through
the remote TPU compiler) and turns the work into wide batched (nb, 6, 6)
ops that vmap over the env axis onto the VPU lanes.

Single-env functions over unbatched (q, qd); the env batch is applied by
vmap at the engine layer. Supports FORESTS of articulations (multiple roots
per scene — tray+ball, hand+object; see model.py) and replaces the
reference's external PhysX 5 GPU reduced-coordinate articulation solver
(SURVEY.md §2.3): same generalized-coordinate semantics (breadth-first tree
order, wxyz quaternions, per-dof armature/damping, PD drives, gyroscopic
forces).
"""

from __future__ import annotations

import weakref
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.physics import spatial
from omniisaacgymenvs_tpu.physics.model import JointType, Model


class Kinematics(NamedTuple):
    """Stacked per-body kinematic cache."""

    E: jax.Array    # (nb,3,3) rotation parent coords -> body coords
    r: jax.Array    # (nb,3)   body origin in parent coords
    v: jax.Array    # (nb,6)   spatial velocity in body coords [omega; vlin]
    Rw: jax.Array   # (nb,3,3) world rotation (x_world = Rw @ x_body)
    pw: jax.Array   # (nb,3)   world position of body origin
    S: jax.Array    # (nb,6)   motion subspace (zeros for roots)
    vJ: jax.Array   # (nb,6)   joint velocity S*qd (zeros for roots)


class _Tree(NamedTuple):
    """Static per-model index arrays (numpy, trace-time constants)."""

    jb: np.ndarray            # (njd,) body index per joint, joint order
    is_rev: np.ndarray        # (njd,) 1.0 for revolute, 0.0 prismatic
    lvl_b: tuple              # per level: np body indices
    lvl_p: tuple              # per level: np parent body indices
    lvl_jd: tuple             # per level: np joint indices


_TREE_CACHE: dict = {}


def _tree(model: Model) -> _Tree:
    # keyed by id() with a GC finalizer evicting dead entries — a plain
    # id() key can be REUSED by a new Model after the old one is collected,
    # silently returning the wrong tree
    key = id(model)
    t = _TREE_CACHE.get(key)
    if t is None:
        jb = np.array(
            [i for i in range(model.nb) if model.parents[i] != -1], np.int32
        )
        is_rev = np.array(
            [1.0 if model.jtype[i] == JointType.REVOLUTE else 0.0 for i in jb],
            np.float32,
        )
        lvl_b, lvl_p, lvl_jd = [], [], []
        for lvl in model.levels:
            b = np.asarray(lvl, np.int32)
            lvl_b.append(b)
            lvl_p.append(np.array([model.parents[i] for i in lvl], np.int32))
            lvl_jd.append(np.array([model.jdof[i] for i in lvl], np.int32))
        t = _Tree(jb, is_rev, tuple(lvl_b), tuple(lvl_p), tuple(lvl_jd))
        _TREE_CACHE[key] = t
        weakref.finalize(model, _TREE_CACHE.pop, key, None)
    return t


def _solve_spd6(A, b):
    """Unrolled Cholesky solve for a 6x6 SPD system (the floating-base
    articulated inertia). Replaces jnp.linalg.solve, whose batched LU
    lowering is pathological on TPU — this is ~100 scalar VPU ops that
    vectorize cleanly over the env axis."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            sacc = A[..., i, j]
            for k in range(j):
                sacc = sacc - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(sacc, 1e-12))
            else:
                L[i][j] = sacc / L[j][j]
    y = [None] * 6
    for i in range(6):
        sacc = b[..., i]
        for k in range(i):
            sacc = sacc - L[i][k] * y[k]
        y[i] = sacc / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        sacc = y[i]
        for k in range(i + 1, 6):
            sacc = sacc - L[k][i] * x[k]
        x[i] = sacc / L[i][i]
    return jnp.stack(x, axis=-1)


def kinematics(model: Model, q: jax.Array, qd: jax.Array) -> Kinematics:
    """Forward pass: local transforms, body-frame velocities, world poses."""
    nb = model.nb
    tr = _tree(model)

    # ---- all 1-dof joints batched ----
    qj = q[model.jq_idx]
    qjd = qd[model.jv_idx]
    axis = model.joint_axis[tr.jb]
    Et = model.joint_Et[tr.jb]
    rt = model.joint_pos[tr.jb]
    is_rev = jnp.asarray(tr.is_rev)

    ang = qj * is_rev
    Rj = rot.quat_to_rotmat(rot.quat_from_angle_axis(ang, axis))
    Ej = jnp.swapaxes(Rj, -1, -2) @ Et
    slide = (axis * (qj * (1.0 - is_rev))[:, None])
    rj = rt + jnp.einsum("kji,kj->ki", Et, slide)
    S = jnp.concatenate(
        [axis * is_rev[:, None], axis * (1.0 - is_rev)[:, None]], axis=-1
    )
    vJ = S * qjd[:, None]

    E = jnp.zeros((nb, 3, 3)).at[tr.jb].set(Ej)
    r = jnp.zeros((nb, 3)).at[tr.jb].set(rj)
    S_all = jnp.zeros((nb, 6)).at[tr.jb].set(S)
    vJ_all = jnp.zeros((nb, 6)).at[tr.jb].set(vJ)

    v = jnp.zeros((nb, 6))
    Rw = jnp.zeros((nb, 3, 3))
    pw = jnp.zeros((nb, 3))

    # ---- roots (few; python loop) ----
    for i in model.roots:
        qa, va = model.q_adr[i], model.v_adr[i]
        if model.jtype[i] == JointType.FREE:
            quat = q[qa + 3 : qa + 7]
            Rwi = rot.quat_to_rotmat(quat)
            Ei = jnp.swapaxes(Rwi, -1, -2)
            ri = q[qa : qa + 3]
            v = v.at[i].set(qd[va : va + 6])
        else:
            Ei = model.joint_Et[i]
            ri = model.joint_pos[i]
            Rwi = jnp.swapaxes(Ei, -1, -2)
        E = E.at[i].set(Ei)
        r = r.at[i].set(ri)
        Rw = Rw.at[i].set(Rwi)
        pw = pw.at[i].set(ri)

    # ---- propagate by level ----
    for b, p in zip(tr.lvl_b, tr.lvl_p):
        vb = spatial.transform_motion(E[b], r[b], v[p]) + vJ_all[b]
        Rwb = Rw[p] @ jnp.swapaxes(E[b], -1, -2)
        pwb = pw[p] + jnp.einsum("kij,kj->ki", Rw[p], r[b])
        v = v.at[b].set(vb)
        Rw = Rw.at[b].set(Rwb)
        pw = pw.at[b].set(pwb)

    return Kinematics(E, r, v, Rw, pw, S_all, vJ_all)


def world_velocities(model: Model, kin: Kinematics):
    """World-frame (angular, linear) velocity of each body origin."""
    avel = jnp.einsum("kij,kj->ki", kin.Rw, kin.v[:, 0:3])
    lvel = jnp.einsum("kij,kj->ki", kin.Rw, kin.v[:, 3:6])
    return avel, lvel


def aba(
    model: Model,
    q: jax.Array,
    qd: jax.Array,
    tau_joint: jax.Array,
    f_ext_world: jax.Array,
    kin: Kinematics,
    gravity: jax.Array,
    h: float = 0.0,
    mass_scale=None,
    tendon_stiffness_scale=None,
    tendon_damping_scale=None,
) -> jax.Array:
    """Articulated-body algorithm -> qdd (nv,).

    tau_joint: (njd,) total active torque per joint dof.
    f_ext_world: (nb, 6) external wrench [torque; force] about each body
    origin, world coordinates (contacts + applied forces).
    h: integrator substep — adds h*(drive + passive damping) to the joint
    diagonal (implicit damping / Stable-PD; see drive_torques).
    """
    nb = model.nb
    tr = _tree(model)
    d_implicit = h * (
        model.dof_drive_damping + model.dof_damping
        + h * model.dof_stiffness
    )
    if model.nt:
        # fixed-tendon implicit diagonal: h*(c + h*(k + k_lim))*coef^2 per
        # coupled dof — the diagonal part of the exact implicit tendon
        # Jacobian (off-diagonal coupling dropped; errs on the damped side)
        tk = model.tendon_stiffness + model.tendon_limit_stiffness
        tc = model.tendon_damping
        if tendon_stiffness_scale is not None:
            tk = tk * tendon_stiffness_scale
        if tendon_damping_scale is not None:
            tc = tc * tendon_damping_scale
        per_t = h * (tc + h * tk)                          # (nt,)
        contrib = per_t[:, None] * model.tendon_coef**2    # (nt, 2)
        d_implicit = d_implicit.at[model.tendon_dof.reshape(-1)].add(
            contrib.reshape(-1)
        )

    # ---- batched articulated quantities ----
    IA = spatial.spatial_inertia(
        model.body_mass, model.body_com, model.body_inertia
    )  # (nb,6,6)
    if mass_scale is not None:
        # mass-proportional DR scaling (inertia scales with mass)
        IA = IA * mass_scale[:, None, None]
    v = kin.v
    pA = spatial.cross_force(v, jnp.einsum("kij,kj->ki", IA, v))
    ERw = jnp.swapaxes(kin.Rw, -1, -2)
    f_b = jnp.concatenate(
        [
            jnp.einsum("kij,kj->ki", ERw, f_ext_world[:, 0:3]),
            jnp.einsum("kij,kj->ki", ERw, f_ext_world[:, 3:6]),
        ],
        axis=-1,
    )
    pA = pA - f_b
    c = jnp.zeros((nb, 6)).at[tr.jb].set(
        spatial.cross_motion(v[tr.jb], kin.vJ[tr.jb])
    )
    X = spatial.motion_transform(kin.E, kin.r)  # (nb,6,6)

    U_all = jnp.zeros((nb, 6))
    D_all = jnp.ones((nb,))
    u_all = jnp.zeros((nb,))

    # ---- pass 2: inward by level (deepest first) ----
    for b, p, jd in zip(tr.lvl_b[::-1], tr.lvl_p[::-1], tr.lvl_jd[::-1]):
        Sb = kin.S[b]
        U = jnp.einsum("kij,kj->ki", IA[b], Sb)
        D = jnp.sum(Sb * U, axis=-1) + model.dof_armature[jd] + d_implicit[jd]
        uu = tau_joint[jd] - jnp.sum(Sb * pA[b], axis=-1)
        Ia = IA[b] - U[:, :, None] * U[:, None, :] / D[:, None, None]
        pa = (
            pA[b]
            + jnp.einsum("kij,kj->ki", Ia, c[b])
            + U * (uu / D)[:, None]
        )
        Xb = X[b]
        XbT = jnp.swapaxes(Xb, -1, -2)
        IA = IA.at[p].add(XbT @ Ia @ Xb)
        pA = pA.at[p].add(jnp.einsum("kij,kj->ki", XbT, pa))
        U_all = U_all.at[b].set(U)
        D_all = D_all.at[b].set(D)
        u_all = u_all.at[b].set(uu)

    # ---- pass 3: outward accelerations ----
    a_world = jnp.concatenate([jnp.zeros(3), -gravity])
    a = jnp.zeros((nb, 6))
    qdd = jnp.zeros_like(qd)
    for i in model.roots:
        a0p = spatial.transform_motion(kin.E[i], kin.r[i], a_world)
        if model.jtype[i] == JointType.FREE:
            va = model.v_adr[i]
            qdd_root = _solve_spd6(IA[i], -(pA[i] + IA[i] @ a0p))
            qdd = qdd.at[va : va + 6].set(qdd_root)
            a = a.at[i].set(a0p + qdd_root)
        else:
            a = a.at[i].set(a0p)
    jv = jnp.asarray(model.jv_idx)
    for b, p, jd in zip(tr.lvl_b, tr.lvl_p, tr.lvl_jd):
        a_p = spatial.transform_motion(kin.E[b], kin.r[b], a[p]) + c[b]
        qdd_j = (u_all[b] - jnp.sum(U_all[b] * a_p, axis=-1)) / D_all[b]
        qdd = qdd.at[jv[jd]].set(qdd_j)
        a = a.at[b].set(a_p + kin.S[b] * qdd_j[:, None])
    return qdd


def integrate(model: Model, q: jax.Array, qd: jax.Array, qdd: jax.Array, dt,
              limit_lower=None, limit_upper=None):
    """Semi-implicit Euler with joint velocity clamp and hard limit
    projection (PhysX-style maxJointVelocity + limit constraints,
    reference robots/articulations/franka.py:86). limit_lower/upper
    override the model's dof limits (DR lower/upper_dof_limits overlays)."""
    lim_lo = model.dof_limit_lower if limit_lower is None else limit_lower
    lim_hi = model.dof_limit_upper if limit_upper is None else limit_upper
    qd_new = qd + dt * qdd
    qj_d = jnp.clip(
        qd_new[model.jv_idx], -model.dof_max_velocity, model.dof_max_velocity
    )
    qj = q[model.jq_idx] + dt * qj_d

    # hard limit projection: clamp q, zero outward velocity
    hit_lb = qj < lim_lo
    hit_ub = qj > lim_hi
    qj = jnp.clip(qj, lim_lo, lim_hi)
    qj_d = jnp.where(hit_ub, jnp.minimum(qj_d, 0.0), qj_d)
    qj_d = jnp.where(hit_lb, jnp.maximum(qj_d, 0.0), qj_d)

    q_new = q.at[model.jq_idx].set(qj)
    qd_new = qd_new.at[model.jv_idx].set(qj_d)

    for i in model.roots:
        if model.jtype[i] != JointType.FREE:
            continue
        qa, va = model.q_adr[i], model.v_adr[i]
        # PhysX-style rigid body velocity caps (default maxAngularVelocity
        # 64 rad/s); bounds runaway states so RL exploits terminate cleanly
        omega_b = jnp.clip(qd_new[va : va + 3], -64.0, 64.0)
        vel_b = jnp.clip(qd_new[va + 3 : va + 6], -1000.0, 1000.0)
        quat = q[qa + 3 : qa + 7]
        Rw = rot.quat_to_rotmat(quat)
        pos = q[qa : qa + 3] + dt * (Rw @ vel_b)
        quat = rot.quat_normalize(rot.quat_integrate_body(quat, omega_b, dt))
        q_new = q_new.at[qa : qa + 3].set(pos)
        q_new = q_new.at[qa + 3 : qa + 7].set(quat)
        qd_new = qd_new.at[va : va + 3].set(omega_b)
        qd_new = qd_new.at[va + 3 : va + 6].set(vel_b)
    return q_new, qd_new


def drive_torques(model: Model, q: jax.Array, qd: jax.Array, control,
                  h: float = 0.0, stiffness_scale=None,
                  damping_scale=None, tendon_stiffness_scale=None,
                  tendon_damping_scale=None) -> jax.Array:
    """Total active joint torque: PD drive (clamped) + direct effort +
    passive damping/friction. Matches the PhysX implicit joint drive law
    (stiffness*(target-q) + damping*(vtarget-qd), clamped to max_force;
    reference tasks/utils/usd_utils.py:71-82) via the Stable-PD
    discretization: the spring is evaluated at the velocity-predicted
    position q + h*qd and the damping terms are made implicit by the
    matching h*Kd addition to the ABA diagonal (see aba())."""
    qj = q[model.jq_idx]
    qjd = qd[model.jv_idx]
    kp = model.dof_stiffness
    kd = model.dof_drive_damping
    if stiffness_scale is not None:
        kp = kp * stiffness_scale
    if damping_scale is not None:
        kd = kd * damping_scale
    drive = (
        kp * (control.pos_target - qj - h * qjd)
        + kd * (control.vel_target - qjd)
    )
    drive = jnp.clip(drive, -model.dof_max_effort, model.dof_max_effort)
    passive = -model.dof_damping * qjd - model.dof_friction * jnp.tanh(qjd * 10.0)
    tau = drive + control.effort + passive
    if model.nt:
        # fixed tendons (PhysX fixed-tendon semantics; reference
        # views/shadow_hand_view.py:71-73): Stable-PD style — length
        # evaluated at the velocity-predicted position, damping made
        # implicit via the matching diagonal addition in aba()
        td = model.tendon_dof                      # (nt, 2)
        co = model.tendon_coef                     # (nt, 2)
        L = jnp.sum(co * (qj + h * qjd)[td], axis=-1)
        Ldot = jnp.sum(co * qjd[td], axis=-1)
        tk = model.tendon_stiffness
        klim = model.tendon_limit_stiffness
        tc = model.tendon_damping
        if tendon_stiffness_scale is not None:
            tk = tk * tendon_stiffness_scale
            klim = klim * tendon_stiffness_scale
        if tendon_damping_scale is not None:
            tc = tc * tendon_damping_scale
        excess = L - jnp.clip(
            L, model.tendon_limit_lower, model.tendon_limit_upper
        )
        F = klim * excess + tk * (L - model.tendon_rest) + tc * Ldot
        tau = tau.at[td.reshape(-1)].add((-co * F[:, None]).reshape(-1))
    return tau
