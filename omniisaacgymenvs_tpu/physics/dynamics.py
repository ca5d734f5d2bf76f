"""Forward kinematics and Featherstone articulated-body dynamics (ABA).

Single-env functions over unbatched (q, qd); the env batch is applied by vmap
at the engine layer so every small (3,3)/(6,6) op becomes a (N, ...) batched
op that XLA vectorizes across the TPU VPU lanes. The body loop is a static
Python unroll (nb <= ~30), which is the XLA-friendly formulation — no dynamic
control flow, one fused trace.

Replaces the reference's external PhysX 5 GPU reduced-coordinate articulation
solver (SURVEY.md §2.3): same generalized-coordinate semantics (breadth-first
tree order, wxyz quaternions, per-dof armature/damping, PD drives, gyroscopic
forces per `enable_gyroscopic_forces`)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.physics import spatial
from omniisaacgymenvs_tpu.physics.model import JointType, Model


class Kinematics(NamedTuple):
    """Per-body kinematic cache (lists of per-body arrays, length nb)."""

    E: list    # (3,3) rotation parent coords -> body coords
    r: list    # (3,)  body origin in parent coords
    v: list    # (6,)  spatial velocity in body coords [omega; vlin]
    Rw: list   # (3,3) world rotation (x_world = Rw @ x_body)
    pw: list   # (3,)  world position of body origin
    S: list    # motion subspace: (6,) for 1-dof joints, None for root


def joint_transform(model: Model, i: int, q: jax.Array):
    """Local transform (E, r) parent->body for body i and its S axis."""
    jt = model.jtype[i]
    if jt == JointType.FREE:
        quat = q[3:7]
        E = jnp.swapaxes(rot.quat_to_rotmat(quat), -1, -2)
        r = q[0:3]
        return E, r, None
    if jt == JointType.FIXED:
        return model.joint_Et[i], model.joint_pos[i], None
    qi = q[model.jq0 + i - 1]
    axis = model.joint_axis[i]
    Et, rt = model.joint_Et[i], model.joint_pos[i]
    if jt == JointType.REVOLUTE:
        EJ = jnp.swapaxes(
            rot.quat_to_rotmat(rot.quat_from_angle_axis(qi, axis)), -1, -2
        )
        E = EJ @ Et
        r = rt
        S = jnp.concatenate([axis, jnp.zeros(3)])
    else:  # PRISMATIC
        E = Et
        r = rt + jnp.swapaxes(Et, -1, -2) @ (qi * axis)
        S = jnp.concatenate([jnp.zeros(3), axis])
    return E, r, S


def kinematics(model: Model, q: jax.Array, qd: jax.Array) -> Kinematics:
    """Forward pass: local transforms, body-frame velocities, world poses."""
    E, r, v, Rw, pw, S = [], [], [], [], [], []
    for i in range(model.nb):
        Ei, ri, Si = joint_transform(model, i, q)
        jt = model.jtype[i]
        if i == 0:
            if jt == JointType.FREE:
                vi = qd[0:6]
            else:
                vi = jnp.zeros(6)
            Rwi = jnp.swapaxes(Ei, -1, -2)
            pwi = ri
        else:
            p = model.parents[i]
            vJ = Si * qd[model.jd0 + i - 1]
            vi = spatial.transform_motion(Ei, ri, v[p]) + vJ
            Rwi = Rw[p] @ jnp.swapaxes(Ei, -1, -2)
            pwi = pw[p] + Rw[p] @ ri
        E.append(Ei)
        r.append(ri)
        v.append(vi)
        Rw.append(Rwi)
        pw.append(pwi)
        S.append(Si)
    return Kinematics(E, r, v, Rw, pw, S)


def world_velocities(model: Model, kin: Kinematics):
    """World-frame (angular, linear) velocity of each body origin."""
    avel, lvel = [], []
    for i in range(model.nb):
        w_b = kin.v[i][0:3]
        v_b = kin.v[i][3:6]
        avel.append(kin.Rw[i] @ w_b)
        lvel.append(kin.Rw[i] @ v_b)
    return jnp.stack(avel), jnp.stack(lvel)


def aba(
    model: Model,
    q: jax.Array,
    qd: jax.Array,
    tau_joint: jax.Array,
    f_ext_world: jax.Array,
    kin: Kinematics,
    gravity: jax.Array,
    h: float = 0.0,
) -> jax.Array:
    """Articulated-body algorithm -> qdd (nv,).

    tau_joint: (njd,) total active torque per joint dof.
    f_ext_world: (nb, 6) external wrench [torque; force] about each body
    origin, world coordinates (contacts + applied forces).
    gravity: (3,) world gravity vector.
    h: integrator substep — adds h*(drive damping + passive damping) to the
    joint-space diagonal, making damping implicit (Stable-PD; uncondition-
    ally stable at the PhysX-scale gains the reference tasks author, e.g.
    Kp=400/Kd=40 for ANYmal, reference tasks/anymal.py set_drive call).
    """
    nb = model.nb
    jd0 = model.jd0
    d_implicit = h * (model.dof_drive_damping + model.dof_damping)

    # -------- pass 1 state + initial articulated quantities --------
    IA = []
    pA = []
    c = []
    for i in range(nb):
        Ib = spatial.spatial_inertia(
            model.body_mass[i], model.body_com[i], model.body_inertia[i]
        )
        vi = kin.v[i]
        # gyroscopic / Coriolis bias force v x* (I v)
        pAi = spatial.cross_force(vi, Ib @ vi)
        # external wrench: world -> body coords (E = Rw^T, applied at origin)
        ERw = jnp.swapaxes(kin.Rw[i], -1, -2)
        n_b = ERw @ f_ext_world[i, 0:3]
        f_b = ERw @ f_ext_world[i, 3:6]
        pAi = pAi - jnp.concatenate([n_b, f_b])
        IA.append(Ib)
        pA.append(pAi)
        if i == 0 or model.jtype[i] == JointType.FIXED:
            ci = jnp.zeros(6)
        else:
            vJ = kin.S[i] * qd[jd0 + i - 1]
            ci = spatial.cross_motion(kin.v[i], vJ)
        c.append(ci)

    # -------- pass 2: inward articulated inertia propagation --------
    U = [None] * nb
    D = [None] * nb
    u = [None] * nb
    for i in range(nb - 1, 0, -1):
        p = model.parents[i]
        Si = kin.S[i]
        Ui = IA[i] @ Si
        Di = Si @ Ui + model.dof_armature[i - 1] + d_implicit[i - 1]
        ui = tau_joint[i - 1] - Si @ pA[i]
        Ia = IA[i] - jnp.outer(Ui, Ui) / Di
        pa = pA[i] + Ia @ c[i] + Ui * (ui / Di)
        X = spatial.motion_transform(kin.E[i], kin.r[i])
        IA[p] = IA[p] + X.T @ Ia @ X
        pA[p] = pA[p] + X.T @ pa
        U[i], D[i], u[i] = Ui, Di, ui

    # -------- pass 3: outward accelerations --------
    a_world = jnp.concatenate([jnp.zeros(3), -gravity])
    qdd = jnp.zeros_like(qd)
    a = [None] * nb
    a0p = spatial.transform_motion(kin.E[0], kin.r[0], a_world)
    if model.root_free:
        # root joint: S = I6, U = IA0, D = IA0, u = -pA0
        qdd_root = jnp.linalg.solve(IA[0], -(pA[0] + IA[0] @ a0p))
        qdd = qdd.at[0:6].set(qdd_root)
        a[0] = a0p + qdd_root
    else:
        a[0] = a0p
    for i in range(1, nb):
        p = model.parents[i]
        a_p = spatial.transform_motion(kin.E[i], kin.r[i], a[p]) + c[i]
        qdd_i = (u[i] - U[i] @ a_p) / D[i]
        qdd = qdd.at[jd0 + i - 1].set(qdd_i)
        a[i] = a_p + kin.S[i] * qdd_i
    return qdd


def integrate(model: Model, q: jax.Array, qd: jax.Array, qdd: jax.Array, dt):
    """Semi-implicit Euler with joint velocity clamp and hard limit
    projection (PhysX-style maxJointVelocity + limit constraints,
    reference robots/articulations/franka.py:86)."""
    jd0, jq0 = model.jd0, model.jq0
    qd_new = qd + dt * qdd
    qj_d = jnp.clip(
        qd_new[jd0:], -model.dof_max_velocity, model.dof_max_velocity
    )
    qj = q[jq0:] + dt * qj_d

    # hard limit projection: clamp q, zero outward velocity
    hit_lb = qj < model.dof_limit_lower
    hit_ub = qj > model.dof_limit_upper
    qj = jnp.clip(qj, model.dof_limit_lower, model.dof_limit_upper)
    qj_d = jnp.where(hit_ub, jnp.minimum(qj_d, 0.0), qj_d)
    qj_d = jnp.where(hit_lb, jnp.maximum(qj_d, 0.0), qj_d)

    if model.root_free:
        # PhysX-style rigid body velocity caps (default maxAngularVelocity
        # 64 rad/s); bounds runaway states so RL exploits terminate cleanly
        omega_b = jnp.clip(qd_new[0:3], -64.0, 64.0)
        vel_b = jnp.clip(qd_new[3:6], -1000.0, 1000.0)
        qd_new = qd_new.at[0:3].set(omega_b).at[3:6].set(vel_b)
        quat = q[3:7]
        Rw = rot.quat_to_rotmat(quat)
        pos = q[0:3] + dt * (Rw @ vel_b)
        quat = rot.quat_normalize(rot.quat_integrate_body(quat, omega_b, dt))
        q_new = jnp.concatenate([pos, quat, qj])
        qd_new = jnp.concatenate([qd_new[0:6], qj_d])
    else:
        q_new = qj
        qd_new = qj_d
    return q_new, qd_new


def drive_torques(model: Model, q: jax.Array, qd: jax.Array, control,
                  h: float = 0.0) -> jax.Array:
    """Total active joint torque: PD drive (clamped) + direct effort +
    passive damping/friction. Matches the PhysX implicit joint drive law
    (stiffness*(target-q) + damping*(vtarget-qd), clamped to max_force;
    reference tasks/utils/usd_utils.py:71-82) via the Stable-PD
    discretization: the spring is evaluated at the velocity-predicted
    position q + h*qd and the damping terms are made implicit by the
    matching h*Kd addition to the ABA diagonal (see aba())."""
    qj = q[model.jq0:]
    qjd = qd[model.jd0:]
    drive = (
        model.dof_stiffness * (control.pos_target - qj - h * qjd)
        + model.dof_drive_damping * (control.vel_target - qjd)
    )
    drive = jnp.clip(drive, -model.dof_max_effort, model.dof_max_effort)
    passive = -model.dof_damping * qjd - model.dof_friction * jnp.tanh(qjd * 10.0)
    return drive + control.effort + passive
