"""Fused physics substep as a single Pallas TPU kernel.

The level-batched XLA path (physics/dynamics.py) leaves ~500 small ops per
substep whose intermediates round-trip HBM. This kernel fuses the entire
substep — forward kinematics, contacts, joint drives, the articulated-body
algorithm, and semi-implicit integration — into one Pallas program: per-env
state lives in VMEM/vector registers, the env axis rides the (8, 128) VPU
lanes, and every model constant (tree structure, inertias, joint frames,
drive gains, contact geometry) is baked into the trace as scalar literals.

Scope (auto-detected by the engine): FORESTS of articulations with FREE
and/or FIXED roots, 1-dof revolute/prismatic joints, plane/heightfield
ground contact, cross-tree pairwise contacts (point vs sphere/capsule/box
receiver surfaces), gravity compensation, PD + effort control, applied
body forces. This covers every task in the suite (locomotion, hands,
Franka+Cabinet, BallBalance, flyers, terrain). Heightfields enter as a
per-contact-point local plane (height + gradient sampled once per control
step outside the kernel — an XLA gather — and frozen across the substeps
of one control step; feet move O(mm) per control step so the local plane
is an excellent approximation of the bilinear field).

The kernel is exposed through jax.custom_batching.custom_vmap so the
per-env engine code stays unchanged: under VecEnv's vmap, the batch hits
the kernel; unbatched calls fall back to the reference implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omniisaacgymenvs_tpu.physics.model import JointType, Model, SurfaceType

LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES  # envs per grid step


# ---------------------------------------------------------------------------
# small-matrix helpers over mixed (8,128)-array / python-float scalars
# ---------------------------------------------------------------------------

def _m3x(A, x):
    return [
        A[i][0] * x[0] + A[i][1] * x[1] + A[i][2] * x[2] for i in range(3)
    ]


def _m3m(A, B):
    return [
        [sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]


def _m3t(A):
    return [[A[j][i] for j in range(3)] for i in range(3)]


def _vadd(a, b):
    return [a[i] + b[i] for i in range(3)]


def _vsub(a, b):
    return [a[i] - b[i] for i in range(3)]


def _vscale(a, s):
    return [a[i] * s for i in range(3)]


def _cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _rodrigues(axis, s, c):
    """Rotation matrix about unit float axis by traced angle (s=sin, c=cos)."""
    ax, ay, az = float(axis[0]), float(axis[1]), float(axis[2])
    one_c = 1.0 - c
    return [
        [c + ax * ax * one_c, ax * ay * one_c - az * s, ax * az * one_c + ay * s],
        [ay * ax * one_c + az * s, c + ay * ay * one_c, ay * az * one_c - ax * s],
        [az * ax * one_c - ay * s, az * ay * one_c + ax * s, c + az * az * one_c],
    ]


def _quat_mat(w_, x_, y_, z_):
    """World rotation matrix from wxyz quaternion scalars."""
    return [
        [1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - w_ * z_), 2 * (x_ * z_ + w_ * y_)],
        [2 * (x_ * y_ + w_ * z_), 1 - 2 * (x_ * x_ + z_ * z_), 2 * (y_ * z_ - w_ * x_)],
        [2 * (x_ * z_ - w_ * y_), 2 * (y_ * z_ + w_ * x_), 1 - 2 * (x_ * x_ + y_ * y_)],
    ]


def _m6x(M, x):
    return [sum(M[i][k] * x[k] for k in range(6)) for i in range(6)]


def _m6m(A, B):
    return [
        [sum(A[i][k] * B[k][j] for k in range(6)) for j in range(6)]
        for i in range(6)
    ]


def _m6t(A):
    return [[A[j][i] for j in range(6)] for i in range(6)]


def _chol_solve6(A, b):
    """Unrolled SPD Cholesky solve on scalar entries."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _mat_to_quat(R):
    """Branch-free Shepperd rotmat -> wxyz quat on scalar entries. A fully
    constant R (FIXED-root world pose) is computed in numpy and returned as
    python floats so Mosaic never sees scalar-typed ops."""
    if all(isinstance(x, (int, float)) for row in R for x in row):
        def fsqrt(x):
            return float(np.sqrt(max(x, 1e-12)))

        tr = R[0][0] + R[1][1] + R[2][2]
        qw = 0.5 * fsqrt(1.0 + tr)
        qx = 0.5 * fsqrt(1.0 + R[0][0] - R[1][1] - R[2][2])
        qy = 0.5 * fsqrt(1.0 - R[0][0] + R[1][1] - R[2][2])
        qz = 0.5 * fsqrt(1.0 - R[0][0] - R[1][1] + R[2][2])
        qx = float(np.copysign(qx, R[2][1] - R[1][2]))
        qy = float(np.copysign(qy, R[0][2] - R[2][0]))
        qz = float(np.copysign(qz, R[1][0] - R[0][1]))
        n = float(np.sqrt(qw * qw + qx * qx + qy * qy + qz * qz + 1e-12))
        return [qw / n, qx / n, qy / n, qz / n]

    def ssqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    tr = R[0][0] + R[1][1] + R[2][2]
    qw = 0.5 * ssqrt(1.0 + tr)
    qx = 0.5 * ssqrt(1.0 + R[0][0] - R[1][1] - R[2][2])
    qy = 0.5 * ssqrt(1.0 - R[0][0] + R[1][1] - R[2][2])
    qz = 0.5 * ssqrt(1.0 - R[0][0] - R[1][1] + R[2][2])
    qx = jnp.copysign(qx, R[2][1] - R[1][2])
    qy = jnp.copysign(qy, R[0][2] - R[2][0])
    qz = jnp.copysign(qz, R[1][0] - R[0][1])
    n = jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz + 1e-12)
    return [qw / n, qx / n, qy / n, qz / n]


def eligible(model: Model, engine) -> bool:
    """Can the fused kernel simulate this scene? Forests, fixed/free roots,
    pair contacts, gravity compensation and heightfields are all supported;
    only dof-less scenes fall back to the XLA path."""
    return model.njd >= 1


# ---------------------------------------------------------------------------
# kernel builder
# ---------------------------------------------------------------------------

def build_fused_substep(model: Model, h: float, gravity, contact,
                        has_height: bool = False,
                        dr_keys: tuple = ()):
    """Returns batched_substep(q, qd, effort, pos_target, vel_target,
    f_applied, planes) -> (q', qd', body_force_sensors) over a leading env
    axis. When has_height, `planes` carries (ncp, 4) [nx, ny, nz, d] per
    ground contact point: surface z(x, y) = c0 + gx*x + gy*y.

    dr_keys: domain-randomization overlay parameters supplied as extra
    per-env kernel inputs (utils/domain_randomization.py sample_overlay;
    subset of mass_scale/stiffness_scale/damping_scale/friction_scale/
    gravity_delta). The kernel is specialized per key-set so parameters
    NOT being randomized stay trace-time constants (mass_scale in
    particular: without it the articulated-inertia recursion's constant
    subtrees fold away)."""
    nb, nq, nv, njd = model.nb, model.nq, model.nv, model.njd

    # -------- numpy model constants (baked into the trace) --------
    parents = model.parents
    jtypes = model.jtype
    q_adr = model.q_adr
    v_adr = model.v_adr
    axis_np = np.asarray(model.joint_axis, np.float64)
    Et_np = np.asarray(model.joint_Et, np.float64)
    rt_np = np.asarray(model.joint_pos, np.float64)
    mass_np = np.asarray(model.body_mass, np.float64)
    com_np = np.asarray(model.body_com, np.float64)
    I3_np = np.asarray(model.body_inertia, np.float64)
    jdof = model.jdof
    jq_np = np.asarray(model.jq_idx)
    jv_np = np.asarray(model.jv_idx)
    lim_lo = np.asarray(model.dof_limit_lower, np.float64)
    lim_hi = np.asarray(model.dof_limit_upper, np.float64)
    armature = np.asarray(model.dof_armature, np.float64)
    damping = np.asarray(model.dof_damping, np.float64)
    friction = np.asarray(model.dof_friction, np.float64)
    kp = np.asarray(model.dof_stiffness, np.float64)
    kd = np.asarray(model.dof_drive_damping, np.float64)
    max_eff = np.asarray(model.dof_max_effort, np.float64)
    max_vel = np.asarray(model.dof_max_velocity, np.float64)
    cp_body = np.asarray(model.cp_body)
    cp_pos = np.asarray(model.cp_pos, np.float64)
    cp_rad = np.asarray(model.cp_radius, np.float64)
    cp_mu = np.asarray(model.cp_friction, np.float64)
    gc_np = np.asarray(model.gravity_comp, np.float64)
    pair_pt = np.asarray(model.pair_point)
    pair_sf = model.pair_surf
    surf_type = model.surf_type
    surf_body = model.surf_body
    surf_params = model.surf_params
    sensors = model.sensor_body
    free_roots = tuple(
        i for i in model.roots if jtypes[i] == JointType.FREE
    )
    gz = [float(g) for g in gravity]
    kn, kdn, kt = float(contact.kn), float(contact.kd), float(contact.kt)
    mu0, fn_max = float(contact.mu), float(contact.fn_max)
    # per-mass contact gains (auto_contact_params): EFFECTIVE masses with
    # the rotational lever coupling (physics/contacts.py _eff_mass); ground
    # point -> its own effective mass, pair -> the lighter of point/surface
    from omniisaacgymenvs_tpu.physics.contacts import (
        ground_point_gains, point_body_masses, point_effective_masses,
        surface_effective_mass,
    )

    per_mass = bool(getattr(contact, "per_mass", False))
    if per_mass:
        kn_pm, kt_pm, fnm_pm = (
            float(contact.kn_pm), float(contact.kt_pm), float(contact.fnm_pm)
        )
        meff_pt = point_effective_masses(model)
        mbody_pt = point_body_masses(model)
        # ground gains with the static-load floor + body-level mdv cap
        # (physics/contacts.py ground_point_gains — single source of truth
        # with the reference plane_contacts path)
        gkn, gkt, gfnm = ground_point_gains(model, contact)

    def point_gains(k):
        if per_mass:
            return float(gkn[k]), float(gkt[k]), float(gfnm[k])
        return kn, kt, fn_max

    def pair_gains(pi, si):
        if per_mass:
            m_ = float(min(meff_pt[pi], surface_effective_mass(model, si)))
            mb = float(
                min(mbody_pt[pi], mass_np[int(surf_body[si])])
            )
            return kn_pm * m_, kt_pm * m_, fnm_pm * mb
        return kn, kt, fn_max
    d_impl = h * (kd + damping + h * kp)
    ncp = cp_body.shape[0]
    # fixed tendons (physics/dynamics.py drive_torques tendon block)
    nt_ = model.nt
    t_dof = np.asarray(model.tendon_dof)
    t_coef = np.asarray(model.tendon_coef, np.float64)
    t_rest = np.asarray(model.tendon_rest, np.float64)
    t_k = np.asarray(model.tendon_stiffness, np.float64)
    t_c = np.asarray(model.tendon_damping, np.float64)
    t_lo = np.asarray(model.tendon_limit_lower, np.float64)
    t_hi = np.asarray(model.tendon_limit_upper, np.float64)
    t_klim = np.asarray(model.tendon_limit_stiffness, np.float64)

    # spatial inertia constants per body (6x6 floats)
    def spatial_I(i):
        m = mass_np[i]
        cx = np.array(
            [
                [0, -com_np[i][2], com_np[i][1]],
                [com_np[i][2], 0, -com_np[i][0]],
                [-com_np[i][1], com_np[i][0], 0],
            ]
        )
        top = np.hstack([I3_np[i] + m * cx @ cx.T, m * cx])
        bot = np.hstack([m * cx.T, m * np.eye(3)])
        return np.vstack([top, bot])

    I6_const = [spatial_I(i) for i in range(nb)]

    n_planes = 4 * ncp if has_height else 0
    dr_sizes = {
        "damping_scale": njd, "friction_scale": nb, "geom_scale": nb,
        "gravity_delta": 3, "limit_lower_delta": njd,
        "limit_upper_delta": njd, "mass_scale": nb, "stiffness_scale": njd,
        "tendon_stiffness_scale": nt_, "tendon_damping_scale": nt_,
    }
    n_dr = sum(dr_sizes[k] for k in dr_keys)
    n_in = nq + nv + 3 * njd + 6 * nb + n_planes + n_dr
    n_out = nq + nv + 6 * max(len(sensors), 1)
    n_fk_out = 13 * nb

    def fk_full(q, qd):
        """Forward kinematics on scalar fields (shared by the substep and
        the post-integration report). Supports forests of FREE/FIXED-root
        trees (reference scenes with several actors per env)."""
        E = [None] * nb
        r = [None] * nb
        S = [None] * nb
        vJ = [None] * nb
        v = [None] * nb
        cbias = [None] * nb
        Rw = [None] * nb
        pw = [None] * nb
        for i in range(nb):
            if parents[i] == -1:
                if jtypes[i] == JointType.FREE:
                    qa, va = q_adr[i], v_adr[i]
                    Rw[i] = _quat_mat(q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6])
                    pw[i] = [q[qa], q[qa + 1], q[qa + 2]]
                    v[i] = (
                        [qd[va], qd[va + 1], qd[va + 2]],
                        [qd[va + 3], qd[va + 4], qd[va + 5]],
                    )
                else:  # FIXED root: constant world pose, zero velocity —
                    # python floats so downstream subtrees constant-fold
                    Rw[i] = [
                        [float(Et_np[i][c_][r_]) for c_ in range(3)]
                        for r_ in range(3)
                    ]
                    pw[i] = [float(x) for x in rt_np[i]]
                    v[i] = ([0.0, 0.0, 0.0], [0.0, 0.0, 0.0])
                cbias[i] = ([0.0, 0.0, 0.0], [0.0, 0.0, 0.0])
                continue
            p = parents[i]
            jd = jdof[i]
            th = q[int(jq_np[jd])]
            thd = qd[int(jv_np[jd])]
            a = axis_np[i]
            Etc = [[float(Et_np[i][r_][c_]) for c_ in range(3)] for r_ in range(3)]
            rtc = [float(x) for x in rt_np[i]]
            if jtypes[i] == JointType.REVOLUTE:
                s_, c_ = jnp.sin(th), jnp.cos(th)
                Ei = _m3m(_m3t(_rodrigues(a, s_, c_)), Etc)
                ri = rtc
                Sw = [float(x) for x in a]
                Sl = [0.0, 0.0, 0.0]
            else:  # prismatic
                Ei = Etc
                EtT = _m3t(Etc)
                off = _m3x(EtT, [float(a[0]) * th, float(a[1]) * th, float(a[2]) * th])
                ri = _vadd(rtc, off)
                Sw = [0.0, 0.0, 0.0]
                Sl = [float(x) for x in a]
            wp, lp = v[p]
            wi = _m3x(Ei, wp)
            li = _m3x(Ei, _vsub(lp, _cross(ri, wp)))
            vJw = _vscale(Sw, thd)
            vJl = _vscale(Sl, thd)
            wi = _vadd(wi, vJw)
            li = _vadd(li, vJl)
            E[i], r[i], S[i] = Ei, ri, (Sw, Sl)
            vJ[i] = (vJw, vJl)
            v[i] = (wi, li)
            cbias[i] = (
                _cross(wi, vJw),
                _vadd(_cross(wi, vJl), _cross(li, vJw)),
            )
            Rw[i] = _m3m(Rw[p], _m3t(Ei))
            pw[i] = _vadd(pw[p], _m3x(Rw[p], ri))
        wv = [_m3x(Rw[i], v[i][0]) for i in range(nb)]
        lv = [_m3x(Rw[i], v[i][1]) for i in range(nb)]
        return E, r, S, vJ, v, cbias, Rw, pw, wv, lv

    def fk_outputs(q, qd):
        """13*nb report fields: pos(3), quat(4), avel(3), lvel(3) per body.
        Entries for FIXED roots are python-float constants — callers
        materialize them onto the field shape when writing out."""
        _, _, _, _, _, _, Rw, pw, wv, lv = fk_full(q, qd)
        outs = []
        for i in range(nb):
            outs += pw[i]
        for i in range(nb):
            outs += _mat_to_quat(Rw[i])
        for i in range(nb):
            outs += wv[i]
        for i in range(nb):
            outs += lv[i]
        return outs

    def _contact_force_scalar(pen, n, vrel, mu, kn_k, kt_k, fnm_k):
        """Compliant Hunt-Crossley normal + stiction-capped friction on
        scalar fields (mirrors physics/contacts.py _contact_force)."""
        vn = _dot(vrel, n)
        vt = [vrel[k] - vn * n[k] for k in range(3)]
        fn = jnp.minimum(
            kn_k * jnp.maximum(pen, 0.0)
            * jnp.clip(1.0 - kdn * vn, 0.0, 5.0),
            fnm_k,
        )
        vt_norm = jnp.sqrt(vt[0] * vt[0] + vt[1] * vt[1] + vt[2] * vt[2] + 1e-12)
        ft_mag = jnp.minimum(mu * fn, kt_k * vt_norm)
        scale_t = ft_mag / (vt_norm + 1e-6)
        return [fn * n[k] - scale_t * vt[k] for k in range(3)]

    def substep_math(ins, debug=False):
        """The full substep on a list of n_in scalar-field arrays; returns
        the n_out output fields. Pure — testable without Pallas.
        debug=True instead returns a dict of intermediates (contact
        wrenches, drive torques, qdd) for numerical bisection."""
        q = [ins[i] for i in range(nq)]
        qd = [ins[nq + i] for i in range(nv)]
        eff = [ins[nq + nv + i] for i in range(njd)]
        ptg = [ins[nq + nv + njd + i] for i in range(njd)]
        vtg = [ins[nq + nv + 2 * njd + i] for i in range(njd)]
        fa0 = nq + nv + 3 * njd  # applied world wrench [t(3), f(3)] per body
        hp0 = fa0 + 6 * nb   # terrain contact planes [n(3), d] per point

        # domain-randomization overlay fields (per-env scales/deltas; the
        # XLA counterpart is engine._substep's `overlay` handling)
        off = hp0 + n_planes
        drv = {}
        for key in dr_keys:
            drv[key] = [ins[off + i] for i in range(dr_sizes[key])]
            off += dr_sizes[key]
        ms = drv.get("mass_scale")
        ss = drv.get("stiffness_scale")
        ds = drv.get("damping_scale")
        fr = drv.get("friction_scale")       # per-body (nb,)
        gs_ = drv.get("geom_scale")          # per-body (nb,)
        ll_ = drv.get("limit_lower_delta")
        lu_ = drv.get("limit_upper_delta")
        gd = drv.get("gravity_delta")
        gzv = [gz[k] + gd[k] for k in range(3)] if gd is not None else gz

        E, r, S, vJ, v, cbias, Rw, pw, wv, lv = fk_full(q, qd)

        # ---------------- ground contacts (plane / heightfield) -----------
        zero = q[0] * 0.0
        fx = [[zero, zero, zero] for _ in range(nb)]   # world force per body
        tx = [[zero, zero, zero] for _ in range(nb)]   # world torque per body
        # applied external wrenches (Control.body_force/torque)
        fapp = [[ins[fa0 + 6 * b + 3 + k] for k in range(3)] for b in range(nb)]
        tapp = [[ins[fa0 + 6 * b + k] for k in range(3)] for b in range(nb)]
        for k in range(ncp):
            b = int(cp_body[k])
            lp_ = [float(x) for x in cp_pos[k]]
            rad_k = float(cp_rad[k])
            if gs_ is not None:
                lp_ = [x * gs_[b] for x in lp_]
                rad_k = rad_k * gs_[b]
            pt = _vadd(pw[b], _m3x(Rw[b], lp_))
            rel = _vsub(pt, pw[b])
            vpt = _vadd(lv[b], _cross(wv[b], rel))
            mu_k = mu0 * float(cp_mu[k])
            if fr is not None:
                mu_k = mu_k * fr[b]
            kn_k, kt_k, fnm_k = point_gains(k)
            if has_height:
                # general plane [n, d]: supports vertical stair-riser
                # walls the z(x,y) form cannot express (tasks/
                # anymal_terrain.py contact_plane_fn feature selection)
                n_ = [ins[hp0 + 4 * k + j] for j in range(3)]
                d_pl = ins[hp0 + 4 * k + 3]
                dist = (n_[0] * pt[0] + n_[1] * pt[1] + n_[2] * pt[2]
                        - d_pl)
                pen = rad_k - dist
                f = _contact_force_scalar(pen, n_, vpt, mu_k, kn_k, kt_k,
                                          fnm_k)
            else:
                pen = rad_k - pt[2]
                vn = vpt[2]
                fn = jnp.minimum(
                    kn_k * jnp.maximum(pen, 0.0)
                    * jnp.clip(1.0 - kdn * vn, 0.0, 5.0),
                    fnm_k,
                )
                vt0, vt1 = vpt[0], vpt[1]
                vt_norm = jnp.sqrt(vt0 * vt0 + vt1 * vt1 + 1e-12)
                ft_mag = jnp.minimum(mu_k * fn, kt_k * vt_norm)
                scale_t = ft_mag / (vt_norm + 1e-6)
                f = [-scale_t * vt0, -scale_t * vt1, fn]
            n = _cross(rel, f)
            fx[b] = _vadd(fx[b], f)
            tx[b] = _vadd(tx[b], n)

        # ---------------- pairwise contacts (point vs other-tree surface) --
        # mirrors physics/contacts.py pair_contacts: static candidate list,
        # equal/opposite forces on point body and surface body
        for pk in range(pair_pt.shape[0]):
            pi = int(pair_pt[pk])
            si = int(pair_sf[pk])
            stype = SurfaceType(surf_type[si])
            sb = int(surf_body[si])
            prm = [float(x) for x in surf_params[si]]
            pb = int(cp_body[pi])
            lp_ = [float(x) for x in cp_pos[pi]]
            rad_p = float(cp_rad[pi])
            if gs_ is not None:
                lp_ = [x * gs_[pb] for x in lp_]
                rad_p = rad_p * gs_[pb]
                sgs = gs_[sb]
            else:
                sgs = 1.0
            pt_w = _vadd(pw[pb], _m3x(Rw[pb], lp_))
            v_pt = _vadd(lv[pb], _cross(wv[pb], _vsub(pt_w, pw[pb])))

            if stype == SurfaceType.SPHERE:
                c_loc = [x * sgs for x in prm[0:3]]
                c_w = _vadd(pw[sb], _m3x(Rw[sb], c_loc))
                d = _vsub(pt_w, c_w)
                dist = jnp.sqrt(_dot(d, d) + 1e-18)
                n_ = [d[k] / (dist + 1e-9) for k in range(3)]
                pen = prm[3] * sgs + rad_p - dist
                v_sf = _vadd(lv[sb], _cross(wv[sb], _vsub(pt_w, pw[sb])))
            elif stype == SurfaceType.CAPSULE:
                p0 = _vadd(pw[sb], _m3x(Rw[sb], [x * sgs for x in prm[0:3]]))
                p1 = _vadd(pw[sb], _m3x(Rw[sb], [x * sgs for x in prm[3:6]]))
                seg = _vsub(p1, p0)
                t_ = jnp.clip(
                    _dot(_vsub(pt_w, p0), seg) / (_dot(seg, seg) + 1e-9),
                    0.0, 1.0,
                )
                c_w = _vadd(p0, _vscale(seg, t_))
                d = _vsub(pt_w, c_w)
                dist = jnp.sqrt(_dot(d, d) + 1e-18)
                n_ = [d[k] / (dist + 1e-9) for k in range(3)]
                pen = prm[6] * sgs + rad_p - dist
                v_sf = _vadd(lv[sb], _cross(wv[sb], _vsub(c_w, pw[sb])))
            else:  # BOX
                center = [x * sgs for x in prm[0:3]]
                half = [x * sgs for x in prm[3:6]]
                bq = prm[6:10]
                Rq = _quat_mat(bq[0], bq[1], bq[2], bq[3])  # floats
                R_box = _m3m(Rw[sb], Rq)                    # box -> world
                c_w = _vadd(pw[sb], _m3x(Rw[sb], center))
                dloc = _vsub(pt_w, c_w)
                p_l = _m3x(_m3t(R_box), dloc)               # world -> box
                clamped = [
                    jnp.clip(p_l[k], -half[k], half[k]) for k in range(3)
                ]
                d_out = _vsub(p_l, clamped)
                d2_out = _dot(d_out, d_out)
                dist_out = jnp.sqrt(d2_out + 1e-18)
                # classify on the SQUARED distance: for interior points
                # d_out is exactly 0, so dist_out = sqrt(1e-18) which lands
                # ON the 1e-9 threshold — TPU's approximate sqrt rounds it
                # just ABOVE (1.00000008e-9), flipping every resting
                # interior point to "outside" (pen = rad - 1e-9 -> zero
                # force for rad=0 box corners: the round-2 cube-through-
                # palm fall-through). d2 > 1e-14 is 1e5 x away from any
                # rounding of the +1e-18 floor on all platforms.
                outside = d2_out > 1e-14
                n_out = [d_out[k] / (dist_out + 1e-9) for k in range(3)]
                face_d = [half[k] - jnp.abs(p_l[k]) for k in range(3)]
                min_d = jnp.minimum(face_d[0], jnp.minimum(face_d[1], face_d[2]))
                is0 = face_d[0] <= jnp.minimum(face_d[1], face_d[2])
                is1 = jnp.logical_and(
                    jnp.logical_not(is0), face_d[1] <= face_d[2]
                )
                n_in_l = [
                    jnp.where(is0, jnp.sign(p_l[0]), 0.0),
                    jnp.where(is1, jnp.sign(p_l[1]), 0.0),
                    jnp.where(
                        jnp.logical_or(is0, is1), 0.0, jnp.sign(p_l[2])
                    ),
                ]
                pen_in = -min_d
                n_l = [
                    jnp.where(outside, n_out[k], n_in_l[k]) for k in range(3)
                ]
                pen = jnp.where(
                    outside, rad_p - dist_out, rad_p - pen_in
                )
                n_ = _m3x(R_box, n_l)
                v_sf = _vadd(lv[sb], _cross(wv[sb], _vsub(pt_w, pw[sb])))

            vrel = _vsub(v_pt, v_sf)
            mu_pk = mu0 * float(cp_mu[pi])
            if fr is not None:
                mu_pk = mu_pk * fr[pb]
            f = _contact_force_scalar(pen, n_, vrel, mu_pk,
                                      *pair_gains(pi, si))
            fx[pb] = _vadd(fx[pb], f)
            tx[pb] = _vadd(tx[pb], _cross(_vsub(pt_w, pw[pb]), f))
            fx[sb] = _vsub(fx[sb], f)
            tx[sb] = _vsub(tx[sb], _cross(_vsub(pt_w, pw[sb]), f))

        # total external wrench for dynamics = contact + applied (+ gravity
        # compensation: counter-gravity at each compensated body's CoM,
        # reference shadow_hand.py set_shadow_hand_properties DisableGravity)
        fx_tot = [_vadd(fx[b], fapp[b]) for b in range(nb)]
        tx_tot = [_vadd(tx[b], tapp[b]) for b in range(nb)]
        for b in range(nb):
            if gc_np[b] == 0.0:
                continue
            fg = [-gc_np[b] * mass_np[b] * gzv[k] for k in range(3)]
            if ms is not None:
                fg = [x * ms[b] for x in fg]
            com_w_rel = _m3x(Rw[b], [float(x) for x in com_np[b]])
            fx_tot[b] = _vadd(fx_tot[b], fg)
            tx_tot[b] = _vadd(tx_tot[b], _cross(com_w_rel, fg))

        # ---------------- drives ----------------
        tau = [None] * njd
        for jd in range(njd):
            qj = q[int(jq_np[jd])]
            qjd = qd[int(jv_np[jd])]
            kp_j = float(kp[jd]) if ss is None else float(kp[jd]) * ss[jd]
            kd_j = float(kd[jd]) if ds is None else float(kd[jd]) * ds[jd]
            drive = kp_j * (ptg[jd] - qj - h * qjd) + kd_j * (
                vtg[jd] - qjd
            )
            drive = jnp.clip(drive, -float(max_eff[jd]), float(max_eff[jd]))
            passive = -float(damping[jd]) * qjd - float(friction[jd]) * jnp.tanh(
                qjd * 10.0
            )
            tau[jd] = drive + eff[jd] + passive

        # ---------------- fixed tendons ----------------
        # Stable-PD coupling forces + per-dof implicit diagonal (mirrors
        # physics/dynamics.py drive_torques/aba tendon blocks); with no
        # tendon DR the d_tend entries are python floats and fold away
        ts_ = drv.get("tendon_stiffness_scale")
        tds_ = drv.get("tendon_damping_scale")
        d_tend = [0.0] * njd
        for t in range(nt_):
            i0, i1 = int(t_dof[t][0]), int(t_dof[t][1])
            c0_, c1_ = float(t_coef[t][0]), float(t_coef[t][1])
            q0 = q[int(jq_np[i0])]
            q1 = q[int(jq_np[i1])]
            qd0 = qd[int(jv_np[i0])]
            qd1 = qd[int(jv_np[i1])]
            k_ = float(t_k[t])
            klim_ = float(t_klim[t])
            c_ = float(t_c[t])
            if ts_ is not None:
                k_ = k_ * ts_[t]
                klim_ = klim_ * ts_[t]
            if tds_ is not None:
                c_ = c_ * tds_[t]
            L = c0_ * (q0 + h * qd0) + c1_ * (q1 + h * qd1)
            Ldot = c0_ * qd0 + c1_ * qd1
            excess = L - jnp.clip(L, float(t_lo[t]), float(t_hi[t]))
            F = klim_ * excess + k_ * (L - float(t_rest[t])) + c_ * Ldot
            tau[i0] = tau[i0] - c0_ * F
            tau[i1] = tau[i1] - c1_ * F
            d_tend[i0] = d_tend[i0] + h * (c_ + h * (k_ + klim_)) * c0_ * c0_
            d_tend[i1] = d_tend[i1] + h * (c_ + h * (k_ + klim_)) * c1_ * c1_

        # ---------------- ABA ----------------
        # entries start as python floats; constant subtrees fold at trace
        # (with mass_scale DR the per-body scale makes them traced values —
        # the XLA counterpart scales the spatial inertia identically,
        # dynamics.aba mass_scale)
        def _ia_init(i):
            if ms is None:
                return [
                    [float(I6_const[i][r_][c_]) for c_ in range(6)]
                    for r_ in range(6)
                ]
            return [
                [float(I6_const[i][r_][c_]) * ms[i] for c_ in range(6)]
                for r_ in range(6)
            ]

        IA = [_ia_init(i) for i in range(nb)]
        pA = [None] * nb
        for i in range(nb):
            wi, li = v[i]
            Iv = _m6x(
                [[float(I6_const[i][r_][c_]) for c_ in range(6)] for r_ in range(6)],
                [wi[0], wi[1], wi[2], li[0], li[1], li[2]],
            )
            # crf(v, Iv); linear in Iv, so mass_scale applies afterwards
            n6 = _vadd(_cross(wi, Iv[0:3]), _cross(li, Iv[3:6]))
            f6 = _cross(wi, Iv[3:6])
            if ms is not None:
                n6 = [x * ms[i] for x in n6]
                f6 = [x * ms[i] for x in f6]
            # external wrench world -> body coords
            RwT = _m3t(Rw[i])
            nb_ = _m3x(RwT, tx_tot[i])
            fb_ = _m3x(RwT, fx_tot[i])
            pA[i] = [
                n6[0] - nb_[0], n6[1] - nb_[1], n6[2] - nb_[2],
                f6[0] - fb_[0], f6[1] - fb_[1], f6[2] - fb_[2],
            ]

        U = [None] * nb
        D = [None] * nb
        uu = [None] * nb
        for i in reversed(range(nb)):
            if parents[i] == -1:
                continue
            p = parents[i]
            jd = jdof[i]
            Sw, Sl = S[i]
            S6 = [Sw[0], Sw[1], Sw[2], Sl[0], Sl[1], Sl[2]]
            Ui = _m6x(IA[i], S6)
            Di = (
                sum(S6[k] * Ui[k] for k in range(6) if S6[k] != 0.0)
                + float(armature[jd]) + float(d_impl[jd]) + d_tend[jd]
            )
            ui = tau[jd] - sum(S6[k] * pA[i][k] for k in range(6) if S6[k] != 0.0)
            U[i], D[i], uu[i] = Ui, Di, ui
            if parents[p] == -1 and jtypes[p] != JointType.FREE:
                # parent is a FIXED root: its articulated inertia is never
                # consumed (no root solve) — skip the 6x6 accumulation
                continue
            invD = 1.0 / Di
            Ia = [
                [IA[i][r_][c_] - Ui[r_] * Ui[c_] * invD for c_ in range(6)]
                for r_ in range(6)
            ]
            cw, cl = cbias[i]
            c6 = [cw[0], cw[1], cw[2], cl[0], cl[1], cl[2]]
            Iac = _m6x(Ia, c6)
            pa = [pA[i][k] + Iac[k] + Ui[k] * (ui * invD) for k in range(6)]
            # X = [[E,0],[-E r~, E]]
            Ei, ri = E[i], r[i]
            rtil = [
                [0.0, -ri[2], ri[1]],
                [ri[2], 0.0, -ri[0]],
                [-ri[1], ri[0], 0.0],
            ]
            Q = _m3m(Ei, rtil)
            X = [[None] * 6 for _ in range(6)]
            for r_ in range(3):
                for c_ in range(3):
                    X[r_][c_] = Ei[r_][c_]
                    X[r_][3 + c_] = 0.0
                    X[3 + r_][c_] = -Q[r_][c_]
                    X[3 + r_][3 + c_] = Ei[r_][c_]
            Xt = _m6t(X)
            Y = _m6m(Xt, _m6m(Ia, X))
            for r_ in range(6):
                for c_ in range(6):
                    IA[p][r_][c_] = IA[p][r_][c_] + Y[r_][c_]
            Xtpa = _m6x(Xt, pa)
            for k in range(6):
                pA[p][k] = pA[p][k] + Xtpa[k]

        # roots: a_world = [0; -g]; a0p = Xroot(a_world); FREE roots solve
        # their 6x6 articulated inertia, FIXED roots just transmit gravity
        g6 = [0.0, 0.0, 0.0, -gzv[0], -gzv[1], -gzv[2]]
        a = [None] * nb
        qdd = [None] * nv
        for i in model.roots:
            E0 = _m3t(Rw[i])
            r0 = pw[i]
            a0p_w = _m3x(E0, g6[0:3])
            a0p_l = _m3x(E0, _vsub(g6[3:6], _cross(r0, g6[0:3])))
            a0p = [a0p_w[0], a0p_w[1], a0p_w[2], a0p_l[0], a0p_l[1], a0p_l[2]]
            if jtypes[i] == JointType.FREE:
                va = v_adr[i]
                rhs = [
                    -(pA[i][k] + sum(IA[i][k][j] * a0p[j] for j in range(6)))
                    for k in range(6)
                ]
                qdd0 = _chol_solve6(IA[i], rhs)
                for k in range(6):
                    qdd[va + k] = qdd0[k]
                a[i] = [a0p[k] + qdd0[k] for k in range(6)]
            else:
                a[i] = a0p
        for i in range(nb):
            if parents[i] == -1:
                continue
            p = parents[i]
            jd = jdof[i]
            Ei, ri = E[i], r[i]
            ap = a[p]
            apw = _m3x(Ei, ap[0:3])
            apl = _m3x(Ei, _vsub(ap[3:6], _cross(ri, ap[0:3])))
            cw, cl = cbias[i]
            a_p = [
                apw[0] + cw[0], apw[1] + cw[1], apw[2] + cw[2],
                apl[0] + cl[0], apl[1] + cl[1], apl[2] + cl[2],
            ]
            Sw, Sl = S[i]
            S6 = [Sw[0], Sw[1], Sw[2], Sl[0], Sl[1], Sl[2]]
            qdd_i = (uu[i] - sum(U[i][k] * a_p[k] for k in range(6))) / D[i]
            qdd[int(jv_np[jd])] = qdd_i
            a[i] = [a_p[k] + S6[k] * qdd_i for k in range(6)]

        if debug:
            return {
                "fx": fx, "tx": tx, "fx_tot": fx_tot, "tx_tot": tx_tot,
                "tau": tau, "qdd": qdd, "pw": pw,
            }

        # ---------------- integrate ----------------
        qd_new = [qd[k] + h * qdd[k] for k in range(nv)]
        # free-root velocity caps (PhysX maxAngular/LinearVelocity defaults)
        for i in free_roots:
            va = v_adr[i]
            for k in range(3):
                qd_new[va + k] = jnp.clip(qd_new[va + k], -64.0, 64.0)
            for k in range(3, 6):
                qd_new[va + k] = jnp.clip(qd_new[va + k], -1000.0, 1000.0)
        q_new = list(q)
        for jd in range(njd):
            vi = int(jv_np[jd])
            qi = int(jq_np[jd])
            qjd_ = jnp.clip(qd_new[vi], -float(max_vel[jd]), float(max_vel[jd]))
            qj_ = q[qi] + h * qjd_
            lo_j = float(lim_lo[jd]) if ll_ is None else float(lim_lo[jd]) + ll_[jd]
            hi_j = float(lim_hi[jd]) if lu_ is None else float(lim_hi[jd]) + lu_[jd]
            hit_lb = qj_ < lo_j
            hit_ub = qj_ > hi_j
            qj_ = jnp.clip(qj_, lo_j, hi_j)
            qjd_ = jnp.where(hit_ub, jnp.minimum(qjd_, 0.0), qjd_)
            qjd_ = jnp.where(hit_lb, jnp.maximum(qjd_, 0.0), qjd_)
            q_new[qi] = qj_
            qd_new[vi] = qjd_
        # free-root pose updates
        for i in free_roots:
            qa, va = q_adr[i], v_adr[i]
            om = qd_new[va : va + 3]
            vel_b = qd_new[va + 3 : va + 6]
            dp = _m3x(Rw[i], vel_b)  # fk already built Rw for this root
            for k in range(3):
                q_new[qa + k] = q[qa + k] + h * dp[k]
            # quat: q' = q * exp(om*h/2)
            hx, hy, hz = om[0] * (h / 2), om[1] * (h / 2), om[2] * (h / 2)
            ang = jnp.sqrt(hx * hx + hy * hy + hz * hz + 1e-24)
            sa = jnp.sin(ang) / ang
            ew, ex, ey, ez = jnp.cos(ang), sa * hx, sa * hy, sa * hz
            w_, x_, y_, z_ = q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6]
            nw = w_ * ew - x_ * ex - y_ * ey - z_ * ez
            nx = w_ * ex + x_ * ew + y_ * ez - z_ * ey
            ny = w_ * ey - x_ * ez + y_ * ew + z_ * ex
            nz = w_ * ez + x_ * ey - y_ * ex + z_ * ew
            norm = jnp.sqrt(nw * nw + nx * nx + ny * ny + nz * nz + 1e-12)
            q_new[qa + 3] = nw / norm
            q_new[qa + 4] = nx / norm
            q_new[qa + 5] = ny / norm
            q_new[qa + 6] = nz / norm

        # ---------------- outputs ----------------
        outs = list(q_new) + list(qd_new)
        if sensors:
            for b in sensors:
                outs += [fx[b][0], fx[b][1], fx[b][2],
                         tx[b][0], tx[b][1], tx[b][2]]
        else:
            outs += [zero] * 6
        return outs

    def kernel(in_ref, out_ref):
        outs = substep_math([in_ref[i] for i in range(n_in)])
        for k in range(n_out):
            out_ref[k] = outs[k]

    def _pack_inputs(q, qd, effort, pos_target, vel_target, f_applied,
                     planes, dr, npad, nt):
        N = q.shape[0]

        def pack(x, d):
            x = jnp.pad(x, ((0, npad - N), (0, 0)))
            return x.T.reshape(d, nt, LANES)

        parts = [
            pack(q, nq), pack(qd, nv), pack(effort, njd),
            pack(pos_target, njd), pack(vel_target, njd),
            pack(f_applied.reshape(N, 6 * nb), 6 * nb),
        ]
        if has_height:
            parts.append(pack(planes.reshape(N, 4 * ncp), 4 * ncp))
        for key, arr in zip(dr_keys, dr):
            parts.append(pack(arr.reshape(N, dr_sizes[key]), dr_sizes[key]))
        return jnp.concatenate(parts, axis=0)

    # ------------------------------------------------------------------
    def batched(q, qd, effort, pos_target, vel_target, f_applied,
                planes=None, dr=()):
        """f_applied: (N, nb, 6) world wrench [torque, force] per body;
        planes: (N, ncp, 4) terrain contact planes [unit normal n, offset
        d] with penetration = radius - (n.pt - d) (has_height only);
        dr: per-env overlay arrays in dr_keys order."""
        N = q.shape[0]
        npad = -(-N // TILE) * TILE
        nt = npad // LANES
        data = _pack_inputs(q, qd, effort, pos_target, vel_target,
                            f_applied, planes, dr, npad, nt)
        out = pl.pallas_call(
            kernel,
            grid=(npad // TILE,),
            in_specs=[
                pl.BlockSpec(
                    (n_in, SUBLANES, LANES),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (n_out, SUBLANES, LANES),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((n_out, nt, LANES), jnp.float32),
        )(data)
        out = out.reshape(n_out, npad).T[:N]
        q_new = out[:, :nq]
        qd_new = out[:, nq : nq + nv]
        ns = max(len(sensors), 1)
        sf = out[:, nq + nv : nq + nv + 6 * ns].reshape(N, ns, 6)
        if not sensors:
            sf = sf[:, :0]
        return q_new, qd_new, sf

    def fk_kernel(in_ref, out_ref):
        q = [in_ref[i] for i in range(nq)]
        qd = [in_ref[nq + i] for i in range(nv)]
        outs = fk_outputs(q, qd)
        zero = in_ref[0] * 0.0
        for k in range(n_fk_out):
            out_ref[k] = zero + outs[k]

    def batched_fk(q, qd):
        """Fused report FK: (N,nq),(N,nv) -> world pos/quat/avel/lvel."""
        N = q.shape[0]
        npad = -(-N // TILE) * TILE
        nt = npad // LANES

        def pack(x, d):
            x = jnp.pad(x, ((0, npad - N), (0, 0)))
            return x.T.reshape(d, nt, LANES)

        data = jnp.concatenate([pack(q, nq), pack(qd, nv)], axis=0)
        out = pl.pallas_call(
            fk_kernel,
            grid=(npad // TILE,),
            in_specs=[
                pl.BlockSpec(
                    (nq + nv, SUBLANES, LANES),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (n_fk_out, SUBLANES, LANES),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((n_fk_out, nt, LANES), jnp.float32),
        )(data)
        out = out.reshape(n_fk_out, npad).T[:N]
        pos = out[:, : 3 * nb].reshape(N, nb, 3)
        quat = out[:, 3 * nb : 7 * nb].reshape(N, nb, 4)
        avel = out[:, 7 * nb : 10 * nb].reshape(N, nb, 3)
        lvel = out[:, 10 * nb : 13 * nb].reshape(N, nb, 3)
        return pos, quat, avel, lvel

    # ------------------------------------------------------------------
    # whole control step in one kernel: n_steps substeps looped in VMEM
    # (fori_loop) + the report FK, so state never round-trips HBM between
    # substeps and the control inputs are packed (transposed) once per
    # control step instead of once per substep. This removed the dominant
    # per-substep layout-conversion copies seen in device traces
    # (docs/performance.md).
    n_total = n_out + n_fk_out
    _step_kernels: dict = {}

    def _step_kernel(n_steps: int):
        kern = _step_kernels.get(n_steps)
        if kern is None:
            def kern(in_ref, out_ref):
                ctrl = [in_ref[nq + nv + i] for i in range(n_in - nq - nv)]
                zero = jnp.zeros_like(in_ref[0])
                st0 = jnp.stack(
                    [in_ref[i] for i in range(nq + nv)]
                    + [zero] * (n_out - nq - nv)
                )

                def body(_, st):
                    ins = [st[i] for i in range(nq + nv)] + ctrl
                    return jnp.stack(substep_math(ins))

                st = jax.lax.fori_loop(0, n_steps, body, st0)
                for k in range(n_out):
                    out_ref[k] = st[k]
                fk = fk_outputs(
                    [st[i] for i in range(nq)],
                    [st[nq + i] for i in range(nv)],
                )
                for k in range(n_fk_out):
                    out_ref[n_out + k] = zero + fk[k]

            _step_kernels[n_steps] = kern
        return kern

    def batched_step(q, qd, effort, pos_target, vel_target, f_applied,
                     n_steps: int, planes=None, dr=(),
                     interpret: bool = False):
        """(N,·) state/control -> (q', qd', sensor_forces, body_pos,
        body_quat, body_avel, body_lvel) after n_steps fused substeps."""
        N = q.shape[0]
        npad = -(-N // TILE) * TILE
        nt = npad // LANES
        data = _pack_inputs(q, qd, effort, pos_target, vel_target,
                            f_applied, planes, dr, npad, nt)
        out = pl.pallas_call(
            _step_kernel(n_steps),
            grid=(npad // TILE,),
            in_specs=[
                pl.BlockSpec(
                    (n_in, SUBLANES, LANES),
                    lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (n_total, SUBLANES, LANES),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((n_total, nt, LANES), jnp.float32),
            interpret=interpret,
        )(data)
        out = out.reshape(n_total, npad).T[:N]
        q_new = out[:, :nq]
        qd_new = out[:, nq : nq + nv]
        ns = max(len(sensors), 1)
        sf = out[:, nq + nv : nq + nv + 6 * ns].reshape(N, ns, 6)
        if not sensors:
            sf = sf[:, :0]
        o = n_out
        pos = out[:, o : o + 3 * nb].reshape(N, nb, 3)
        quat = out[:, o + 3 * nb : o + 7 * nb].reshape(N, nb, 4)
        avel = out[:, o + 7 * nb : o + 10 * nb].reshape(N, nb, 3)
        lvel = out[:, o + 10 * nb : o + 13 * nb].reshape(N, nb, 3)
        return q_new, qd_new, sf, pos, quat, avel, lvel

    batched.substep_math = substep_math
    batched.fk_math = fk_outputs  # plain-XLA FK on scalar fields (debug/tests)
    batched.fk = batched_fk
    batched.step = batched_step
    batched.n_in = n_in
    batched.n_out = n_out
    batched.has_height = has_height
    batched.dr_keys = dr_keys
    batched.ncp = ncp
    return batched
