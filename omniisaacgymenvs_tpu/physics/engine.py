"""Physics engine: one pure jitted step over the articulation state.

The engine composes FK -> contacts -> drives -> ABA -> integrate into a
single pure function (per env; vmapped over the env batch by callers). This
replaces the reference's `world.step()` PhysX dispatch in the hot loop
(reference envs/vec_env_rlgames.py:62-68) with a traced, fusable JAX program.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.physics import dynamics, rotations as rot
from omniisaacgymenvs_tpu.physics.contacts import (
    ContactParams,
    auto_contact_params,
    build_pair_groups,
    pair_contacts,
    plane_contacts,
)
from omniisaacgymenvs_tpu.physics.model import Model
from omniisaacgymenvs_tpu.physics.state import Control, State


@dataclasses.dataclass(frozen=True)
class SimParams:
    """Simulation parameters (reference cfg/task/*.yaml `sim` section:
    dt, substeps, gravity; contact material from default_physics_material)."""

    dt: float = 1.0 / 60.0
    substeps: int = 1
    gravity: tuple = (0.0, 0.0, -9.81)
    # None -> stable gains derived from the model (auto_contact_params)
    contact: Optional[ContactParams] = None
    friction: float = 1.0  # default physics material friction coefficient
    # contact force cap as an escape velocity (PhysX
    # max_depenetration_velocity, reference default_scene_params.py)
    max_depenetration_velocity: float = 10.0


def sim_params_from_cfg(sim_cfg, dt: float = 1.0 / 60.0, substeps: int = 1,
                        gravity=(0.0, 0.0, -9.81),
                        friction: float = 1.0) -> SimParams:
    """Build SimParams from a reference-shaped task yaml `sim` block
    (utils/sim_config.parse_sim_cfg: consumes dt/substeps/gravity/material/
    physx keys, maps solver position iterations to substeps, warns on
    unknown keys)."""
    from omniisaacgymenvs_tpu.utils.sim_config import parse_sim_cfg

    return SimParams(**parse_sim_cfg(
        sim_cfg, dt=dt, substeps=substeps, gravity=gravity,
        friction=friction,
    ))


class PhysicsEngine:
    """Stateless stepping functions bound to a (model, params) pair.

    All methods are pure single-env functions safe under jit/vmap; the model
    and params are closure constants baked into the trace.
    """

    def __init__(
        self,
        model: Model,
        params: SimParams,
        height_fn: Optional[Callable] = None,
        contact_plane_fn: Optional[Callable] = None,
        plane_refresh: bool = False,
    ):
        """height_fn(x, y) -> (h, n): terrain as a height function.
        contact_plane_fn(pt, radius) -> (n, d): general per-point contact
        plane (unit normal n, offset d, penetration = radius - (n.pt - d))
        — supports vertical features (stair risers) height_fn cannot
        express; when given it takes precedence for contact forces and
        height_fn (if any) is only a fallback.
        plane_refresh: re-evaluate contact_plane_fn before EVERY substep on
        the fused path (faithful stair-edge behavior) instead of freezing
        the control-step-start planes."""
        self.model = model
        self.params = params
        self.height_fn = height_fn
        self.contact_plane_fn = contact_plane_fn
        self.plane_refresh = bool(plane_refresh)
        self._gravity = jnp.asarray(params.gravity, jnp.float32)
        self.contact_params = (
            params.contact
            if params.contact is not None
            else auto_contact_params(
                model, params.dt / params.substeps, mu=params.friction,
                max_depenetration_velocity=params.max_depenetration_velocity,
            )
        )
        self.pair_groups = build_pair_groups(model)
        self._has_pairs = len(model.pair_surf) > 0
        import numpy as _np

        self._has_gravity_comp = bool(_np.any(_np.asarray(model.gravity_comp)))
        self._init_fused()

    _fused_fk_cv = None

    def _init_fused(self):
        """Optional Pallas fused-substep fast path (ops/fused_substep.py):
        used on TPU for eligible scenes; exposed through custom_vmap so the
        batched VecEnv step hits the kernel while unbatched calls fall back
        to the reference implementation. Disable with OIGE_TPU_FUSED=0."""
        import os

        self._fused_cv = None
        flag = os.environ.get("OIGE_TPU_FUSED", "auto")
        if flag == "0":
            return
        try:
            import jax as _jax

            on_tpu = _jax.devices()[0].platform in ("tpu", "axon")
        except Exception:
            on_tpu = False
        from omniisaacgymenvs_tpu.ops import fused_substep as _fs

        if not on_tpu or not _fs.eligible(self.model, self):
            return
        # r2's pair-contact gate is gone: the cube-through-palm divergence
        # was a box inside/outside misclassification on TPU — sqrt(1e-18)
        # rounds to just above 1e-9 under TPU's approximate sqrt, flipping
        # every resting interior point to "outside" (zero force). Fixed by
        # classifying on the squared distance (ops/fused_substep.py box
        # branch); the fused pair path now matches the f64 ground truth
        # more closely than the XLA path on the same chip
        # (tools/debug_groundtruth.py).
        h = self.params.dt / self.params.substeps
        self._has_height = (
            self.height_fn is not None or self.contact_plane_fn is not None
        )
        fused = _fs.build_fused_substep(
            self.model, h, self.params.gravity, self.contact_params,
            has_height=self._has_height,
        )
        m = self.model
        eng = self
        ncp = int(m.cp_body.shape[0])
        self._ncp = ncp

        from jax.custom_batching import custom_vmap

        @custom_vmap
        def substep_cv(q, qd, effort, pos_target, vel_target, f_applied,
                       planes):
            ctrl = Control(
                effort=effort, pos_target=pos_target, vel_target=vel_target,
                body_force=jnp.zeros((m.nb, 3)),
                body_torque=jnp.zeros((m.nb, 3)),
            )
            return eng._substep(q, qd, ctrl, f_applied, h)

        @substep_cv.def_vmap
        def _substep_vmap(axis_size, in_batched, q, qd, e, p, v, fa, pl_):
            def bc(x, b, shape):
                return x if b else jnp.broadcast_to(x, (axis_size,) + shape)

            q = bc(q, in_batched[0], (m.nq,))
            qd = bc(qd, in_batched[1], (m.nv,))
            e = bc(e, in_batched[2], (m.njd,))
            p = bc(p, in_batched[3], (m.njd,))
            v = bc(v, in_batched[4], (m.njd,))
            fa = bc(fa, in_batched[5], (m.nb, 6))
            pl_ = bc(pl_, in_batched[6], (ncp, 4))
            out = fused(q, qd, e, p, v, fa, pl_)
            return out, (True, True, True)

        self._fused_cv = substep_cv
        self._fused_kernels = {(): fused}

        @custom_vmap
        def fk_cv(q, qd):
            st = eng._report_xla(q, qd, jnp.zeros((m.num_sensors, 6)))
            return st.body_pos, st.body_quat, st.body_avel, st.body_lvel

        @fk_cv.def_vmap
        def _fk_vmap(axis_size, in_batched, q, qd):
            def bc(x, b, shape):
                return x if b else jnp.broadcast_to(x, (axis_size,) + shape)

            q = bc(q, in_batched[0], (m.nq,))
            qd = bc(qd, in_batched[1], (m.nv,))
            return fused.fk(q, qd), (True,) * 4

        self._fused_fk_cv = fk_cv
        self._fused = fused
        self._fused_h = h
        self._fused_step_cvs = {}

    _DR_SHAPES = {
        "damping_scale": ("njd",), "friction_scale": ("nb",),
        "geom_scale": ("nb",), "gravity_delta": (3,),
        "limit_lower_delta": ("njd",), "limit_upper_delta": ("njd",),
        "mass_scale": ("nb",), "stiffness_scale": ("njd",),
        "tendon_stiffness_scale": ("nt",), "tendon_damping_scale": ("nt",),
    }

    def _get_fused_kernel(self, dr_keys: tuple = ()):
        """Fused kernel specialized to a DR-overlay key-set (extra per-env
        inputs; params not randomized stay trace-time constants)."""
        k = self._fused_kernels.get(dr_keys)
        if k is None:
            from omniisaacgymenvs_tpu.ops import fused_substep as _fs

            k = _fs.build_fused_substep(
                self.model, self._fused_h, self.params.gravity,
                self.contact_params, has_height=self._has_height,
                dr_keys=dr_keys,
            )
            self._fused_kernels[dr_keys] = k
        return k

    def _dr_shape(self, key):
        m = self.model
        return tuple(
            {"njd": m.njd, "nb": m.nb, "nt": m.nt}.get(d, d)
            for d in self._DR_SHAPES[key]
        )

    def _get_fused_step_cv(self, n_steps: int, dr_keys: tuple = ()):
        """custom_vmap over a WHOLE control step (n_steps substeps + report
        FK in one kernel call); cached per (substep count, DR key-set)."""
        cv = self._fused_step_cvs.get((n_steps, dr_keys))
        if cv is not None:
            return cv
        m = self.model
        eng = self
        h = self._fused_h
        fused = self._get_fused_kernel(dr_keys)

        from jax.custom_batching import custom_vmap

        ncp = self._ncp

        @custom_vmap
        def step_cv(q, qd, effort, pos_target, vel_target, f_applied,
                    planes, *dr_vals):
            ctrl = Control(
                effort=effort, pos_target=pos_target, vel_target=vel_target,
                body_force=jnp.zeros((m.nb, 3)),
                body_torque=jnp.zeros((m.nb, 3)),
            )
            overlay = dict(zip(dr_keys, dr_vals)) or None

            def body(carry, _):
                q, qd, _sf = carry
                return eng._substep(q, qd, ctrl, f_applied, h, overlay), None

            init = (q, qd, jnp.zeros((max(m.num_sensors, 0), 6)))
            (q, qd, sf), _ = jax.lax.scan(body, init, None, length=n_steps)
            st = eng._report_xla(q, qd, sf)
            return (q, qd, sf, st.body_pos, st.body_quat, st.body_avel,
                    st.body_lvel)

        @step_cv.def_vmap
        def _step_vmap(axis_size, in_batched, q, qd, e, p, v, fa, pl_,
                       *dr_vals):
            def bc(x, b, shape):
                return x if b else jnp.broadcast_to(x, (axis_size,) + shape)

            q = bc(q, in_batched[0], (m.nq,))
            qd = bc(qd, in_batched[1], (m.nv,))
            e = bc(e, in_batched[2], (m.njd,))
            p = bc(p, in_batched[3], (m.njd,))
            v = bc(v, in_batched[4], (m.njd,))
            fa = bc(fa, in_batched[5], (m.nb, 6))
            pl_ = bc(pl_, in_batched[6], (ncp, 4))
            dr = tuple(
                bc(x, b, eng._dr_shape(key))
                for x, b, key in zip(dr_vals, in_batched[7:], dr_keys)
            )
            out = fused.step(q, qd, e, p, v, fa, n_steps, planes=pl_, dr=dr)
            return out, (True,) * 7

        self._fused_step_cvs[(n_steps, dr_keys)] = step_cv
        return step_cv

    # ------------------------------------------------------------------
    def default_control(self) -> Control:
        m = self.model
        return Control(
            effort=jnp.zeros(m.njd),
            pos_target=jnp.zeros(m.njd),
            vel_target=jnp.zeros(m.njd),
            body_force=jnp.zeros((m.nb, 3)),
            body_torque=jnp.zeros((m.nb, 3)),
        )

    # ------------------------------------------------------------------
    def _report(self, q, qd, sensor_forces) -> State:
        if self._fused_fk_cv is not None:
            pos, quat, avel, lvel = self._fused_fk_cv(q, qd)
            return State(
                q=q, qd=qd, body_pos=pos, body_quat=quat,
                body_lvel=lvel, body_avel=avel,
                sensor_forces=sensor_forces,
            )
        return self._report_xla(q, qd, sensor_forces)

    def _report_xla(self, q, qd, sensor_forces) -> State:
        """Fresh FK to fill the derived world-frame fields."""
        with jax.default_matmul_precision("float32"):
            return self._report_xla_inner(q, qd, sensor_forces)

    def _report_xla_inner(self, q, qd, sensor_forces) -> State:
        kin = dynamics.kinematics(self.model, q, qd)
        avel, lvel = dynamics.world_velocities(self.model, kin)
        return State(
            q=q,
            qd=qd,
            body_pos=kin.pw,
            body_quat=rot.rotmat_to_quat(kin.Rw),
            body_lvel=lvel,
            body_avel=avel,
            sensor_forces=sensor_forces,
        )

    def init_state(self, q: Optional[jax.Array] = None,
                   qd: Optional[jax.Array] = None) -> State:
        m = self.model
        if q is None:
            q = m.default_q
        if qd is None:
            qd = jnp.zeros(m.nv)
        return self._report(q, qd, jnp.zeros((max(m.num_sensors, 0), 6)))

    # ------------------------------------------------------------------
    def _contact_planes(self, state: State) -> jax.Array:
        """Per-contact-point terrain contact plane [n (unit), d] with
        penetration = radius - (n.pt - d), sampled at the control-step-start
        contact point positions. The fused kernel freezes these planes over
        the substeps of one control step (ops/fused_substep.py): feet move
        O(mm) per control step so the local plane tracks the terrain.
        With contact_plane_fn the task selects the nearest local feature
        (stair tread OR vertical riser wall — tasks/anymal_terrain.py);
        with only height_fn the plane is anchored at the sampled height.
        Returns zeros when there is no terrain (flat ground z=0)."""
        m = self.model
        ncp = int(m.cp_body.shape[0])
        if (self.height_fn is None and self.contact_plane_fn is None) \
                or ncp == 0:
            return jnp.zeros((ncp, 4))
        cb = m.cp_body
        R = rot.quat_to_rotmat(state.body_quat[cb])
        pt = state.body_pos[cb] + jnp.einsum("cij,cj->ci", R, m.cp_pos)
        if self.contact_plane_fn is not None:
            n, d = self.contact_plane_fn(pt, m.cp_radius)
        else:
            h, n = self.height_fn(pt[..., 0], pt[..., 1])
            anchor = jnp.stack([pt[..., 0], pt[..., 1], h], axis=-1)
            d = jnp.sum(n * anchor, axis=-1)
        return jnp.concatenate([n, d[..., None]], axis=-1)

    # ------------------------------------------------------------------
    def _substep(self, q, qd, control: Control, f_applied, h, overlay=None):
        """One integrator substep: FK -> contacts -> drives -> ABA ->
        integrate. Returns (q, qd, sensor_forces).

        overlay: optional per-env domain-randomization parameter pytree
        (mass_scale (nb,), stiffness_scale/damping_scale (njd,),
        friction_scale (), gravity_delta (3,)) — traced parameter
        perturbation replacing the reference's replicator-graph DR
        (utils/domain_randomization.py)."""
        # full-f32 matmul precision: XLA's DEFAULT runs the FK/contact
        # einsums as single-pass bf16 on the TPU MXU, which costs ~3
        # decimal digits on positions that contact penetrations (sub-mm)
        # are computed from — measured 100x worse dqd error vs the f64
        # ground truth than with f32 precision (tools/debug_groundtruth)
        with jax.default_matmul_precision("float32"):
            return self._substep_inner(q, qd, control, f_applied, h, overlay)

    def _substep_inner(self, q, qd, control, f_applied, h, overlay=None):
        m = self.model
        ov = overlay or {}
        cparams = self.contact_params
        mu_scale = ov.get("friction_scale")   # (nb,) per-body
        geom_scale = ov.get("geom_scale")     # (nb,) per-body
        gravity = self._gravity
        if "gravity_delta" in ov:
            gravity = gravity + ov["gravity_delta"]
        kin = dynamics.kinematics(m, q, qd)
        avel, lvel = dynamics.world_velocities(m, kin)
        Rw = kin.Rw
        pw = kin.pw
        cres = plane_contacts(
            m, pw, Rw, avel, lvel, cparams, self.height_fn,
            mu_scale=mu_scale, geom_scale=geom_scale,
            plane_fn=self.contact_plane_fn,
        )
        f_contact = cres.f_ext
        if self._has_pairs:
            f_contact = f_contact + pair_contacts(
                m, self.pair_groups, pw, Rw, avel, lvel, cparams,
                mu_scale=mu_scale, geom_scale=geom_scale,
            )
        f_ext = f_contact + f_applied
        if self._has_gravity_comp:
            # counter-gravity at each compensated body's CoM (reference
            # shadow_hand.py set_shadow_hand_properties DisableGravity)
            mscale = ov.get("mass_scale", 1.0)
            fg = -(m.gravity_comp * m.body_mass * mscale)[:, None] * gravity
            com_w = pw + jnp.einsum("kij,kj->ki", Rw, m.body_com)
            ng = jnp.cross(com_w - pw, fg)
            f_ext = f_ext + jnp.concatenate([ng, fg], axis=-1)
        tau = dynamics.drive_torques(
            m, q, qd, control, h,
            stiffness_scale=ov.get("stiffness_scale"),
            damping_scale=ov.get("damping_scale"),
            tendon_stiffness_scale=ov.get("tendon_stiffness_scale"),
            tendon_damping_scale=ov.get("tendon_damping_scale"),
        )
        qdd = dynamics.aba(
            m, q, qd, tau, f_ext, kin, gravity, h,
            mass_scale=ov.get("mass_scale"),
            tendon_stiffness_scale=ov.get("tendon_stiffness_scale"),
            tendon_damping_scale=ov.get("tendon_damping_scale"),
        )
        lim_lo = lim_hi = None
        if "limit_lower_delta" in ov:
            lim_lo = m.dof_limit_lower + ov["limit_lower_delta"]
        if "limit_upper_delta" in ov:
            lim_hi = m.dof_limit_upper + ov["limit_upper_delta"]
        q, qd = dynamics.integrate(
            m, q, qd, qdd, h, limit_lower=lim_lo, limit_upper=lim_hi
        )
        if m.num_sensors:
            sb = jnp.asarray(m.sensor_body)
            # wrench = all contact forces (ground + pairwise) on the body,
            # [force(3), torque(3)] world (reference get_force_sensor_forces)
            sensor_forces = jnp.concatenate(
                [f_contact[sb, 3:6], f_contact[sb, 0:3]], axis=-1
            )
        else:
            sensor_forces = jnp.zeros((0, 6))
        return q, qd, sensor_forces

    def step_n(self, state: State, control: Control, n: int = 1,
               overlay=None) -> State:
        """Advance n control steps under constant control (the reference's
        `for _ in range(control_frequency_inv): world.step()`,
        envs/vec_env_rlgames.py:64-66) — rolled into a lax.scan so the
        compiled program stays small regardless of substeps x decimation."""
        m = self.model
        h = self.params.dt / self.params.substeps
        f_applied = jnp.concatenate(
            [control.body_torque, control.body_force], axis=-1
        )

        use_fused = self._fused_cv is not None

        if use_fused:
            # DR overlays ride the kernel as extra per-env inputs; the
            # kernel variant is specialized per overlay key-set
            dr_keys = tuple(sorted(overlay)) if overlay else ()
            dr_vals = tuple(overlay[k] for k in dr_keys)
            if self.plane_refresh and self.contact_plane_fn is not None:
                # per-substep contact-plane refresh: re-select the local
                # terrain feature (tread vs riser wall) from the CURRENT
                # contact-point positions before every substep, instead of
                # freezing the control-step-start planes over all
                # substeps x decimation. Matters exactly where the feature
                # CHANGES under the foot — stair edges: a foot crossing a
                # cell boundary mid-control-step otherwise keeps a stale
                # plane for up to decimation x dt (20 ms at AnymalTerrain's
                # rates, ~2 cm of travel vs a 2.5 cm riser margin).
                step1 = self._get_fused_step_cv(1, dr_keys)

                def body(st, _):
                    q, qd, sf, pos, quat, avel, lvel = step1(
                        st.q, st.qd, control.effort, control.pos_target,
                        control.vel_target, f_applied,
                        self._contact_planes(st), *dr_vals,
                    )
                    return State(
                        q=q, qd=qd, body_pos=pos, body_quat=quat,
                        body_lvel=lvel, body_avel=avel, sensor_forces=sf,
                    ), None

                # final state carries the LAST substep's sensor forces —
                # same convention as the unfused scan below
                state, _ = jax.lax.scan(
                    body, state, None, length=n * self.params.substeps
                )
                return state
            q, qd, sf, pos, quat, avel, lvel = self._get_fused_step_cv(
                n * self.params.substeps, dr_keys
            )(
                state.q, state.qd, control.effort, control.pos_target,
                control.vel_target, f_applied, self._contact_planes(state),
                *dr_vals,
            )
            return State(
                q=q, qd=qd, body_pos=pos, body_quat=quat,
                body_lvel=lvel, body_avel=avel, sensor_forces=sf,
            )

        def body(carry, _):
            q, qd, _sf = carry
            return self._substep(q, qd, control, f_applied, h, overlay), None

        init = (
            state.q,
            state.qd,
            jnp.zeros((m.num_sensors, 6)),
        )
        (q, qd, sf), _ = jax.lax.scan(
            body, init, None, length=n * self.params.substeps
        )
        return self._report(q, qd, sf)

    def step(self, state: State, control: Control) -> State:
        """Advance one control step (params.substeps integrator substeps)."""
        return self.step_n(state, control, 1)
