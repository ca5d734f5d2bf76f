"""Articulation model specification.

Replaces the reference's opaque USD robot assets (reference
robots/articulations/*.py reference Nucleus .usd files, e.g.
robots/articulations/cartpole.py:39-66) with explicit in-code model data:
joint tree, inertias, limits, drives, and collision geometry.

Design notes (TPU-first):
  * Model structure (tree topology, joint types) is static Python metadata —
    it shapes the unrolled trace of the dynamics; numeric parameters are
    jnp arrays closed over by the jitted step.
  * A model is a FOREST: any body with parent=-1 is a root (FREE floating
    base with 7q/6v, or FIXED). This is how multi-actor scenes (tray+ball,
    franka+cabinet, hand+object — reference scenes with several USD actors
    per env) compile into one state vector per env.
  * Non-root joints are single-dof (revolute/prismatic). Multi-dof joints
    are authored as chains of 1-dof joints through near-massless
    intermediate bodies (the same convention MJCF compiles to).
  * Collision geometry compiles to (a) a flat list of contact *points*
    (sphere centers with radii) tested against the ground plane/heightfield
    and (b) receiver *surfaces* (spheres/capsules/boxes) tested against the
    points of OTHER trees — all static-shape batched tests.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class JointType(enum.IntEnum):
    FREE = 0
    REVOLUTE = 1
    PRISMATIC = 2
    FIXED = 3


class SurfaceType(enum.IntEnum):
    SPHERE = 0
    CAPSULE = 1
    BOX = 2


@dataclasses.dataclass(frozen=True)
class Model:
    """Frozen articulation model. Numeric fields are jnp arrays used as
    closure constants by the engine; structural fields are Python data."""

    name: str
    # --- structure (static) ---
    nb: int                      # number of bodies
    nq: int                      # generalized position dim
    nv: int                      # generalized velocity dim
    njd: int                     # number of 1-dof joints
    parents: Tuple[int, ...]     # parent body index per body (roots: -1)
    jtype: Tuple[int, ...]       # JointType per body
    q_adr: Tuple[int, ...]       # start index into q per body
    v_adr: Tuple[int, ...]       # start index into qd per body
    jdof: Tuple[int, ...]        # joint-dof index per body (-1 for roots)
    tree_id: Tuple[int, ...]     # which tree (root) each body belongs to
    roots: Tuple[int, ...]       # body indices of the roots
    # non-root bodies grouped by tree depth (ascending) — the level-batched
    # dynamics processes one level at a time with all its bodies batched
    levels: Tuple[Tuple[int, ...], ...]
    body_names: Tuple[str, ...]
    dof_names: Tuple[str, ...]   # 1-dof joint names, joint order
    # --- joint geometry / numerics ---
    joint_axis: jnp.ndarray      # (nb, 3) axis in child coords (unit)
    joint_pos: jnp.ndarray       # (nb, 3) joint frame origin in parent coords
    joint_Et: jnp.ndarray        # (nb, 3, 3) fixed rot: parent->joint coords
    # --- body inertial ---
    body_mass: jnp.ndarray       # (nb,)
    body_com: jnp.ndarray        # (nb, 3)
    body_inertia: jnp.ndarray    # (nb, 3, 3) about CoM, body coords
    # --- per joint dof (njd,), joint order; q[jq_idx] <-> qd[jv_idx] ---
    jq_idx: jnp.ndarray          # (njd,) int32 indices into q
    jv_idx: jnp.ndarray          # (njd,) int32 indices into qd
    dof_limit_lower: jnp.ndarray
    dof_limit_upper: jnp.ndarray
    dof_armature: jnp.ndarray
    dof_damping: jnp.ndarray
    dof_friction: jnp.ndarray
    dof_stiffness: jnp.ndarray
    dof_drive_damping: jnp.ndarray
    dof_max_effort: jnp.ndarray
    dof_max_velocity: jnp.ndarray
    # --- contact points (vs plane/heightfield and other-tree surfaces) ---
    cp_body: jnp.ndarray         # (ncp,) int32 body index per contact point
    cp_pos: jnp.ndarray          # (ncp, 3) point in body coords
    cp_radius: jnp.ndarray       # (ncp,)
    cp_friction: jnp.ndarray     # (ncp,)
    # --- receiver surfaces (point-vs-surface pairwise contacts) ---
    surf_type: Tuple[int, ...]   # SurfaceType per surface (static)
    surf_body: Tuple[int, ...]   # body index per surface (static)
    surf_params: Tuple[tuple, ...]  # per-surface geometry (static floats)
    # precomputed cross-tree (point, surface) candidate pairs
    pair_point: jnp.ndarray      # (npair,) int32 index into cp_*
    pair_surf: Tuple[int, ...]   # (npair,) surface index (static)
    # --- fixed tendons: force-level joint coupling (reference
    # views/shadow_hand_view.py:71-73 set_fixed_tendon_properties) ---
    # tendon length L = sum_k coef_k * q_dof_k; generalized force
    # tau_dof_k = -coef_k * (k_lim*(L - clip(L, lo, hi)) + k*(L - rest)
    #                        + c*Ldot)
    nt: int                      # number of fixed tendons
    tendon_dof: jnp.ndarray      # (nt, 2) int32 coupled joint-dof indices
    tendon_coef: jnp.ndarray     # (nt, 2) length coefficients
    tendon_rest: jnp.ndarray     # (nt,) spring rest length
    tendon_stiffness: jnp.ndarray        # (nt,) spring about rest
    tendon_damping: jnp.ndarray          # (nt,) on Ldot
    tendon_limit_lower: jnp.ndarray      # (nt,)
    tendon_limit_upper: jnp.ndarray      # (nt,)
    tendon_limit_stiffness: jnp.ndarray  # (nt,) outside [lo, hi]
    # gravity compensation mask (reference shadow_hand.py DisableGravity)
    gravity_comp: jnp.ndarray    # (nb,) 1.0 = body feels no gravity
    # --- force sensors: aggregate contact wrench per sensor body ---
    sensor_body: Tuple[int, ...]
    # --- default pose ---
    default_q: jnp.ndarray       # (nq,)

    # ------------------------------------------------------------------
    @property
    def root_free(self) -> bool:
        """Single-root convenience: is the first root floating?"""
        return self.jtype[self.roots[0]] == JointType.FREE

    @property
    def jd0(self) -> int:
        """First joint-dof index in qd — valid for single-root models where
        the root's dofs lead the vector (the common case)."""
        return 6 if self.root_free else 0

    @property
    def jq0(self) -> int:
        return 7 if self.root_free else 0

    @property
    def num_sensors(self) -> int:
        return len(self.sensor_body)

    def dof_index(self, name: str) -> int:
        """Joint-dof index by name (reference ArticulationView.get_dof_index,
        used e.g. in tasks/cartpole.py:137-138)."""
        return self.dof_names.index(name)

    def body_index(self, name: str) -> int:
        return self.body_names.index(name)

    def root_q_adr(self, body_name: str) -> int:
        """Start of a FREE root's 7 coords [pos, quat] in q."""
        i = self.body_index(body_name)
        assert self.jtype[i] == JointType.FREE
        return self.q_adr[i]

    def root_v_adr(self, body_name: str) -> int:
        i = self.body_index(body_name)
        assert self.jtype[i] == JointType.FREE
        return self.v_adr[i]


@dataclasses.dataclass
class _BodySpec:
    name: str
    parent: int
    jtype: JointType
    axis: np.ndarray
    joint_pos: np.ndarray
    joint_quat: np.ndarray
    mass: float
    com: np.ndarray
    inertia: np.ndarray
    limit: Tuple[float, float]
    armature: float
    damping: float
    friction: float
    stiffness: float
    drive_damping: float
    max_effort: float
    max_velocity: float
    default_q: float
    default_pose: Optional[np.ndarray]  # roots: 7-vector [pos, quat]
    gravity_comp: bool


def _quat_to_mat_np(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


class ModelBuilder:
    """Imperative builder; `finalize()` freezes into a Model."""

    def __init__(self, name: str):
        self.name = name
        self._bodies: List[_BodySpec] = []
        self._cp: List[Tuple[int, np.ndarray, float, float]] = []
        # (type, body, params, self_only): self_only surfaces pair ONLY with
        # same-tree points (self-collision), not with other trees
        self._surfaces: List[Tuple[int, int, tuple, bool]] = []
        self._sensors: List[int] = []
        # trees (by root body index) with intra-articulation collision
        # enabled (reference per-actor enable_self_collisions,
        # sim_config.py:389-392)
        self._self_collide_roots: set = set()
        # (dof_name_a, dof_name_b, coef_a, coef_b, rest, k, c, lo, hi, k_lim)
        self._tendons: List[tuple] = []

    # ------------------------------------------------------------------
    def add_body(
        self,
        name: str,
        parent: int = -1,
        joint_type: JointType = JointType.REVOLUTE,
        joint_axis: Sequence[float] = (0.0, 0.0, 1.0),
        joint_pos: Sequence[float] = (0.0, 0.0, 0.0),
        joint_quat: Sequence[float] = (1.0, 0.0, 0.0, 0.0),
        mass: float = 1.0,
        com: Sequence[float] = (0.0, 0.0, 0.0),
        inertia: Sequence[float] = (0.01, 0.01, 0.01),
        limit: Tuple[float, float] = (-1e9, 1e9),
        armature: float = 0.0,
        damping: float = 0.0,
        friction: float = 0.0,
        stiffness: float = 0.0,
        drive_damping: float = 0.0,
        max_effort: float = 1e9,
        max_velocity: float = 1e9,
        default_q: float = 0.0,
        default_pos: Sequence[float] = (0.0, 0.0, 0.0),
        default_quat: Sequence[float] = (1.0, 0.0, 0.0, 0.0),
        gravity_comp: bool = False,
    ) -> int:
        """Add a body. parent=-1 adds a new root (FREE or FIXED); otherwise
        a 1-dof joint (REVOLUTE/PRISMATIC) connects to `parent`. Returns the
        body index. `inertia`: 3-vector diagonal or 3x3 matrix about CoM.
        `default_pos/quat`: initial world pose for FREE roots."""
        idx = len(self._bodies)
        if parent == -1:
            assert joint_type in (JointType.FREE, JointType.FIXED)
        else:
            assert 0 <= parent < idx, "bodies must be added in topological order"
            assert joint_type in (JointType.REVOLUTE, JointType.PRISMATIC)
        inertia = np.asarray(inertia, dtype=np.float64)
        if inertia.ndim == 1:
            inertia = np.diag(inertia)
        axis = np.asarray(joint_axis, dtype=np.float64)
        n = np.linalg.norm(axis)
        axis = axis / n if n > 0 else axis
        default_pose = None
        if parent == -1 and joint_type == JointType.FREE:
            default_pose = np.concatenate(
                [np.asarray(default_pos, np.float64),
                 np.asarray(default_quat, np.float64)]
            )
        self._bodies.append(
            _BodySpec(
                name=name, parent=parent, jtype=joint_type, axis=axis,
                joint_pos=np.asarray(joint_pos, dtype=np.float64),
                joint_quat=np.asarray(joint_quat, dtype=np.float64),
                mass=float(mass), com=np.asarray(com, dtype=np.float64),
                inertia=inertia, limit=limit, armature=armature,
                damping=damping, friction=friction, stiffness=stiffness,
                drive_damping=drive_damping, max_effort=max_effort,
                max_velocity=max_velocity, default_q=default_q,
                default_pose=default_pose, gravity_comp=gravity_comp,
            )
        )
        return idx

    # ------------------------------------------------------------------
    def add_sphere_collider(self, body: int, pos, radius: float,
                            friction: float = 1.0, receive: bool = False,
                            receive_self: bool = False):
        self._cp.append((body, np.asarray(pos, dtype=np.float64), radius, friction))
        if receive or receive_self:
            self._surfaces.append(
                (int(SurfaceType.SPHERE), body,
                 tuple(np.asarray(pos, float)) + (float(radius),),
                 not receive)
            )

    def add_capsule_collider(
        self, body: int, p0, p1, radius: float, friction: float = 1.0,
        n_extra: int = 0, receive: bool = False,
        receive_self: bool = False,
    ):
        """Capsule by endcap centers; contact points at the endcap spheres
        (plus optional intermediate points); optionally also a receiver
        surface for other trees' points (receive=True) or for same-tree
        self-collision only (receive_self=True)."""
        p0 = np.asarray(p0, dtype=np.float64)
        p1 = np.asarray(p1, dtype=np.float64)
        for t in np.linspace(0.0, 1.0, 2 + n_extra):
            self._cp.append((body, p0 + t * (p1 - p0), radius, friction))
        if receive or receive_self:
            self._surfaces.append(
                (int(SurfaceType.CAPSULE), body,
                 tuple(p0) + tuple(p1) + (float(radius),),
                 not receive)
            )

    def add_box_collider(self, body: int, pos, half_extents,
                         friction: float = 1.0, quat=(1.0, 0.0, 0.0, 0.0),
                         receive: bool = False, dense: bool = False,
                         receive_self: bool = False):
        """Box by center + half extents; contact points at the 8 corners
        (dense=True adds the 12 edge midpoints and 6 face centers — needed
        when the box must rest stably on SMALL surfaces it can straddle,
        e.g. the in-hand cube on the ShadowHand palm: with corners only, a
        straddling pose has no point over the support and the nearest-face
        push-out walks the box through the palm's side faces); optionally a
        receiver surface (axis-aligned in body frame after quat)."""
        pos = np.asarray(pos, dtype=np.float64)
        h = np.asarray(half_extents, dtype=np.float64)
        R = _quat_to_mat_np(np.asarray(quat, dtype=np.float64))
        signs = [-1, 0, 1] if dense else [-1, 1]
        for sx in signs:
            for sy in signs:
                for sz in signs:
                    if sx == sy == sz == 0:
                        continue
                    corner = pos + R @ (h * np.array([sx, sy, sz]))
                    self._cp.append((body, corner, 0.0, friction))
        if receive or receive_self:
            self._surfaces.append(
                (int(SurfaceType.BOX), body,
                 tuple(pos) + tuple(h) + tuple(np.asarray(quat, float)),
                 not receive)
            )

    def add_contact_point(self, body: int, pos, radius: float = 0.0,
                          friction: float = 1.0):
        """Raw contact point (e.g. fingertip pad)."""
        self._cp.append((body, np.asarray(pos, dtype=np.float64), radius, friction))

    def add_force_sensor(self, body: int):
        """Register a contact wrench sensor on `body` (reference:
        get_force_sensor_forces, tasks/shared/locomotion.py:89)."""
        self._sensors.append(body)

    @property
    def dof_names(self) -> List[str]:
        """Names of the 1-dof (revolute/prismatic) joint bodies in
        topological order — the names set_drive accepts (mirrors the
        finalized Model's dof ordering)."""
        return [
            b.name
            for b in self._bodies
            if b.jtype in (JointType.REVOLUTE, JointType.PRISMATIC)
        ]

    def set_drive(
        self,
        dof_name: str,
        stiffness: Optional[float] = None,
        damping: Optional[float] = None,
        max_effort: Optional[float] = None,
        max_velocity: Optional[float] = None,
        armature: Optional[float] = None,
        default_q: Optional[float] = None,
    ):
        """Configure a joint drive by dof name after construction (reference
        tasks/utils/usd_utils.py:71-82 set_drive applies USD DriveAPI
        stiffness/damping/max_force post-hoc to authored assets; the analog
        here for imported URDF/MJCF models whose sources carry no PD gains).
        `damping` sets the DRIVE damping (PhysX drive law), not the passive
        joint damping."""
        for b in self._bodies:
            if b.parent != -1 and b.name == dof_name:
                if stiffness is not None:
                    b.stiffness = float(stiffness)
                if damping is not None:
                    b.drive_damping = float(damping)
                if max_effort is not None:
                    b.max_effort = float(max_effort)
                if max_velocity is not None:
                    b.max_velocity = float(max_velocity)
                if armature is not None:
                    b.armature = float(armature)
                if default_q is not None:
                    b.default_q = float(default_q)
                return
        raise KeyError(f"no dof named {dof_name!r}")

    def add_fixed_tendon(
        self,
        dof_a: str,
        dof_b: str,
        coef: Tuple[float, float] = (1.0, -1.0),
        rest: float = 0.0,
        stiffness: float = 0.0,
        damping: float = 0.0,
        limit: Tuple[float, float] = (0.0, 0.0),
        limit_stiffness: float = 0.0,
    ):
        """Fixed tendon coupling two joint dofs at the FORCE level (PhysX
        fixed tendons; reference views/shadow_hand_view.py:71-73 sets
        limit_stiffness=30, damping=0.1 on the hand's J0<->J1 tendons).
        Tendon length L = coef[0]*q_a + coef[1]*q_b; a spring about `rest`
        (k=stiffness) plus a limit spring outside `limit` (k=limit_stiffness)
        plus damping on Ldot produce tau = -coef * F on both dofs. With the
        default coef (1, -1) and zero limits the coupled dofs are sprung
        toward equal angles — a follower joint driven purely by the leader's
        motion under load, not by mirrored position targets."""
        self._tendons.append(
            (dof_a, dof_b, float(coef[0]), float(coef[1]), float(rest),
             float(stiffness), float(damping), float(limit[0]),
             float(limit[1]), float(limit_stiffness))
        )

    def enable_self_collisions(self, root_body: int = 0):
        """Enable intra-articulation collision for the tree rooted at
        `root_body` (reference per-actor enable_self_collisions,
        sim_config.py:389-392; the hands enable it). Same-tree (point,
        surface) candidate pairs are generated for surfaces marked
        receive/receive_self, excluding same-body and directly-jointed
        parent-child pairs (PhysX's default adjacency filter)."""
        self._self_collide_roots.add(root_body)

    def set_root_default(self, pos=(0, 0, 0), quat=(1, 0, 0, 0), body: int = 0):
        self._bodies[body].default_pose = np.concatenate(
            [np.asarray(pos, np.float64), np.asarray(quat, np.float64)]
        )

    # ------------------------------------------------------------------
    def finalize(self, dtype=jnp.float32) -> Model:
        bodies = self._bodies
        nb = len(bodies)

        # addressing
        q_adr, v_adr, jdof, tree_id, roots = [], [], [], [], []
        dof_names: List[str] = []
        nq = nv = njd = 0
        for i, b in enumerate(bodies):
            q_adr.append(nq)
            v_adr.append(nv)
            if b.parent == -1:
                roots.append(i)
                tree_id.append(len(roots) - 1)
                jdof.append(-1)
                if b.jtype == JointType.FREE:
                    nq += 7
                    nv += 6
            else:
                tree_id.append(tree_id[b.parent])
                jdof.append(njd)
                dof_names.append(b.name)
                nq += 1
                nv += 1
                njd += 1

        def arr(fn, shape_tail=()):
            out = np.zeros((nb,) + shape_tail)
            for i, b in enumerate(bodies):
                out[i] = fn(b)
            return out

        joint_axis = arr(lambda b: b.axis, (3,))
        joint_pos = arr(lambda b: b.joint_pos, (3,))
        joint_Et = arr(lambda b: _quat_to_mat_np(b.joint_quat).T, (3, 3))
        body_mass = arr(lambda b: b.mass)
        body_com = arr(lambda b: b.com, (3,))
        body_inertia = arr(lambda b: b.inertia, (3, 3))

        jb = [b for b in bodies if b.parent != -1]
        jq_idx = np.array(
            [q_adr[i] for i, b in enumerate(bodies) if b.parent != -1],
            dtype=np.int32,
        )
        jv_idx = np.array(
            [v_adr[i] for i, b in enumerate(bodies) if b.parent != -1],
            dtype=np.int32,
        )

        default_q = np.zeros(nq)
        for i, b in enumerate(bodies):
            if b.parent == -1:
                if b.jtype == JointType.FREE:
                    pose = (
                        b.default_pose
                        if b.default_pose is not None
                        else np.array([0, 0, 0, 1, 0, 0, 0], dtype=np.float64)
                    )
                    default_q[q_adr[i] : q_adr[i] + 7] = pose
            else:
                default_q[q_adr[i]] = b.default_q

        # depth levels (non-root bodies)
        depth = [0] * nb
        for i, b in enumerate(bodies):
            depth[i] = 0 if b.parent == -1 else depth[b.parent] + 1
        max_depth = max(depth) if nb else 0
        levels = tuple(
            tuple(i for i in range(nb) if depth[i] == d and bodies[i].parent != -1)
            for d in range(1, max_depth + 1)
        )
        levels = tuple(lvl for lvl in levels if lvl)

        cp_body = np.array([c[0] for c in self._cp], dtype=np.int32)
        cp_pos = (
            np.stack([c[1] for c in self._cp]) if self._cp else np.zeros((0, 3))
        )
        cp_radius = np.array([c[2] for c in self._cp])
        cp_friction = np.array([c[3] for c in self._cp])

        # candidate pairs: every point vs every receive surface of a
        # DIFFERENT tree; plus, for trees with self-collision enabled
        # (reference per-actor enable_self_collisions, sim_config
        # .py:389-392), same-tree pairs against receive/receive_self
        # surfaces excluding same-body and directly-jointed parent-child
        # pairs (PhysX's adjacency filter)
        self_trees = {
            tree_id[r] for r in self._self_collide_roots
        }
        pair_point: List[int] = []
        pair_surf: List[int] = []
        for si, (stype, sbody, sparams, self_only) in enumerate(
            self._surfaces
        ):
            for pi in range(len(self._cp)):
                pbody = int(cp_body[pi])
                if tree_id[pbody] != tree_id[sbody]:
                    if not self_only:
                        pair_point.append(pi)
                        pair_surf.append(si)
                elif tree_id[sbody] in self_trees:
                    if pbody == sbody:
                        continue
                    if (bodies[pbody].parent == sbody
                            or bodies[sbody].parent == pbody):
                        continue
                    pair_point.append(pi)
                    pair_surf.append(si)

        # fixed tendons: resolve dof names -> joint-dof indices
        name_to_jd = {n: i for i, n in enumerate(dof_names)}
        nt = len(self._tendons)
        t_dof = np.zeros((nt, 2), np.int32)
        t_coef = np.zeros((nt, 2))
        t_rest = np.zeros(nt)
        t_k = np.zeros(nt)
        t_c = np.zeros(nt)
        t_lo = np.zeros(nt)
        t_hi = np.zeros(nt)
        t_klim = np.zeros(nt)
        for ti, (da, db, ca, cb, rest, k, c, lo, hi, klim) in enumerate(
            self._tendons
        ):
            t_dof[ti] = (name_to_jd[da], name_to_jd[db])
            t_coef[ti] = (ca, cb)
            t_rest[ti], t_k[ti], t_c[ti] = rest, k, c
            t_lo[ti], t_hi[ti], t_klim[ti] = lo, hi, klim

        return Model(
            name=self.name,
            nb=nb, nq=nq, nv=nv, njd=njd,
            parents=tuple(b.parent for b in bodies),
            jtype=tuple(int(b.jtype) for b in bodies),
            q_adr=tuple(q_adr), v_adr=tuple(v_adr), jdof=tuple(jdof),
            tree_id=tuple(tree_id), roots=tuple(roots), levels=levels,
            body_names=tuple(b.name for b in bodies),
            dof_names=tuple(dof_names),
            joint_axis=jnp.asarray(joint_axis, dtype),
            joint_pos=jnp.asarray(joint_pos, dtype),
            joint_Et=jnp.asarray(joint_Et, dtype),
            body_mass=jnp.asarray(body_mass, dtype),
            body_com=jnp.asarray(body_com, dtype),
            body_inertia=jnp.asarray(body_inertia, dtype),
            jq_idx=jnp.asarray(jq_idx),
            jv_idx=jnp.asarray(jv_idx),
            dof_limit_lower=jnp.asarray([b.limit[0] for b in jb], dtype),
            dof_limit_upper=jnp.asarray([b.limit[1] for b in jb], dtype),
            dof_armature=jnp.asarray([b.armature for b in jb], dtype),
            dof_damping=jnp.asarray([b.damping for b in jb], dtype),
            dof_friction=jnp.asarray([b.friction for b in jb], dtype),
            dof_stiffness=jnp.asarray([b.stiffness for b in jb], dtype),
            dof_drive_damping=jnp.asarray([b.drive_damping for b in jb], dtype),
            dof_max_effort=jnp.asarray([b.max_effort for b in jb], dtype),
            dof_max_velocity=jnp.asarray([b.max_velocity for b in jb], dtype),
            cp_body=jnp.asarray(cp_body),
            cp_pos=jnp.asarray(cp_pos, dtype),
            cp_radius=jnp.asarray(cp_radius, dtype),
            cp_friction=jnp.asarray(cp_friction, dtype),
            surf_type=tuple(sf[0] for sf in self._surfaces),
            surf_body=tuple(sf[1] for sf in self._surfaces),
            surf_params=tuple(sf[2] for sf in self._surfaces),
            pair_point=jnp.asarray(np.asarray(pair_point, dtype=np.int32)),
            pair_surf=tuple(pair_surf),
            nt=nt,
            tendon_dof=jnp.asarray(t_dof),
            tendon_coef=jnp.asarray(t_coef, dtype),
            tendon_rest=jnp.asarray(t_rest, dtype),
            tendon_stiffness=jnp.asarray(t_k, dtype),
            tendon_damping=jnp.asarray(t_c, dtype),
            tendon_limit_lower=jnp.asarray(t_lo, dtype),
            tendon_limit_upper=jnp.asarray(t_hi, dtype),
            tendon_limit_stiffness=jnp.asarray(t_klim, dtype),
            gravity_comp=jnp.asarray(
                [1.0 if b.gravity_comp else 0.0 for b in bodies], dtype
            ),
            sensor_body=tuple(self._sensors),
            default_q=jnp.asarray(default_q, dtype),
        )
