"""Articulation model specification.

Replaces the reference's opaque USD robot assets (reference
robots/articulations/*.py reference Nucleus .usd files, e.g.
robots/articulations/cartpole.py:39-66) with explicit in-code model data:
joint tree, inertias, limits, drives, and collision geometry.

Design notes (TPU-first):
  * Model structure (tree topology, joint types) is static Python metadata —
    it shapes the unrolled trace of the dynamics; numeric parameters are
    jnp arrays closed over by the jitted step.
  * Non-root joints are single-dof (revolute/prismatic). Multi-dof joints are
    authored as chains of 1-dof joints through near-massless intermediate
    bodies (the same convention MJCF compiles to). The root joint is FREE
    (floating base, 7q/6v) or FIXED (0 dof).
  * Collision geometry is compiled to a flat list of contact *points*
    (sphere centers with radii: spheres 1 pt, capsules 2, boxes 8 corners)
    so plane/heightfield collision is a fully static-shape batched test.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class JointType(enum.IntEnum):
    FREE = 0
    REVOLUTE = 1
    PRISMATIC = 2
    FIXED = 3


@dataclasses.dataclass(frozen=True)
class Model:
    """Frozen articulation model. Numeric fields are jnp arrays used as
    closure constants by the engine; structural fields are Python data."""

    name: str
    # --- structure (static) ---
    nb: int                      # number of bodies (body 0 = root)
    nq: int                      # generalized position dim
    nv: int                      # generalized velocity dim
    root_free: bool              # True: floating base (q[0:7], qd[0:6])
    parents: Tuple[int, ...]     # parent body index per body (root: -1)
    jtype: Tuple[int, ...]       # JointType per body (root: FREE/FIXED)
    body_names: Tuple[str, ...]
    dof_names: Tuple[str, ...]   # joint dof names (len nv - root dofs)
    # --- joint geometry / numerics ---
    joint_axis: jnp.ndarray      # (nb, 3) axis in child coords (unit)
    joint_pos: jnp.ndarray       # (nb, 3) joint frame origin in parent coords
    joint_Et: jnp.ndarray        # (nb, 3, 3) fixed rot: parent->joint coords
    # --- body inertial ---
    body_mass: jnp.ndarray       # (nb,)
    body_com: jnp.ndarray        # (nb, 3)
    body_inertia: jnp.ndarray    # (nb, 3, 3) about CoM, body coords
    # --- per joint dof (njd = nb - 1), aligned with q[jq0:] / qd[jd0:] ---
    dof_limit_lower: jnp.ndarray  # (njd,)
    dof_limit_upper: jnp.ndarray  # (njd,)
    dof_armature: jnp.ndarray     # (njd,)
    dof_damping: jnp.ndarray      # (njd,) passive damping
    dof_friction: jnp.ndarray     # (njd,) dry friction torque
    dof_stiffness: jnp.ndarray    # (njd,) drive Kp
    dof_drive_damping: jnp.ndarray  # (njd,) drive Kd
    dof_max_effort: jnp.ndarray   # (njd,) drive force clamp
    dof_max_velocity: jnp.ndarray  # (njd,)
    # --- contact points ---
    cp_body: jnp.ndarray         # (ncp,) int32 body index per contact point
    cp_pos: jnp.ndarray          # (ncp, 3) point in body coords
    cp_radius: jnp.ndarray       # (ncp,)
    cp_friction: jnp.ndarray     # (ncp,) friction coefficient
    # --- force sensors: aggregate contact wrench per sensor body ---
    sensor_body: Tuple[int, ...]
    # --- default pose ---
    default_q: jnp.ndarray       # (nq,)

    @property
    def jd0(self) -> int:
        """First joint-dof index in qd."""
        return 6 if self.root_free else 0

    @property
    def jq0(self) -> int:
        """First joint-coordinate index in q."""
        return 7 if self.root_free else 0

    @property
    def njd(self) -> int:
        return self.nb - 1

    @property
    def num_sensors(self) -> int:
        return len(self.sensor_body)

    def dof_index(self, name: str) -> int:
        """Joint-dof index by name (reference ArticulationView.get_dof_index,
        used e.g. in tasks/cartpole.py:137-138)."""
        return self.dof_names.index(name)

    def body_index(self, name: str) -> int:
        return self.body_names.index(name)


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
        self._sensors: List[int] = []
        self._root_default_q: Optional[np.ndarray] = None

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
    ) -> int:
        """Add a body connected to `parent` by a joint. Returns body index.

        `inertia` may be a 3-vector (diagonal) or 3x3 matrix, about the CoM.
        The first body added must be the root (parent=-1, joint_type FREE or
        FIXED).
        """
        idx = len(self._bodies)
        if idx == 0:
            assert parent == -1 and joint_type in (JointType.FREE, JointType.FIXED)
        else:
            assert 0 <= parent < idx, "bodies must be added in topological order"
            assert joint_type in (JointType.REVOLUTE, JointType.PRISMATIC)
        inertia = np.asarray(inertia, dtype=np.float64)
        if inertia.ndim == 1:
            inertia = np.diag(inertia)
        axis = np.asarray(joint_axis, dtype=np.float64)
        n = np.linalg.norm(axis)
        axis = axis / n if n > 0 else axis
        self._bodies.append(
            _BodySpec(
                name=name,
                parent=parent,
                jtype=joint_type,
                axis=axis,
                joint_pos=np.asarray(joint_pos, dtype=np.float64),
                joint_quat=np.asarray(joint_quat, dtype=np.float64),
                mass=float(mass),
                com=np.asarray(com, dtype=np.float64),
                inertia=inertia,
                limit=limit,
                armature=armature,
                damping=damping,
                friction=friction,
                stiffness=stiffness,
                drive_damping=drive_damping,
                max_effort=max_effort,
                max_velocity=max_velocity,
                default_q=default_q,
            )
        )
        return idx

    # ------------------------------------------------------------------
    def add_sphere_collider(self, body: int, pos, radius: float, friction: float = 1.0):
        self._cp.append((body, np.asarray(pos, dtype=np.float64), radius, friction))

    def add_capsule_collider(
        self, body: int, p0, p1, radius: float, friction: float = 1.0,
        n_extra: int = 0,
    ):
        """Capsule by endcap centers; contacts at the endcap spheres (plus
        optional evenly spaced intermediate points)."""
        p0 = np.asarray(p0, dtype=np.float64)
        p1 = np.asarray(p1, dtype=np.float64)
        for t in np.linspace(0.0, 1.0, 2 + n_extra):
            self._cp.append((body, p0 + t * (p1 - p0), radius, friction))

    def add_box_collider(self, body: int, pos, half_extents, friction: float = 1.0,
                         quat=(1.0, 0.0, 0.0, 0.0)):
        """Box by center + half extents; contacts at the 8 corners."""
        pos = np.asarray(pos, dtype=np.float64)
        h = np.asarray(half_extents, dtype=np.float64)
        R = _quat_to_mat_np(np.asarray(quat, dtype=np.float64))
        for sx in (-1, 1):
            for sy in (-1, 1):
                for sz in (-1, 1):
                    corner = pos + R @ (h * np.array([sx, sy, sz]))
                    self._cp.append((body, corner, 0.0, friction))

    def add_force_sensor(self, body: int):
        """Register a contact wrench sensor on `body` (reference:
        get_force_sensor_forces, tasks/shared/locomotion.py:89)."""
        self._sensors.append(body)

    def set_root_default(self, pos=(0, 0, 0), quat=(1, 0, 0, 0)):
        self._root_default_q = np.concatenate(
            [np.asarray(pos, np.float64), np.asarray(quat, np.float64)]
        )

    # ------------------------------------------------------------------
    def finalize(self, dtype=jnp.float32) -> Model:
        bodies = self._bodies
        nb = len(bodies)
        root_free = bodies[0].jtype == JointType.FREE
        jd0 = 6 if root_free else 0
        jq0 = 7 if root_free else 0
        njd = nb - 1
        nq = jq0 + njd
        nv = jd0 + njd

        def arr(fn, shape_tail=()):
            out = np.zeros((nb,) + shape_tail)
            for i, b in enumerate(bodies):
                out[i] = fn(b)
            return out

        joint_axis = arr(lambda b: b.axis, (3,))
        joint_pos = arr(lambda b: b.joint_pos, (3,))
        # Et: parent coords -> joint(child zero-pose) coords = R_offset^T
        joint_Et = arr(lambda b: _quat_to_mat_np(b.joint_quat).T, (3, 3))
        body_mass = arr(lambda b: b.mass)
        body_com = arr(lambda b: b.com, (3,))
        body_inertia = arr(lambda b: b.inertia, (3, 3))

        jb = bodies[1:]
        default_q = np.zeros(nq)
        if root_free:
            default_q[:7] = (
                self._root_default_q
                if self._root_default_q is not None
                else np.array([0, 0, 0, 1, 0, 0, 0], dtype=np.float64)
            )
        default_q[jq0:] = [b.default_q for b in jb]

        cp_body = np.array([c[0] for c in self._cp], dtype=np.int32)
        cp_pos = (
            np.stack([c[1] for c in self._cp])
            if self._cp
            else np.zeros((0, 3))
        )
        cp_radius = np.array([c[2] for c in self._cp])
        cp_friction = np.array([c[3] for c in self._cp])

        return Model(
            name=self.name,
            nb=nb,
            nq=nq,
            nv=nv,
            root_free=root_free,
            parents=tuple(b.parent for b in bodies),
            jtype=tuple(int(b.jtype) for b in bodies),
            body_names=tuple(b.name for b in bodies),
            dof_names=tuple(b.name for b in jb),
            joint_axis=jnp.asarray(joint_axis, dtype),
            joint_pos=jnp.asarray(joint_pos, dtype),
            joint_Et=jnp.asarray(joint_Et, dtype),
            body_mass=jnp.asarray(body_mass, dtype),
            body_com=jnp.asarray(body_com, dtype),
            body_inertia=jnp.asarray(body_inertia, dtype),
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
            sensor_body=tuple(self._sensors),
            default_q=jnp.asarray(default_q, dtype),
        )
