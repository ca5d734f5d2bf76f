"""Functional views: the reference's tensor-view API over batched states.

Reference: omni.isaac.core ArticulationView / RigidPrimView (SURVEY.md
§2.3 lists the exact API surface the reference tasks call). Here a view is
a thin, stateless adapter over a batched physics State pytree: getters read
(N, ...) arrays; setters return a NEW state (functional), supporting the
reference's env-indexed partial writes (`indices=`) and dof subsets
(`joint_indices=`) without host syncs.

Views are AXIS-AGNOSTIC: the same view works on a batched (N, ...) state
at the VecEnv layer and on an unbatched per-env State inside the vmapped
task hooks — which is how the tasks consume them (fingertips in the
in-hand tasks, rotors in the flyers, knees/base in Anymal).

Example:
    view = ArticulationView(model)            # whole articulation
    pos, quat = view.get_world_poses(state)
    state = view.set_joint_positions(state, q_new, indices=env_mask)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.physics.model import JointType, Model
from omniisaacgymenvs_tpu.physics.state import State


def _env_select(old, new, indices):
    """Merge `new` into `old` for the envs selected by `indices` (boolean
    mask (N,) or integer index array) — the static-shape replacement for
    the reference's indexed writes."""
    if indices is None:
        return new
    indices = jnp.asarray(indices)
    if indices.dtype == jnp.bool_:
        mask = indices
    else:
        mask = jnp.zeros(old.shape[0], bool).at[indices].set(True)
    return jnp.where(mask.reshape((-1,) + (1,) * (old.ndim - 1)), new, old)


class ArticulationView:
    """View over one articulation tree of a (possibly multi-tree) model."""

    def __init__(self, model: Model, root_body: Optional[str] = None):
        self.model = model
        self._root = (
            model.body_index(root_body) if root_body else model.roots[0]
        )
        assert self._root in model.roots, f"{root_body} is not a root"
        self._free = model.jtype[self._root] == JointType.FREE
        self._qa = model.q_adr[self._root]
        self._va = model.v_adr[self._root]
        tree = model.tree_id[self._root]
        self._dofs = jnp.asarray(
            [
                model.jdof[i]
                for i in range(model.nb)
                if model.tree_id[i] == tree and model.jdof[i] >= 0
            ]
        )

    # -- info ----------------------------------------------------------
    @property
    def num_dof(self) -> int:
        return int(self._dofs.shape[0])

    def get_dof_index(self, name: str) -> int:
        """Position of the named dof within this view's dof list."""
        jd = self.model.dof_index(name)
        return int(jnp.argmax(self._dofs == jd))

    def get_dof_limits(self):
        """(num_dof, 2) — reference get_dof_limits()[0]."""
        return jnp.stack(
            [
                self.model.dof_limit_lower[self._dofs],
                self.model.dof_limit_upper[self._dofs],
            ],
            axis=-1,
        )

    # -- getters (state: batched State) --------------------------------
    def get_world_poses(self, state: State):
        pos = state.body_pos[..., self._root, :]
        quat = state.body_quat[..., self._root, :]
        return pos, quat

    def get_velocities(self, state: State):
        """(N, 6) [linear, angular] world (reference get_velocities)."""
        return jnp.concatenate(
            [state.body_lvel[..., self._root, :],
             state.body_avel[..., self._root, :]],
            axis=-1,
        )

    def get_joint_positions(self, state: State, joint_indices=None):
        idx = self._dofs if joint_indices is None else self._dofs[jnp.asarray(joint_indices)]
        return state.q[..., jnp.asarray(self.model.jq_idx)[idx]]

    def get_joint_velocities(self, state: State, joint_indices=None):
        idx = self._dofs if joint_indices is None else self._dofs[jnp.asarray(joint_indices)]
        return state.qd[..., jnp.asarray(self.model.jv_idx)[idx]]

    def get_force_sensor_forces(self, state: State):
        """(N, num_sensors, 6) (reference _physics_view
        .get_force_sensor_forces)."""
        return state.sensor_forces

    # -- setters (functional) ------------------------------------------
    def set_joint_positions(self, state: State, values, indices=None,
                            joint_indices=None) -> State:
        idx = self._dofs if joint_indices is None else self._dofs[jnp.asarray(joint_indices)]
        qcols = jnp.asarray(self.model.jq_idx)[idx]
        new_q = state.q.at[..., qcols].set(values)
        return state.replace(q=_env_select(state.q, new_q, indices))

    def set_joint_velocities(self, state: State, values, indices=None,
                             joint_indices=None) -> State:
        idx = self._dofs if joint_indices is None else self._dofs[jnp.asarray(joint_indices)]
        vcols = jnp.asarray(self.model.jv_idx)[idx]
        new_qd = state.qd.at[..., vcols].set(values)
        return state.replace(qd=_env_select(state.qd, new_qd, indices))

    def set_world_poses(self, state: State, positions, orientations,
                        indices=None) -> State:
        assert self._free, "fixed-base articulations have no root pose dofs"
        qa = self._qa
        new_q = state.q.at[..., qa : qa + 3].set(positions)
        new_q = new_q.at[..., qa + 3 : qa + 7].set(orientations)
        return state.replace(q=_env_select(state.q, new_q, indices))

    def set_velocities(self, state: State, velocities, indices=None) -> State:
        """velocities: (N, 6) [linear, angular] world -> body frame root."""
        assert self._free
        qa, va = self._qa, self._va
        quat = state.q[..., qa + 3 : qa + 7]
        v_b = rot.quat_rotate_inverse(quat, velocities[:, 0:3])
        w_b = rot.quat_rotate_inverse(quat, velocities[:, 3:6])
        new_qd = state.qd.at[..., va : va + 3].set(w_b)
        new_qd = new_qd.at[..., va + 3 : va + 6].set(v_b)
        return state.replace(qd=_env_select(state.qd, new_qd, indices))


class RigidPrimView:
    """View over a set of bodies (reference RigidPrimView — rotors,
    fingertips, free objects)."""

    def __init__(self, model: Model, body_names: Sequence[str]):
        self.model = model
        self._bodies = jnp.asarray(
            [model.body_index(n) for n in body_names]
        )

    def get_world_poses(self, state: State):
        return (
            state.body_pos[..., self._bodies, :],
            state.body_quat[..., self._bodies, :],
        )

    def get_velocities(self, state: State):
        return jnp.concatenate(
            [state.body_lvel[..., self._bodies, :],
             state.body_avel[..., self._bodies, :]],
            axis=-1,
        )

    def apply_forces(self, control, forces, is_global: bool = True,
                     state: Optional[State] = None):
        """Accumulate per-body external forces into a Control
        (reference apply_forces; is_global=False takes body-local forces
        and needs `state` for the rotation)."""
        if not is_global:
            assert state is not None
            quats = state.body_quat[..., self._bodies, :]
            forces = rot.quat_rotate(quats, forces)
        bf = control.body_force.at[..., self._bodies, :].add(forces)
        return control.replace(body_force=bf)
