"""Functional view API tests (reference ArticulationView/RigidPrimView
get/set surface, SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.envs.views import ArticulationView, RigidPrimView
from omniisaacgymenvs_tpu.tasks import get_task


def _state(name="Anymal", n=4):
    task = get_task(name)
    env = VecEnv(task, n)
    return task, env.reset(seed=0).phys


def test_articulation_getters():
    task, state = _state()
    view = ArticulationView(task.model)
    assert view.num_dof == 12
    pos, quat = view.get_world_poses(state)
    assert pos.shape == (4, 3) and quat.shape == (4, 4)
    assert view.get_joint_positions(state).shape == (4, 12)
    assert view.get_velocities(state).shape == (4, 6)
    assert view.get_dof_limits().shape == (12, 2)
    assert view.get_dof_index("LF_HAA") == 0
    assert view.get_dof_index("LF_KFE") == 8


def test_indexed_partial_writes():
    task, state = _state()
    view = ArticulationView(task.model)
    q0 = np.asarray(view.get_joint_positions(state))
    new_vals = jnp.ones((4, 12)) * 0.123
    # write only envs 1 and 3 (reference indices= semantics)
    state2 = view.set_joint_positions(state, new_vals, indices=jnp.array([1, 3]))
    q1 = np.asarray(view.get_joint_positions(state2))
    np.testing.assert_allclose(q1[[1, 3]], 0.123, atol=1e-6)
    np.testing.assert_allclose(q1[[0, 2]], q0[[0, 2]], atol=1e-6)


def test_joint_subset_writes():
    task, state = _state()
    view = ArticulationView(task.model)
    sub = jnp.array([0, 4, 8])
    state2 = view.set_joint_positions(
        state, jnp.full((4, 3), 0.2), joint_indices=sub
    )
    q = np.asarray(view.get_joint_positions(state2))
    np.testing.assert_allclose(q[:, [0, 4, 8]], 0.2, atol=1e-6)


def test_set_velocities_world_roundtrip():
    task, state = _state()
    view = ArticulationView(task.model)
    v = jnp.tile(jnp.array([[1.0, -0.5, 0.25, 0.1, 0.0, -0.2]]), (4, 1))
    state2 = view.set_velocities(state, v)
    # re-report kinematics and read back world velocities
    state3 = task.engine._report(state2.q[0], state2.qd[0],
                                 state2.sensor_forces[0])
    np.testing.assert_allclose(
        np.asarray(state3.body_lvel[0]), [1.0, -0.5, 0.25], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state3.body_avel[0]), [0.1, 0.0, -0.2], atol=1e-5
    )


def test_rigid_prim_view_multi_tree():
    task, state = _state("BallBalance")
    ball = RigidPrimView(task.model, ["ball"])
    pos, quat = ball.get_world_poses(state)
    assert pos.shape == (4, 1, 3)
    ctrl = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (4,) + x.shape),
        task.engine.default_control(),
    )
    ctrl2 = ball.apply_forces(ctrl, jnp.ones((4, 1, 3)))
    assert float(jnp.sum(ctrl2.body_force)) > 0
