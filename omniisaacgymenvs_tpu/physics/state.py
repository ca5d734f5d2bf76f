"""Physics state pytree.

The entire simulation state of one articulation instance. Batched over the
env axis by vmap / sharding (reference equivalent: the PhysX-internal GPU
buffers exposed through omni.isaac.core ArticulationView tensors,
SURVEY.md §2.3)."""

from __future__ import annotations

import flax.struct
import jax


@flax.struct.dataclass
class State:
    """Single-env articulation state (batch by leading axis).

    q:  (nq,)  generalized positions. Floating base: [pos(3), quat wxyz(4),
        joint coords...] — wxyz matching the reference convention
        (reference docs/transfering_policies_from_isaac_gym.md:28-56).
    qd: (nv,)  generalized velocities. Floating base root: [omega_body(3),
        vel_body(3), joint vels...] in BODY coordinates (converted to world
        at the view/obs layer).

    Derived quantities (filled by the engine after each control step):
    body_pos/quat: world pose per body; body_lvel/avel: world-frame linear/
    angular velocity of each body origin; sensor_forces: (num_sensors, 6)
    aggregated contact wrench [force(3), torque(3)] in world coordinates
    (reference get_force_sensor_forces, tasks/shared/locomotion.py:89).
    """

    q: jax.Array
    qd: jax.Array
    body_pos: jax.Array
    body_quat: jax.Array
    body_lvel: jax.Array
    body_avel: jax.Array
    sensor_forces: jax.Array


@flax.struct.dataclass
class Control:
    """Per-step control input for one articulation instance.

    effort: (njd,) direct joint torques/forces (reference set_joint_efforts).
    pos_target/vel_target: (njd,) PD drive targets (reference
    set_joint_position_targets); drive force is
    clamp(Kp (pos_target - q) + Kd (vel_target - qd), ±max_effort)
    matching the PhysX drive model (reference tasks/utils/usd_utils.py:71-82).
    body_force/body_torque: (nb, 3) world-frame external wrench applied at
    each body origin (reference RigidPrimView.apply_forces,
    tasks/quadcopter.py:159, tasks/crazyflie.py:261).
    """

    effort: jax.Array
    pos_target: jax.Array
    vel_target: jax.Array
    body_force: jax.Array
    body_torque: jax.Array
