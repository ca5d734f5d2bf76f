"""Cartpole articulation: fixed rail, prismatic cart, revolute pole.

Reference: robots/articulations/cartpole.py (Nucleus cartpole.usd) with dof
names cartJoint/poleJoint (reference tasks/cartpole.py:137-138); rail mounted
at z=2 (reference tasks/cartpole.py:56 `_cartpole_positions=[0,0,2]`).
Effort control on the cart dof with maxEffort scale applied by the task
(reference tasks/cartpole.py:108-112).
"""

from omniisaacgymenvs_tpu.physics.model import JointType, ModelBuilder


def build_cartpole(
    cart_mass: float = 1.0,
    pole_mass: float = 1.0,
    pole_half_length: float = 0.5,
    base_height: float = 2.0,
):
    b = ModelBuilder("Cartpole")
    rail = b.add_body(
        "rail",
        parent=-1,
        joint_type=JointType.FIXED,
        joint_pos=(0.0, 0.0, base_height),
        mass=10.0,
        inertia=(0.1, 0.1, 0.1),
    )
    cart = b.add_body(
        "cartJoint",
        parent=rail,
        joint_type=JointType.PRISMATIC,
        joint_axis=(1.0, 0.0, 0.0),
        mass=cart_mass,
        inertia=(0.01, 0.01, 0.01),
        limit=(-5.0, 5.0),
    )
    # pole: hinge about +y at the cart origin; +z along the pole (upright at
    # q=0, unstable equilibrium); positive q tips the pole toward +x.
    l = pole_half_length
    rod_inertia = pole_mass * (2 * l) ** 2 / 12.0
    b.add_body(
        "poleJoint",
        parent=cart,
        joint_type=JointType.REVOLUTE,
        joint_axis=(0.0, 1.0, 0.0),
        mass=pole_mass,
        com=(0.0, 0.0, l),
        inertia=(rod_inertia, rod_inertia, 1e-5),
        limit=(-4.0 * 3.14159265, 4.0 * 3.14159265),
    )
    return b.finalize()
