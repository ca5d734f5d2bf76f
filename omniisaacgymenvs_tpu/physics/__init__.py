"""TPU-native rigid-body physics: generalized-coordinate articulation dynamics.

Replaces the reference's external PhysX 5 GPU engine + omni.isaac.core tensor
views (SURVEY.md §2.3) with a pure-JAX Featherstone implementation whose step
is a single jitted function over a batched state pytree.
"""

from omniisaacgymenvs_tpu.physics import rotations
from omniisaacgymenvs_tpu.physics import spatial
from omniisaacgymenvs_tpu.physics.model import Model, ModelBuilder, JointType
from omniisaacgymenvs_tpu.physics.state import State
from omniisaacgymenvs_tpu.physics.engine import PhysicsEngine, SimParams
