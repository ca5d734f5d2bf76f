"""Allegro Hand (16 dof, all actuated) + cube object scene.

Reference: robots/articulations/allegro_hand.py (Nucleus allegro USD,
16 dofs: 4 fingers x [abduction + 3 flexion], all actuated — the AllegroHand
task uses the same InHandManipulationTask without tendons or force sensors,
SURVEY.md §2.2). Authored palm-up with fingers along +y like the shadow
hand; dof order breadth-first [abductions x4, then flex levels].
"""

import numpy as np

from omniisaacgymenvs_tpu.models.common import BodyGeoms
from omniisaacgymenvs_tpu.physics.model import JointType, ModelBuilder

OBJECT_SIZE = 0.065
OBJECT_MASS = 0.07087
PALM_POS = np.array([0.0, 0.0, 0.47])
OBJECT_START = (0.0, 0.0, 0.53)
GOAL_POS = (0.0, 0.0, 0.49)

_FR = 0.012
_SEGS = (0.054, 0.0384, 0.0437)
_FINGERS = [("index", 0.045), ("middle", 0.0), ("pinky", -0.045)]

_DRIVE = dict(stiffness=3.0, drive_damping=0.1, max_effort=0.7,
              max_velocity=20.0, armature=5e-4, damping=0.01)

FINGERTIP_BODIES = ("index_tip", "middle_tip", "pinky_tip", "thumb_tip")


def _seg(length, r=_FR, density=600.0):
    return BodyGeoms(density).capsule((0, 0, 0), (0, length, 0), r).finalize()


def build_allegro_hand():
    b = ModelBuilder("AllegroHand")
    gc = dict(gravity_comp=True)
    m, com, I = BodyGeoms(900.0).box((0, 0, 0), (0.05, 0.06, 0.015)).finalize()
    palm = b.add_body(
        "palm", parent=-1, joint_type=JointType.FIXED,
        joint_pos=tuple(PALM_POS), mass=m, com=com, inertia=I, **gc,
    )
    b.add_box_collider(palm, (0, 0, 0), (0.05, 0.06, 0.015), receive=True)

    # level 1: abductions (3 fingers about z) + thumb base rotation
    bases = {}
    for name, x in _FINGERS:
        bases[name] = b.add_body(
            f"{name}_abduct", parent=palm, joint_type=JointType.REVOLUTE,
            joint_axis=(0, 0, 1), joint_pos=(x, 0.07, 0.005),
            limit=(-0.47, 0.47), mass=0.02, inertia=(4e-6,) * 3,
            **_DRIVE, **gc,
        )
    # default_q 0.8 rests the thumb diagonally across the palm: it acts as
    # the -y retaining ridge the cube rests against (the round-3 full-budget
    # run learns a stable hold this way). Round-3 also trialed thumb-aside
    # (1.3) + cube-on-fingers spawns: statically stable and rich in rotation
    # authority under scripted waves, but early-training finger curls fling
    # the unretained cube instantly (ep_len ~4 for 3000 epochs), so it never
    # learns to hold — reverted; see docs/release_notes.md open issue.
    bases["thumb"] = b.add_body(
        "thumb_abduct", parent=palm, joint_type=JointType.REVOLUTE,
        joint_axis=(0, 0, 1), joint_pos=(0.05, -0.02, -0.005),
        limit=(0.263, 1.396), default_q=0.8,
        mass=0.03, inertia=(6e-6,) * 3, **_DRIVE, **gc,
    )

    # levels 2-4: three flexion joints per finger
    names = ["index", "middle", "pinky", "thumb"]
    prev = dict(bases)
    for level, seg_len in enumerate(_SEGS):
        for name in names:
            mm, com, I = _seg(seg_len)
            kwargs = dict(
                joint_axis=(1, 0, 0),
                joint_pos=(0, _SEGS[level - 1], 0) if level else (0, 0.01, 0),
                limit=(-0.196, 1.61) if name != "thumb" else (-0.105, 1.163),
                mass=mm, com=com, inertia=I,
            )
            suffix = "tip" if level == 2 else f"flex{level}"
            body = b.add_body(
                f"{name}_{suffix}", parent=prev[name],
                joint_type=JointType.REVOLUTE, **kwargs, **_DRIVE, **gc,
            )
            n_extra = 1 if level == 2 else 0
            b.add_capsule_collider(body, (0, 0, 0), (0, seg_len, 0), _FR,
                                   n_extra=n_extra)
            prev[name] = body

    # object block
    h = OBJECT_SIZE / 2.0
    obj_inertia = OBJECT_MASS * (2 * h) ** 2 / 6.0
    obj = b.add_body(
        "object", parent=-1, joint_type=JointType.FREE,
        mass=OBJECT_MASS, inertia=(obj_inertia,) * 3,
        default_pos=OBJECT_START,
    )
    b.add_box_collider(obj, (0, 0, 0), (h, h, h), receive=True, dense=True)
    return b.finalize()
