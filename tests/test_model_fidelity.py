"""Model-spec fidelity vs the reference's published drive tables.

The reference ships exact per-joint drive parameters in its robot classes;
the hand-authored model specs here must match them or regressions are
invisible (round-1 VERDICT weak #7). Each table below is transcribed from
the cited reference file with the USD degree->radian conversion applied
(set_drive passes stiffness*pi/180 into per-degree USD attributes, so the
EFFECTIVE per-radian gain equals the python value)."""

import numpy as np
import pytest

from omniisaacgymenvs_tpu.models.anymal import build_anymal
from omniisaacgymenvs_tpu.models.franka_cabinet import build_franka_cabinet
from omniisaacgymenvs_tpu.models.shadow_hand import build_shadow_hand


def _dof(m, name):
    return m.dof_index(name)


def test_shadow_hand_drive_table():
    """reference robots/articulations/shadow_hand.py:81-114."""
    m = build_shadow_hand()
    table = {
        "WRJ1": (5, 0.5, 4.785), "WRJ0": (5, 0.5, 2.175),
        "FFJ3": (1, 0.1, 0.9), "FFJ2": (1, 0.1, 0.9),
        "FFJ1": (1, 0.1, 0.7245),
        "MFJ3": (1, 0.1, 0.9), "MFJ2": (1, 0.1, 0.9),
        "MFJ1": (1, 0.1, 0.7245),
        "RFJ3": (1, 0.1, 0.9), "RFJ2": (1, 0.1, 0.9),
        "RFJ1": (1, 0.1, 0.7245),
        "LFJ4": (1, 0.1, 0.9), "LFJ3": (1, 0.1, 0.9),
        "LFJ2": (1, 0.1, 0.9), "LFJ1": (1, 0.1, 0.7245),
        "THJ4": (1, 0.1, 2.3722), "THJ3": (1, 0.1, 1.45),
        "THJ2": (1, 0.1, 0.99), "THJ1": (1, 0.1, 0.99),
        "THJ0": (1, 0.1, 0.81),
    }
    kp = np.asarray(m.dof_stiffness)
    kd = np.asarray(m.dof_drive_damping)
    fmax = np.asarray(m.dof_max_effort)
    for name, (s, d, f) in table.items():
        i = _dof(m, name)
        assert kp[i] == pytest.approx(s), name
        assert kd[i] == pytest.approx(d), name
        assert fmax[i] == pytest.approx(f), name
    # distal J0 joints carry NO drive — coupled by fixed tendons
    for name in ("FFJ0", "MFJ0", "RFJ0", "LFJ0"):
        i = _dof(m, name)
        assert kp[i] == 0.0 and kd[i] == 0.0, name
    # tendon properties (views/shadow_hand_view.py:71-73)
    assert m.nt == 4
    np.testing.assert_allclose(np.asarray(m.tendon_limit_stiffness), 30.0)
    np.testing.assert_allclose(np.asarray(m.tendon_damping), 0.1)


def test_franka_drive_table():
    """reference robots/articulations/franka.py:56-86."""
    m, _drawer = build_franka_cabinet()
    arm = [f"panda_joint{i}" for i in range(1, 8)]
    fingers = ["panda_finger_joint1", "panda_finger_joint2"]
    kp = np.asarray(m.dof_stiffness)
    kd = np.asarray(m.dof_drive_damping)
    fmax = np.asarray(m.dof_max_effort)
    vmax = np.asarray(m.dof_max_velocity)
    default = np.asarray(m.default_q)[np.asarray(m.jq_idx)]
    want_fmax = [87, 87, 87, 87, 12, 12, 12]
    want_vmax = [2.175, 2.175, 2.175, 2.175, 2.61, 2.61, 2.61]
    # the TASK's operating default pose (reference tasks/franka_cabinet.py
    # franka_default_dof_pos) — the robot-class default ([0,-1,0,-2.2,...])
    # is overwritten by the task at every reset
    want_q0 = [1.157, -1.066, -0.155, -2.239, -1.841, 1.003, 0.469]
    for j, name in enumerate(arm):
        i = _dof(m, name)
        assert kp[i] == pytest.approx(400.0), name
        assert kd[i] == pytest.approx(80.0), name
        assert fmax[i] == pytest.approx(want_fmax[j]), name
        assert vmax[i] == pytest.approx(want_vmax[j]), name
        assert default[i] == pytest.approx(want_q0[j], abs=1e-6), name
    for name in fingers:
        i = _dof(m, name)
        assert kp[i] == pytest.approx(1.0e4), name
        assert kd[i] == pytest.approx(100.0), name
        assert fmax[i] == pytest.approx(200.0), name
        assert vmax[i] == pytest.approx(0.2), name


def test_anymal_drive_table():
    """reference robots/articulations/anymal.py (set_drive 400/40/1000)
    and the 12-dof name set."""
    m = build_anymal()
    names = {f"{leg}_{j}" for leg in ("LF", "LH", "RF", "RH")
             for j in ("HAA", "HFE", "KFE")}
    assert names <= set(m.dof_names)
    kp = np.asarray(m.dof_stiffness)
    kd = np.asarray(m.dof_drive_damping)
    fmax = np.asarray(m.dof_max_effort)
    for name in names:
        i = _dof(m, name)
        assert kp[i] == pytest.approx(400.0), name
        assert kd[i] == pytest.approx(40.0), name
        assert fmax[i] == pytest.approx(1000.0), name


def test_in_hand_object_spec():
    """reference tasks/shared/in_hand_manipulation.py:118-124: 65 mm block,
    mass 0.07087 kg."""
    m = build_shadow_hand()
    obj = m.body_index("object")
    assert float(m.body_mass[obj]) == pytest.approx(0.07087)
