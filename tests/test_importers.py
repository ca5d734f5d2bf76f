"""URDF / MJCF importer tests: imported models must be dynamically
equivalent to hand-authored ModelBuilder specs (the asset-ingestion path
replacing the reference's opaque Nucleus USD robots, SURVEY.md §7.3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omniisaacgymenvs_tpu.models.cartpole import build_cartpole
from omniisaacgymenvs_tpu.models.common import BodyGeoms
from omniisaacgymenvs_tpu.models.importers import from_mjcf, from_urdf
from omniisaacgymenvs_tpu.physics import dynamics


def qdd_of(model, q, qd, tau):
    kin = dynamics.kinematics(model, q, qd)
    f_ext = jnp.zeros((model.nb, 6))
    return dynamics.aba(
        model, q, qd, tau, f_ext, kin, jnp.asarray([0.0, 0.0, -9.81])
    )


ROD_I = 1.0 * (2 * 0.5) ** 2 / 12.0

CARTPOLE_URDF = f"""
<robot name="Cartpole">
  <link name="rail">
    <inertial><mass value="10"/>
      <inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="cart">
    <inertial><mass value="1"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="pole">
    <inertial><origin xyz="0 0 0.5"/><mass value="1"/>
      <inertia ixx="{ROD_I}" iyy="{ROD_I}" izz="1e-5" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="cartJoint" type="prismatic">
    <parent link="rail"/><child link="cart"/><axis xyz="1 0 0"/>
    <limit lower="-5" upper="5"/>
  </joint>
  <joint name="poleJoint" type="revolute">
    <parent link="cart"/><child link="pole"/><axis xyz="0 1 0"/>
    <limit lower="-12.56637" upper="12.56637"/>
  </joint>
</robot>
"""


def test_urdf_cartpole_matches_hand_built():
    ref = build_cartpole()
    imp = from_urdf(CARTPOLE_URDF, base_pos=(0, 0, 2)).finalize()

    assert imp.dof_names == ref.dof_names == ("cartJoint", "poleJoint")
    np.testing.assert_allclose(imp.body_mass, ref.body_mass, rtol=1e-6)
    np.testing.assert_allclose(imp.body_com, ref.body_com, atol=1e-7)
    np.testing.assert_allclose(imp.body_inertia, ref.body_inertia, rtol=1e-5)
    np.testing.assert_allclose(imp.dof_limit_lower, ref.dof_limit_lower,
                               rtol=1e-4)

    q = jnp.asarray([0.3, 0.7])
    qd = jnp.asarray([-0.2, 1.1])
    tau = jnp.asarray([2.0, 0.0])
    np.testing.assert_allclose(
        qdd_of(imp, q, qd, tau), qdd_of(ref, q, qd, tau), rtol=1e-4
    )
    # rail frame placement: pole world height through FK
    kin = dynamics.kinematics(imp, imp.default_q, jnp.zeros(imp.nv))
    assert float(kin.pw[1, 2]) == pytest.approx(2.0, abs=1e-6)


def test_urdf_fixed_joint_merging():
    urdf = """
    <robot name="merged">
      <link name="base">
        <inertial><mass value="2"/>
          <inertia ixx="0.02" iyy="0.02" izz="0.02"/>
        </inertial>
      </link>
      <link name="tool">
        <inertial><mass value="3"/>
          <inertia ixx="0.03" iyy="0.03" izz="0.03"/>
        </inertial>
        <collision><origin xyz="0 0 0.1"/>
          <geometry><sphere radius="0.05"/></geometry>
        </collision>
      </link>
      <joint name="weld" type="fixed">
        <parent link="base"/><child link="tool"/>
        <origin xyz="0 0 0.4"/>
      </joint>
    </robot>
    """
    b = from_urdf(urdf, floating_base=True)
    m = b.finalize()
    assert m.nb == 1 and m.njd == 0
    assert float(m.body_mass[0]) == pytest.approx(5.0)
    # com: (2*0 + 3*0.4)/5 = 0.24 up
    np.testing.assert_allclose(m.body_com[0], [0, 0, 0.24], atol=1e-7)
    # parallel axis: 0.02+0.03 + 2*0.24^2 + 3*0.16^2 about x/y
    exp = 0.05 + 2 * 0.24**2 + 3 * 0.16**2
    assert float(m.body_inertia[0, 0, 0]) == pytest.approx(exp, rel=1e-6)
    # merged collider lands at the welded offset in the base frame
    np.testing.assert_allclose(m.cp_pos[0], [0, 0, 0.5], atol=1e-7)
    assert b.body_by_link["tool"] == 0


def test_mjcf_defaults_degrees_and_limits():
    mjcf = """
    <mujoco model="pend">
      <compiler angle="degree"/>
      <default>
        <joint damping="0.5" armature="0.02"/>
        <default class="stiff"><joint damping="2.0"/></default>
      </default>
      <worldbody>
        <body name="arm" pos="0 0 1">
          <joint name="shoulder" type="hinge" axis="0 1 0"
                 range="-90 90" class="stiff"/>
          <geom type="capsule" fromto="0 0 0 0 0 -0.6" size="0.04"/>
          <body name="fore" pos="0 0 -0.6">
            <joint name="elbow" type="hinge" axis="0 1 0" range="-45 45"/>
            <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.03"/>
          </body>
        </body>
      </worldbody>
    </mujoco>
    """
    m = from_mjcf(mjcf).finalize()
    assert m.dof_names == ("shoulder", "elbow")
    np.testing.assert_allclose(m.dof_limit_lower,
                               [-np.pi / 2, -np.pi / 4], rtol=1e-6)
    # class="stiff" overrides damping, inherits armature
    np.testing.assert_allclose(m.dof_damping, [2.0, 0.5])
    np.testing.assert_allclose(m.dof_armature, [0.02, 0.02])


def test_mjcf_geom_density_mass():
    mjcf = """
    <mujoco><compiler angle="radian"/>
      <worldbody>
        <body name="ball" pos="0 0 1">
          <freejoint/>
          <geom type="sphere" size="0.1" density="500"/>
        </body>
      </worldbody>
    </mujoco>
    """
    m = from_mjcf(mjcf).finalize()
    exp_m, _, exp_I = BodyGeoms(500.0).sphere((0, 0, 0), 0.1).finalize()
    assert float(m.body_mass[0]) == pytest.approx(exp_m, rel=1e-6)
    assert float(m.body_inertia[0, 0, 0]) == pytest.approx(
        exp_I[0, 0], rel=1e-6
    )
    np.testing.assert_allclose(m.default_q[:3], [0, 0, 1])


def test_mjcf_multi_joint_chain_equivalence():
    """Two hinges in one body == the explicit nested chain (the MuJoCo
    equivalence the importer implements)."""
    multi = """
    <mujoco><compiler angle="radian"/>
      <worldbody>
        <body name="leg" pos="0.1 0 0.5">
          <joint name="hip_x" type="hinge" axis="1 0 0" armature="0.01"/>
          <joint name="hip_y" type="hinge" axis="0 1 0" pos="0 0 -0.1"
                 armature="0.01"/>
          <geom type="capsule" fromto="0 0 -0.1 0 0 -0.5" size="0.04"/>
        </body>
      </worldbody>
    </mujoco>
    """
    nested = """
    <mujoco><compiler angle="radian"/>
      <worldbody>
        <body name="dummy" pos="0.1 0 0.5">
          <joint name="hip_x" type="hinge" axis="1 0 0" armature="0.01"/>
          <geom type="sphere" size="0.01" density="23.8732414637845"
                contype="0" conaffinity="0"/>
          <body name="leg" pos="0 0 0">
            <joint name="hip_y" type="hinge" axis="0 1 0" pos="0 0 -0.1"
                   armature="0.01"/>
            <geom type="capsule" fromto="0 0 -0.1 0 0 -0.5" size="0.04"/>
          </body>
        </body>
      </worldbody>
    </mujoco>
    """
    # nested dummy sphere mass = the chain's 1e-4 intermediate-body mass
    ma = from_mjcf(multi).finalize()
    mb = from_mjcf(nested).finalize()
    assert ma.njd == mb.njd == 2
    q = jnp.asarray([0.4, -0.3])
    qd = jnp.asarray([0.5, 0.2])
    tau = jnp.asarray([0.7, -0.1])
    np.testing.assert_allclose(
        qdd_of(ma, q, qd, tau), qdd_of(mb, q, qd, tau), rtol=2e-3
    )
    # end-body world pose agrees
    ka = dynamics.kinematics(ma, q, qd)
    kb = dynamics.kinematics(mb, q, qd)
    np.testing.assert_allclose(
        ka.pw[ma.body_index("hip_y")], kb.pw[mb.body_index("hip_y")],
        atol=1e-5,
    )


def test_mjcf_body_quat_rotation():
    """Rotated body frames: a capsule authored along +z in a body rotated 90
    deg about +y lies along +x in the parent frame."""
    mjcf = """
    <mujoco><compiler angle="radian"/>
      <worldbody>
        <body name="seg" pos="0 0 1" euler="0 1.5707963 0">
          <joint name="j" type="hinge" axis="0 0 1"/>
          <geom type="capsule" fromto="0 0 0 0 0 0.4" size="0.05"/>
        </body>
      </worldbody>
    </mujoco>
    """
    m = from_mjcf(mjcf).finalize()
    kin = dynamics.kinematics(m, m.default_q, jnp.zeros(m.nv))
    body = m.body_index("j")
    # capsule tip contact point (0,0,0.4 in body coords) -> +x in world
    tip_local = m.cp_pos[-1]
    tip_world = kin.pw[body] + kin.Rw[body] @ tip_local
    np.testing.assert_allclose(tip_world, [0.4, 0, 1.0], atol=1e-5)


def test_mjcf_actuators_and_set_drive():
    mjcf = """
    <mujoco><compiler angle="radian"/>
      <worldbody>
        <body name="arm" pos="0 0 1">
          <joint name="shoulder" type="hinge" axis="0 1 0"/>
          <geom type="sphere" size="0.1"/>
        </body>
      </worldbody>
      <actuator><motor name="m1" joint="shoulder" gear="150"/></actuator>
    </mujoco>
    """
    b = from_mjcf(mjcf)
    assert b.actuators["m1"] == {"joint": "shoulder", "gear": 150.0}
    b.set_drive("shoulder", stiffness=400.0, damping=40.0, max_effort=80.0)
    m = b.finalize()
    i = m.dof_index("shoulder")
    assert float(m.dof_stiffness[i]) == 400.0
    assert float(m.dof_drive_damping[i]) == 40.0
    assert float(m.dof_max_effort[i]) == 80.0
    with pytest.raises(KeyError):
        b.set_drive("nope", stiffness=1.0)


def test_urdf_rotated_fixed_base_sim():
    """End-to-end: gravity pendulum from URDF swings with the analytic
    small-oscillation frequency."""
    urdf = """
    <robot name="pend">
      <link name="base"/>
      <link name="bob">
        <inertial><origin xyz="0 0 -1"/><mass value="1"/>
          <inertia ixx="1e-6" iyy="1e-6" izz="1e-6"/>
        </inertial>
      </link>
      <joint name="swing" type="continuous">
        <parent link="base"/><child link="bob"/><axis xyz="0 1 0"/>
      </joint>
    </robot>
    """
    m = from_urdf(urdf, base_pos=(0, 0, 2)).finalize()

    dt = 1e-3
    q = jnp.asarray([0.05])
    qd = jnp.asarray([0.0])

    def body(carry, _):
        q, qd = carry
        qdd = qdd_of(m, q, qd, jnp.zeros(1))
        qd = qd + dt * qdd
        q = q + dt * qd
        return (q, qd), q[0]

    (_, _), traj = jax.lax.scan(body, (q, qd), None, length=2500)
    traj = np.asarray(traj)
    # analytic point-pendulum period: 2*pi*sqrt(L/g) ~ 2.006 s
    zero_crossings = np.where(np.diff(np.sign(traj)) != 0)[0]
    half_period = (zero_crossings[1] - zero_crossings[0]) * dt
    assert half_period == pytest.approx(np.pi * np.sqrt(1.0 / 9.81), rel=0.02)
