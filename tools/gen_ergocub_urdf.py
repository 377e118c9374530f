#!/usr/bin/env python
"""Generate cmw_tpu/models/ergocub.urdf (checked in; run once, keep in sync).

PROVENANCE — read before trusting the numbers. The reference loads the real
ergoCub URDF from icub-models at runtime (findFileByName("model.urdf"),
CentroidalMPCBlock.cpp:150-151); that file is not in the reference repo and
this build environment has no network access, so the authoritative model is
unobtainable here. This file is the documented best-effort stand-in
(VERDICT r3 item 3 fallback: "transcribe ... into a checked-in parameter
file"):

  * KINEMATIC SKELETON (joint placements, axis signs, sole offsets) is the
    calibrated one from kinematics.ergocub_approx(): those constants are
    pinned by the reference's own data (the hard-coded crouch
    CentroidalMPCBlock.cpp:273-280 must give flat soles at the Gazebo spawn
    pitch -0.1, and MANN joint trajectories must produce a sane gait) — see
    the provenance note in core/kinematics.py.
  * INERTIAL PARAMETERS are a realistic anthropomorphic distribution
    (segment mass fractions in the Winter/anthropometry class, cylinder/box
    second moments, off-axis CoM offsets) normalized to the ergoCub's
    ~56.6 kg published mass class — materially different from
    ergocub_approx()'s centered box guesses, which makes the pair a
    genuine inertial-model-error A/B for the rigid-plant experiments
    (tools/exp_rigid.py --urdf).
  * STRUCTURE exercises the full parse_urdf reduction path: 26 revolute
    joints (the exact joints_list of centroidal_mpc_walking.ini:16-22) plus
    WELDED fixed-joint sub-links (feet, head, hands, battery) that must be
    merged into their moving parents with parallel-axis inertia transport,
    and massless sole/chest frame links.
"""

import os

import numpy as np

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cmw_tpu", "models", "ergocub.urdf",
)


def cyl(m, r, h, axis="z"):
    """Solid cylinder inertia about its CoM."""
    ia = 0.5 * m * r * r
    it = m * (3 * r * r + h * h) / 12.0
    return {"z": (it, it, ia), "x": (ia, it, it), "y": (it, ia, it)}[axis]


def box(m, x, y, z):
    return (
        m / 12.0 * (y * y + z * z),
        m / 12.0 * (x * x + z * z),
        m / 12.0 * (x * x + y * y),
    )


def link(name, mass=None, com=(0, 0, 0), I=None):
    if mass is None:
        return f'  <link name="{name}"/>\n'
    ixx, iyy, izz = I
    return (
        f'  <link name="{name}">\n'
        f"    <inertial>\n"
        f'      <origin xyz="{com[0]} {com[1]} {com[2]}" rpy="0 0 0"/>\n'
        f'      <mass value="{mass}"/>\n'
        f'      <inertia ixx="{ixx:.6g}" ixy="0" ixz="0" iyy="{iyy:.6g}" '
        f'iyz="0" izz="{izz:.6g}"/>\n'
        f"    </inertial>\n"
        f"  </link>\n"
    )


def joint(name, jtype, parent, child, xyz=(0, 0, 0), axis=None, lim=2.8):
    s = (
        f'  <joint name="{name}" type="{jtype}">\n'
        f'    <origin xyz="{xyz[0]} {xyz[1]} {xyz[2]}" rpy="0 0 0"/>\n'
        f'    <parent link="{parent}"/>\n'
        f'    <child link="{child}"/>\n'
    )
    if axis is not None:
        s += f'    <axis xyz="{axis[0]} {axis[1]} {axis[2]}"/>\n'
    if jtype == "revolute":
        s += f'    <limit lower="{-lim}" upper="{lim}" effort="200" velocity="10"/>\n'
    return s + "  </joint>\n"


def main():
    L, J = [], []

    # pelvis: structure + hip actuator housings, CoM slightly up/back
    L.append(link("root_link", 6.5, (-0.01, 0.0, 0.05), box(6.5, 0.16, 0.24, 0.14)))

    def leg(side, sgn):
        p = f"{side}_"
        # hip cluster (pitch/roll coincident, yaw carries the thigh)
        L.append(link(p + "hip_1", 1.8, (0, 0, 0), cyl(1.8, 0.05, 0.10, "y")))
        J.append(joint(p + "hip_pitch", "revolute", "root_link", p + "hip_1",
                       (0.0, sgn * 0.08, -0.05), (0, -1, 0)))
        L.append(link(p + "hip_2", 1.2, (0, 0, 0), cyl(1.2, 0.05, 0.09, "x")))
        J.append(joint(p + "hip_roll", "revolute", p + "hip_1", p + "hip_2",
                       (0, 0, 0), (sgn, 0, 0)))
        # thigh: mass biased toward the hip (motors proximal on ergoCub)
        L.append(link(p + "upper_leg", 4.1, (0.005, 0, -0.13), cyl(4.1, 0.06, 0.30, "z")))
        J.append(joint(p + "hip_yaw", "revolute", p + "hip_2", p + "upper_leg",
                       (0, 0, 0), (0, 0, sgn)))
        L.append(link(p + "lower_leg", 2.6, (0.0, 0, -0.12), cyl(2.6, 0.05, 0.30, "z")))
        J.append(joint(p + "knee", "revolute", p + "upper_leg", p + "lower_leg",
                       (0.0, 0.0, -0.30), (0, -1, 0)))
        L.append(link(p + "ankle_1", 0.7, (0, 0, 0), cyl(0.7, 0.04, 0.08, "y")))
        J.append(joint(p + "ankle_pitch", "revolute", p + "lower_leg", p + "ankle_1",
                       (0.0, 0.0, -0.30), (0, 1, 0)))
        L.append(link(p + "ankle_2", 0.35, (0, 0, -0.02), cyl(0.35, 0.04, 0.06, "x")))
        J.append(joint(p + "ankle_roll", "revolute", p + "ankle_1", p + "ankle_2",
                       (0, 0, 0), (-sgn, 0, 0)))
        # foot: WELDED link, CoM forward and low (sole plate + toe mass)
        L.append(link(p + "foot", 0.75, (0.03, 0, -0.02), box(0.75, 0.20, 0.09, 0.04)))
        J.append(joint(p + "foot_fixed", "fixed", p + "ankle_2", p + "foot",
                       (0.01, 0.0, -0.06)))
        # massless sole frame at the calibrated offset from the ankle
        L.append(link(p + "sole_frame"))
        J.append(joint(p + "sole_fixed", "fixed", p + "ankle_2", p + "sole_frame",
                       (0.03, 0.0, -0.10)))

    leg("l", +1)
    leg("r", -1)

    # torso chain (pitch/roll/yaw coincident at (0,0,0.1))
    L.append(link("torso_1", 1.5, (0, 0, 0), cyl(1.5, 0.07, 0.12, "y")))
    J.append(joint("torso_pitch", "revolute", "root_link", "torso_1",
                   (0.0, 0.0, 0.1), (0, 1, 0)))
    L.append(link("torso_2", 1.5, (0, 0, 0), cyl(1.5, 0.07, 0.12, "x")))
    J.append(joint("torso_roll", "revolute", "torso_1", "torso_2",
                   (0, 0, 0), (1, 0, 0)))
    # chest: the heavy trunk; CoM back-of-center (battery), plus a welded
    # battery pack low in the chest
    L.append(link("chest", 10.0, (-0.02, 0.0, 0.13), box(10.0, 0.16, 0.28, 0.30)))
    J.append(joint("torso_yaw", "revolute", "torso_2", "chest", (0, 0, 0), (0, 0, 1)))
    L.append(link("battery", 2.5, (0.0, 0.0, 0.0), box(2.5, 0.08, 0.18, 0.12)))
    J.append(joint("battery_fixed", "fixed", "chest", "battery", (-0.06, 0.0, 0.05)))
    L.append(link("chest_frame"))
    J.append(joint("chest_frame_fixed", "fixed", "chest", "chest_frame", (0.0, 0.0, 0.1)))

    # neck + welded head
    L.append(link("neck_1", 0.25, (0, 0, 0), cyl(0.25, 0.03, 0.05, "y")))
    J.append(joint("neck_pitch", "revolute", "chest", "neck_1", (0.0, 0.0, 0.32), (0, 1, 0)))
    L.append(link("neck_2", 0.25, (0, 0, 0), cyl(0.25, 0.03, 0.05, "x")))
    J.append(joint("neck_roll", "revolute", "neck_1", "neck_2", (0, 0, 0), (1, 0, 0)))
    L.append(link("neck_3", 0.4, (0, 0, 0.03), cyl(0.4, 0.04, 0.06, "z")))
    J.append(joint("neck_yaw", "revolute", "neck_2", "neck_3", (0, 0, 0), (0, 0, 1)))
    L.append(link("head", 1.9, (0.01, 0.0, 0.07), box(1.9, 0.14, 0.16, 0.18)))
    J.append(joint("head_fixed", "fixed", "neck_3", "head", (0.0, 0.0, 0.08)))
    L.append(link("head_frame"))
    J.append(joint("head_frame_fixed", "fixed", "neck_3", "head_frame", (0.0, 0.0, 0.15)))

    def arm(side, sgn):
        p = f"{side}_"
        L.append(link(p + "shoulder_1", 0.9, (0, 0, 0), cyl(0.9, 0.04, 0.08, "y")))
        J.append(joint(p + "shoulder_pitch", "revolute", "chest", p + "shoulder_1",
                       (0.0, sgn * 0.16, 0.22), (0, 1, 0)))
        L.append(link(p + "shoulder_2", 0.7, (0, 0, 0), cyl(0.7, 0.04, 0.07, "x")))
        J.append(joint(p + "shoulder_roll", "revolute", p + "shoulder_1", p + "shoulder_2",
                       (0, 0, 0), (sgn, 0, 0)))
        L.append(link(p + "upper_arm", 1.3, (0.0, 0, -0.10), cyl(1.3, 0.04, 0.24, "z")))
        J.append(joint(p + "shoulder_yaw", "revolute", p + "shoulder_2", p + "upper_arm",
                       (0, 0, 0), (0, 0, sgn)))
        L.append(link(p + "forearm", 1.0, (0.0, 0, -0.11), cyl(1.0, 0.035, 0.24, "z")))
        J.append(joint(p + "elbow", "revolute", p + "upper_arm", p + "forearm",
                       (0.0, 0.0, -0.24), (0, 1, 0)))
        L.append(link(p + "hand", 0.5, (0.0, 0, -0.05), box(0.5, 0.03, 0.08, 0.14)))
        J.append(joint(p + "hand_fixed", "fixed", p + "forearm", p + "hand",
                       (0.0, 0.0, -0.26)))

    arm("l", +1)
    arm("r", -1)

    body = "".join(L) + "".join(J)
    urdf = (
        '<?xml version="1.0"?>\n'
        "<!-- GENERATED by tools/gen_ergocub_urdf.py - edit that script, not"
        " this file. Provenance: see the script docstring (best-effort\n"
        "     ergoCub stand-in: calibrated skeleton + anthropometric"
        " inertials; NOT the authoritative icub-models file, which is\n"
        "     unobtainable in this offline environment). -->\n"
        '<robot name="ergoCub_cmw_standin">\n' + body + "</robot>\n"
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write(urdf)
    total = 6.5 + 2 * (1.8 + 1.2 + 4.1 + 2.6 + 0.7 + 0.35 + 0.75) + (
        1.5 + 1.5 + 10.0 + 2.5
    ) + (0.25 + 0.25 + 0.4 + 1.9) + 2 * (0.9 + 0.7 + 1.3 + 1.0 + 0.5)
    print(f"wrote {OUT} (total mass {total:.2f} kg)")


if __name__ == "__main__":
    main()
