"""Config-system tests: ini dialect + loading the reference's own files."""

import os

import pytest

from cmw_tpu.runtime.ini import load_robot_config, parse_ini

REF = "/root/reference/src/centroidal-mpc-walking/config/robots"


def test_parse_dialect(tmp_path):
    p = tmp_path / "a.ini"
    q = tmp_path / "b.ini"
    q.write_text("inner_key 5\n")
    p.write_text(
        """
top_str "hello"
top_num 0.25
top_tuple (1.0, 2.0, 3.0)
sloppy_tuple (-0.08 0.01, 0.0)   # missing comma, as in the reference
multi_line (a, b,
            c)
flag true

[GROUP_A]
x 1
y (2, 3)

[include INC "./b.ini"]
after_include 7
"""
    )
    d = parse_ini(str(p))
    assert d["top_str"] == "hello"
    assert d["top_num"] == 0.25
    assert d["top_tuple"] == (1.0, 2.0, 3.0)
    assert d["sloppy_tuple"] == (-0.08, 0.01, 0.0)
    assert d["multi_line"] == ("a", "b", "c")
    assert d["flag"] is True
    assert d["GROUP_A"]["x"] == 1 and d["GROUP_A"]["y"] == (2, 3)
    assert d["INC"]["inner_key"] == 5
    assert d["after_include"] == 7  # include closes the open group


@pytest.mark.parametrize("robot", sorted(os.listdir(REF)))
def test_load_every_reference_robot(robot):
    cfg = load_robot_config(os.path.join(REF, robot))
    assert 0.01 <= cfg.mpc.dt <= 0.2
    assert cfg.mpc.T >= 10
    assert cfg.mpc.mu > 0
    assert cfg.mpc_every == round(cfg.mpc.dt / cfg.wbc_dt)


def test_reference_values_verbatim():
    cfg = load_robot_config(os.path.join(REF, "ergoCubGazeboV1"))
    assert cfg.mpc.com_weight == (10.0, 10.0, 200.0)
    assert cfg.mpc.contact_position_weight == 2000.0
    assert cfg.mpc.angular_momentum_weight == 100.0
    assert cfg.mpc.bbox_upper == ((0.01, 0.05, 0.0), (0.01, 0.0, 0.0))
    assert cfg.mpc.corners[1][2] == (-0.08, -0.01, 0.0)
    assert cfg.gains.com_gain == (4.0, 4.0)
    assert cfg.swing.step_height == 0.035
    assert cfg.input_builder.ellipsoid_forward_axis == 3.0
    cfg2 = load_robot_config(os.path.join(REF, "ergoCubSN000"))
    assert cfg2.mpc.dt == 0.1 and cfg2.mpc.horizon == 1.3


def test_slow_down_factor_consumed():
    """mann.ini:16 slow_down_factor must reach the gait timing, not be
    dropped: mannCallingTime = lcm(factor * gen dt, MPC dt) with merge
    point mannCallingTime/(factor * gen dt)
    (CentroidalMPCBlock.cpp:193-211,262-265)."""
    sim = load_robot_config(os.path.join(REF, "ergoCubGazeboV1"))
    assert sim.gen.slow_down_factor == 1.0
    assert abs(sim.mann_calling_time - 0.06) < 1e-9  # lcm(20, 60) ms
    assert sim.mann_advance == 3 and sim.mann_call_every == 1

    for robot in ("ergoCubSN000", "ergoCubGazeboV1_1"):
        cfg = load_robot_config(os.path.join(REF, robot))
        assert cfg.gen.slow_down_factor == 5.0, robot
        # lcm(5*20 ms, 100 ms) = 100 ms: one generator step per MPC tick
        assert abs(cfg.mann_calling_time - 0.1) < 1e-9, robot
        assert cfg.mann_advance == 1 and cfg.mann_call_every == 1, robot

    # SN001 is the general case: lcm(100 ms, 60 ms) = 300 ms — the
    # generator runs every 5th MPC tick, re-rooting 3 knots in; between
    # calls the stored rollout is re-sliced at absolute times
    sn001 = load_robot_config(os.path.join(REF, "ergoCubSN001"))
    assert sn001.gen.slow_down_factor == 5.0
    assert abs(sn001.mann_calling_time - 0.3) < 1e-9
    assert sn001.mann_advance == 3 and sn001.mann_call_every == 5

    # the preset advertised by `walk --robot ergoCubSN000` agrees
    from cmw_tpu.runtime.config import ergocub_sn000

    preset = ergocub_sn000()
    assert preset.gen.slow_down_factor == 5.0
    assert preset.mann_advance == 1 and preset.mann_call_every == 1


def test_ik_odometry_values_verbatim():
    """Per-robot ik.ini / legged_odometry.ini are consumed, not hardcoded
    (reference WholeBodyQPBlock.cpp:131-175 + config/robots/*/ik.ini).
    iCubGenova09's original ICRA-2022 dialect differs from ergoCub's in
    group names AND values — both must load verbatim."""
    cfg = load_robot_config(os.path.join(REF, "ergoCubGazeboV1"))
    assert cfg.ik.kp_foot_lin == 5.0 and cfg.ik.kp_foot_ang == 4.0
    assert cfg.ik.kp_com == 2.0 and cfg.ik.kp_root == 1.0
    assert cfg.ik.chest_frame == "chest"
    assert cfg.ik.chest_weight == (10.0, 10.0, 10.0)
    assert cfg.ik.kp_posture == (5.0,) * 26
    assert cfg.ik.posture_weight == (1.0,) * 6 + (2.0,) * 8 + (1.0,) * 12
    assert cfg.odom.initial_fixed_frame == "l_sole"
    assert cfg.odom.initial_fixed_index == 0
    assert cfg.odom.switching_pattern == "useExternal"

    icub = load_robot_config(os.path.join(REF, "iCubGenova09"))
    assert icub.ik.kp_com == 10.0  # differs from ergoCub's 2.0
    assert icub.ik.chest_frame == "neck_2"
    assert icub.ik.chest_weight == (1.0, 1.0, 1.0)
    assert icub.ik.kp_posture == (5.0,) * 23  # 23-joint original list
    assert icub.ik.posture_weight == (1.0,) * 3 + (2.0,) * 8 + (1.0,) * 12
    # no ROOT_TASK group in the original dialect: default retained
    assert icub.ik.kp_root == 1.0
