"""Contact-aided legged odometry: floating-base pose from the fixed foot.

Equivalent of BLF `Estimators::LeggedOdometry`
(reference WholeBodyQPBlock.cpp:92-128,263-320; config
legged_odometry.ini — `initial_fixed_frame l_sole`, `switching_pattern
useExternal`, i.e. the fixed frame is commanded externally by the
fixed-foot detector, exactly as here).

Mechanism: the fixed sole's world pose is pinned; the base pose follows
from the measured joint positions through the kinematic chain:
  T_world_base = T_world_sole * (T_base_sole(q))^-1
The base twist comes from the constraint that the fixed sole is
stationary: J_sole(q) nu = 0 restricted to the base block:
  v_base = -(J_b)^-1 J_q qdot  with J_b the 6x6 base block of the sole
Jacobian (invertible: it is [[I, -hat(r)], [0, I]]).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from cmw_tpu.core import kinematics as kin
from cmw_tpu.core import lie


@dataclasses.dataclass(frozen=True)
class OdomConfig:
    """Per-robot legged_odometry.ini values (ModelInfo + LeggedOdom groups;
    reference WholeBodyQPBlock.cpp:92-128). All 6 shipped robots use the
    same values; loaded verbatim by runtime.ini.load_robot_config."""

    base_link: str = "root_link"
    base_link_imu: str = "root_link"
    left_foot_contact_frame: str = "l_sole"
    right_foot_contact_frame: str = "r_sole"
    initial_fixed_frame: str = "l_sole"
    switching_pattern: str = "useExternal"  # detector drives the switches

    @property
    def initial_fixed_index(self) -> int:
        """0 = left, 1 = right — the double-support tie-break fed to
        fixed_foot.detect (the reference pins this foot at startup)."""
        return 0 if self.initial_fixed_frame == self.left_foot_contact_frame else 1


class OdometryState(NamedTuple):
    fixed_index: jnp.ndarray  # [] int (0=left, 1=right)
    fixed_rot: jnp.ndarray  # [3, 3] pinned world pose of the fixed sole
    fixed_pos: jnp.ndarray  # [3]


def init(model: kin.RobotModel, q, fixed_index=0, sole_rot=None, sole_pos=None) -> OdometryState:
    dt = q.dtype
    return OdometryState(
        fixed_index=jnp.asarray(fixed_index),
        fixed_rot=jnp.eye(3, dtype=dt) if sole_rot is None else sole_rot,
        fixed_pos=jnp.zeros(3, dt) if sole_pos is None else sole_pos,
    )


def _sole_frames(model: kin.RobotModel):
    return model.frame_index("l_sole"), model.frame_index("r_sole")


def base_pose(model: kin.RobotModel, state: OdometryState, q):
    """Base world pose from joints + pinned fixed sole."""
    dt = q.dtype
    lR, lp = kin.fk(model, q, jnp.eye(3, dtype=dt), jnp.zeros(3, dt))
    fR, fp = kin.frame_poses(model, lR, lp)
    li, ri = _sole_frames(model)
    sole_R = jnp.where(state.fixed_index == 0, fR[li], fR[ri])
    sole_p = jnp.where(state.fixed_index == 0, fp[li], fp[ri])
    # T_world_base = T_world_sole * inv(T_base_sole)
    Rinv, pinv = lie.se3_inverse(sole_R, sole_p)
    base_R, base_p = lie.se3_compose(state.fixed_rot, state.fixed_pos, Rinv, pinv)
    return base_R, base_p


def base_pose_fused(model: kin.RobotModel, state: OdometryState, q, imu_R):
    """Base pose with IMU-fused attitude (complementary, yaw-preserving).

    The pure kinematic chain (`base_pose`) assumes the fixed sole lies
    FLAT at its pinned pose — it cannot observe the robot rocking on a
    foot edge, which is exactly how a physical biped starts to fall. Every
    real humanoid closes this with a base IMU (ergoCub's waist IMU; BLF's
    FloatingBaseEstimators consume one). Fusion rule:

      roll/pitch from the IMU, yaw from the kinematic anchor
        R_fused = Rz(yaw_kin) Rz(-yaw_imu) R_imu
      position re-anchored so the fixed sole's PLANNED position stays
      pinned under the fused attitude (the reference's changeFixedFrame
      convention, WholeBodyQPBlock.cpp:300-320).
    """
    dt = q.dtype
    base_R_kin, _ = base_pose(model, state, q)
    R_f = lie.rotz(lie.yaw_of(base_R_kin) - lie.yaw_of(imu_R)) @ imu_R
    lR, lp = kin.fk(model, q, R_f, jnp.zeros(3, dt))
    _, fp = kin.frame_poses(model, lR, lp)
    li, ri = _sole_frames(model)
    sole_p = jnp.where(state.fixed_index == 0, fp[li], fp[ri])
    return R_f, state.fixed_pos - sole_p


def base_twist(model: kin.RobotModel, state: OdometryState, q, qd, base_R, base_p):
    """Base twist from the fixed-sole stationarity constraint."""
    lR, lp = kin.fk(model, q, base_R, base_p)
    li, ri = _sole_frames(model)
    Jl = kin.frame_jacobian(model, lR, lp, li)
    Jr = kin.frame_jacobian(model, lR, lp, ri)
    J = jnp.where(state.fixed_index == 0, Jl, Jr)
    Jb, Jq = J[:, 0:6], J[:, 6:]
    rhs = -Jq @ qd
    # Jb = [[I, -hat(r)], [0, I]] with r = p_sole - p_base, so
    # v = rhs_lin + hat(r) w  (closed-form inverse of the base block)
    hat_r = -Jb[0:3, 3:6]
    w = rhs[3:6]
    v = rhs[0:3] + hat_r @ w
    return jnp.concatenate([v, w])


def switch_fixed_foot(
    state: OdometryState, new_index, new_rot, new_pos
) -> OdometryState:
    """Change the fixed frame (BLF `changeFixedFrame`,
    WholeBodyQPBlock.cpp:300-320): pin the new sole at its planned pose
    (the reference passes the planned-contact orientation and position)."""
    return OdometryState(
        fixed_index=jnp.asarray(new_index),
        fixed_rot=new_rot,
        fixed_pos=new_pos,
    )
