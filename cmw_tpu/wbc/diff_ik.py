"""Differential inverse kinematics QP — the reference's IK task stack.

Equivalent of BLF `IK::QPInverseKinematics` built from ik.ini (reference
WholeBodyQPBlock.cpp:131-175, solve at :1233-1237). Variables
nu = [base linear vel (3), base angular vel (3), qdot (26)] (mixed
representation). Task set exactly per config/robots/ergoCubGazeboV1/ik.ini:

  priority 0 (hard):  LEFT_FOOT / RIGHT_FOOT SE3Task (kp_lin 5, kp_ang 4),
                      COM CoMTask xy (kp 2, mask (1,1,0)),
                      ROOT_TASK R3Task z (kp 1, mask (0,0,1))
  priority 1 (soft):  CHEST SO3Task (kp 5, weight (10,10,10)),
                      JOINT_REGULARIZATION JointTrackingTask (kp 5/joint,
                      weights 1/2 per ik.ini)

Hard tasks become equality constraints, soft tasks the weighted objective;
with no inequality rows in this config the QP reduces to one dense KKT
solve (qp.solve_eq_qp) — fully jittable and batchable, replacing BLF's
osqp backend.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from cmw_tpu.core import kinematics as kin
from cmw_tpu.core import lie
from cmw_tpu.cmpc.qp import solve_eq_box_qp, solve_eq_qp

_JOINT_REG_WEIGHT = (
    1.0, 1.0, 1.0, 1.0, 1.0, 1.0,  # left leg   (ik.ini weight rows 1-2)
    2.0, 2.0, 2.0, 2.0, 2.0, 2.0,  # right leg / torso block per ik.ini
    2.0, 2.0, 1.0,
    1.0, 1.0, 1.0,
    1.0, 1.0, 1.0, 1.0,
    1.0, 1.0, 1.0, 1.0,
)


@dataclasses.dataclass(frozen=True)
class IKConfig:
    """Per-robot IK task gains — values from config/robots/<ROBOT>/ik.ini
    (loaded verbatim by runtime.ini.load_robot_config; defaults =
    ergoCubGazeboV1/ik.ini). The reference builds the same stack in
    WholeBodyQPBlock.cpp:131-175."""

    kp_foot_lin: float = 5.0
    kp_foot_ang: float = 4.0
    kp_com: float = 2.0
    kp_root: float = 1.0
    kp_chest: float = 5.0
    # per-joint kp tuple (ik.ini JOINT_REGULARIZATION `kp`); a scalar
    # broadcasts over all joints
    kp_posture: tuple | float = 5.0
    chest_frame: str = "chest"  # iCubGenova09 uses "neck_2"
    chest_weight: tuple = (10.0, 10.0, 10.0)
    posture_weight: tuple = _JOINT_REG_WEIGHT
    damping: float = 1e-4  # Tikhonov on the soft objective


class IKTargets(NamedTuple):
    foot_rot: jnp.ndarray  # [2, 3, 3]
    foot_pos: jnp.ndarray  # [2, 3]
    foot_lin_vel: jnp.ndarray  # [2, 3]
    foot_ang_vel: jnp.ndarray  # [2, 3]
    com_xy: jnp.ndarray  # [2]
    dcom_xy: jnp.ndarray  # [2]
    root_z: jnp.ndarray  # []
    droot_z: jnp.ndarray  # []
    chest_rot: jnp.ndarray  # [3, 3]
    q_reg: jnp.ndarray  # [26]
    # OPTIONAL angular-momentum task (BLF ships IK::AngularMomentumTask;
    # the reference's ik.ini never enables it — turned on for the rigid
    # plant, config.ang_mom_task_weight). ang_mom is the desired
    # mass-normalized centroidal angular momentum (the MPC's planned L,
    # runtime/loop x9[6:9]); ang_mom_w a TRACED soft weight per axis
    # applied on top of it (0 disables at runtime). None skips the task
    # rows entirely (static — the adherent hot path pays nothing).
    ang_mom: jnp.ndarray | None = None
    ang_mom_w: jnp.ndarray | None = None
    # OPTIONAL joint-velocity box (BLF ships IK::JointLimitsTask /
    # JointVelocityLimitsTask as inequality constraints in its osqp
    # backend; the reference's ik.ini enables neither —
    # WholeBodyQPBlock.cpp:131-175 — so None, the default, reproduces the
    # reference's equality-only QP via one KKT solve). When set
    # ([nj] lower, [nj] upper, rad/s — typically the position-limit
    # avoidance bounds k*(q_lim - q) intersected with an absolute speed
    # cap), the QP is solved with qp.solve_eq_box_qp instead: the hard
    # task rows stay exact equalities and qdot is clipped into the box by
    # a fixed-trip ADMM on the same factorization. Static choice: the
    # adherent hot path pays nothing when None.
    qd_lo: jnp.ndarray | None = None
    qd_hi: jnp.ndarray | None = None
    # OPTIONAL traced multiplier on the chest task's roll/pitch weight
    # rows (the world-x/y components of the SO3 log error). The reference
    # weights all three axes equally (ik.ini CHEST_TASK weight, used via
    # cfg.chest_weight); the rigid plant's measured terminal mode is
    # backward torso pitch that the soft chest task cannot arrest
    # (RESULTS.md §5d), so the rigid path exposes the roll/pitch
    # anchoring stiffness as a runtime knob. None (static) = reference
    # behavior, zero cost on the adherent path.
    chest_w_rp: jnp.ndarray | None = None


def solve_ik(
    model: kin.RobotModel,
    q,
    base_rot,
    base_pos,
    targets: IKTargets,
    cfg: IKConfig = IKConfig(),
):
    """One IK QP solve. Returns nu [6+nj] = [v_base, w_base, qdot]."""
    dt = q.dtype
    nv = 6 + model.nj
    lR, lp = kin.fk(model, q, base_rot, base_pos)
    fR, fp = kin.frame_poses(model, lR, lp)

    rows_J, rows_b = [], []
    for i, frame in enumerate(("l_sole", "r_sole")):
        fidx = model.frame_index(frame)
        J = kin.frame_jacobian(model, lR, lp, fidx)
        e_lin = targets.foot_lin_vel[i] + cfg.kp_foot_lin * (targets.foot_pos[i] - fp[fidx])
        e_ang = targets.foot_ang_vel[i] + cfg.kp_foot_ang * lie.so3_log(
            targets.foot_rot[i] @ fR[fidx].T
        )
        rows_J.append(J)
        rows_b.append(jnp.concatenate([e_lin, e_ang]))

    Jcom = kin.com_jacobian(model, lR, lp)
    c = kin.com(model, lR, lp)
    rows_J.append(Jcom[0:2])
    rows_b.append(targets.dcom_xy + cfg.kp_com * (targets.com_xy - c[0:2]))

    # ROOT_TASK: R3Task on root_link origin, mask (0,0,1)
    ridx = model.frame_index("root_link")
    Jroot = kin.frame_jacobian(model, lR, lp, ridx)
    rows_J.append(Jroot[2:3])
    rows_b.append(
        (targets.droot_z + cfg.kp_root * (targets.root_z - fp[ridx, 2]))[None]
    )

    A = jnp.concatenate(rows_J, axis=0)  # [15, nv]
    b = jnp.concatenate(rows_b, axis=0)

    # soft: chest SO3 + posture
    cidx = model.frame_index(cfg.chest_frame)
    Jchest = kin.frame_jacobian(model, lR, lp, cidx)[3:6]
    e_chest = cfg.kp_chest * lie.so3_log(targets.chest_rot @ fR[cidx].T)
    w_chest = jnp.asarray(cfg.chest_weight, dt)
    if targets.chest_w_rp is not None:
        # scale only the world-roll/pitch rows; yaw keeps the ik.ini weight
        w_chest = w_chest * jnp.stack(
            [targets.chest_w_rp, targets.chest_w_rp, jnp.ones((), dt)]
        )

    Jpost = jnp.concatenate([jnp.zeros((model.nj, 6), dt), jnp.eye(model.nj, dtype=dt)], axis=1)
    e_post = jnp.asarray(cfg.kp_posture, dt) * (targets.q_reg - q)
    w_post = jnp.asarray(cfg.posture_weight, dt)

    Js = jnp.concatenate([Jchest, Jpost], axis=0)
    es = jnp.concatenate([e_chest, e_post])
    W = jnp.concatenate([w_chest, w_post])

    if targets.ang_mom is not None:
        # angular-momentum velocity-level task: (A_ang / m) nu = L_des
        # (mass-normalized; the MPC plans L/m). Coordinates torso/arm
        # rotation with the planned momentum so braking forces decelerate
        # the CoM instead of disappearing into base pitch.
        A_h = kin.centroidal_momentum_matrix(model, lR, lp)
        J_L = A_h[3:6] / model.total_mass
        w_L = jnp.broadcast_to(
            jnp.asarray(targets.ang_mom_w, dt), (3,)
        )
        Js = jnp.concatenate([Js, J_L], axis=0)
        es = jnp.concatenate([es, targets.ang_mom])
        W = jnp.concatenate([W, w_L])

    H = (Js * W[:, None]).T @ Js + cfg.damping * jnp.eye(nv, dtype=dt)
    g = (Js * W[:, None]).T @ es
    if targets.qd_lo is not None:
        mask = jnp.concatenate([jnp.zeros(6, dt), jnp.ones(model.nj, dt)])
        big = jnp.asarray(1e9, dt)
        lo = jnp.concatenate([jnp.full((6,), -big), targets.qd_lo])
        hi = jnp.concatenate([jnp.full((6,), big), targets.qd_hi])
        return solve_eq_box_qp(H, g, A, b, mask, lo, hi)
    return solve_eq_qp(H, g, A, b)
