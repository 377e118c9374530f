"""Bisect which MPC-stage output destabilizes the rigid plant: run the
full loop but freeze selected channels.

  --freeze-posture : q_reg/chest_yaw stay at initial (kill MANN posture)
  --freeze-plan    : contact plan never advances (no stepping; MPC solves
                     on the standing double-support plan)
  --freeze-forces  : forces0/zmp_des stay at the balanced initial guess
                     (x9 integrates standing forces; MPC diagnostics only)

Usage: python tools/exp_bisect.py --seconds 4 [--freeze-*...]
"""
import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

if "--cpu" in _sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from cmw_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()

from cmw_tpu.core import kinematics as kin
from cmw_tpu.mann.network import load_mann_weights
from cmw_tpu.runtime.config import ergocub_gazebo_v1
from cmw_tpu.runtime import loop as L
from cmw_tpu.sim.rigid_body import RigidBodyConfig

MANN = ("/root/reference/src/centroidal-mpc-walking/config/robots/"
        "ergoCubGazeboV1/onnx_50_mann4_smaller_steps.onnx")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--vx", type=float, default=0.0)
    ap.add_argument("--freeze-posture", action="store_true")
    ap.add_argument("--freeze-plan", action="store_true")
    ap.add_argument("--freeze-forces", action="store_true")
    ap.add_argument("--kin-odo", action="store_true",
                    help="kinematic-only odometry (ignore the IMU attitude)")
    ap.add_argument("--adherent", action="store_true",
                    help="adherent kinematic plant (no rigid body) — the "
                    "trace then shows COMMANDED base lean / CoM")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    if args.kin_odo:
        from cmw_tpu.estimation import legged_odom as LO
        LO_orig = LO.base_pose_fused
        L.legged_odom.base_pose_fused = (
            lambda model, odo, q, imu_R: L.legged_odom.base_pose(model, odo, q)
        )

    if args.freeze_plan:
        import cmw_tpu.core.contacts as C0
        orig = L.C.merge_plans
        L.C.merge_plans = lambda mann, prev, t: prev

    class Ctl(L.WalkingController):
        def _mpc_stage(self, s, inp):
            s2 = super()._mpc_stage(s, inp)
            if args.freeze_posture:
                s2 = s2._replace(q_reg=s.q_reg, chest_yaw=s.chest_yaw)
            if args.freeze_forces:
                s2 = s2._replace(
                    forces0=s.forces0, corner0=s.corner0,
                    active0=s.active0, zmp_des=s.zmp_des,
                )
            return s2

    cfg = ergocub_gazebo_v1(rigid=None if args.adherent else RigidBodyConfig())
    model = kin.ergocub_approx()
    ctl = Ctl(cfg, model, load_mann_weights(MANN))
    s0 = ctl.initial_state()
    S = int(args.seconds / cfg.wbc_dt)
    S -= S % cfg.mpc_every
    inputs = L.constant_inputs(S, (args.vx, 0.0, 1.0, 0.0))
    sN, tel = ctl.run_episode_blocked(s0, inputs)

    fz = np.asarray(tel.fz_act)
    up = np.asarray(tel.base_act_up)
    ca = np.asarray(tel.com_act)
    ci = np.asarray(tel.com_ik_target)
    com = np.asarray(tel.com_mpc)
    zd = np.asarray(tel.zmp_des)
    zm = np.asarray(tel.zmp_meas)
    dtw = cfg.wbc_dt
    dfz = fz[:, 0] - fz[:, 1]
    print(f"min_up={up.min():+.3f} max|dfz|={np.abs(dfz).max():5.0f} "
          f"max|cy_act|={np.abs(ca[:,1]).max():.4f} "
          f"end_ok={bool(up[-1] > 0.95)}")
    if args.trace:
        lean = np.asarray(tel.base_act_lean)  # [S,2] world-z of base x/y axes
        print("  t     up    leanx  leany  fzL   fzR  cx_des cx_act zdx    zmx    cy_des cy_act zdy    zmy")
        for t in np.arange(0, S, max(1, S // 40)):
            print(f"  {t*dtw:4.2f} {up[t]:+.3f} {lean[t,0]:+.3f} {lean[t,1]:+.3f} "
                  f"{fz[t,0]:5.0f} {fz[t,1]:5.0f} "
                  f"{com[t,0]:+.4f} {ca[t,0]:+.4f} {zd[t,0]:+.4f} {zm[t,0]:+.4f} "
                  f"{com[t,1]:+.4f} {ca[t,1]:+.4f} {zd[t,1]:+.4f} {zm[t,1]:+.4f}")


if __name__ == "__main__":
    main()
