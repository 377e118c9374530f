"""Inspect one episode on the FULL rigid-body plant (sim/rigid_body.py —
the Gazebo stand-in): does the physically simulated robot stand, walk,
and survive a push?

Usage: python tools/diag_rigid.py [push_y] [adjust|noadjust] [seconds] [vx]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import numpy as np
import jax.numpy as jnp

from cmw_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()

from cmw_tpu.cmpc.formulation import no_adjust
from cmw_tpu.core import kinematics as kin
from cmw_tpu.mann.network import load_mann_weights
from cmw_tpu.runtime.config import ergocub_gazebo_v1
from cmw_tpu.runtime.loop import WalkingController, constant_inputs
from cmw_tpu.sim.rigid_body import RigidBodyConfig

MANN = ("/root/reference/src/centroidal-mpc-walking/config/robots/"
        "ergoCubGazeboV1/onnx_50_mann4_smaller_steps.onnx")

push_y = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
mode = sys.argv[2] if len(sys.argv) > 2 else "adjust"
seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
vx = float(sys.argv[4]) if len(sys.argv) > 4 else 0.8

cfg = ergocub_gazebo_v1(rigid=RigidBodyConfig())
mpc = no_adjust(cfg.mpc) if mode == "noadjust" else cfg.mpc
cfg = ergocub_gazebo_v1(rigid=RigidBodyConfig(), mpc=mpc)
ctl = WalkingController(cfg, kin.ergocub_approx(), load_mann_weights(MANN))

S = int(seconds / cfg.wbc_dt)
S -= S % cfg.mpc_every
base = constant_inputs(S, (vx, 0.0, 1.0, 0.0))
i0, i1 = int(0.6 / cfg.wbc_dt), int(1.0 / cfg.wbc_dt)
push = jnp.zeros((S, 3)).at[i0:i1, 1].set(push_y)
inputs = base._replace(ext_force=push)

sN, tel = ctl.run_episode_blocked(ctl.initial_state(), inputs)
com = np.asarray(tel.com_mpc)
com_meas = np.asarray(tel.com_meas)
bp = np.asarray(tel.base_act_pos)
up = np.asarray(tel.base_act_up)
feet = np.asarray(tel.foot_pos_des)
fc = np.asarray(tel.foot_contact)
w = fc / np.maximum(fc.sum(1, keepdims=True), 1e-6)
supp = (w[..., None] * feet).sum(1)
rel = com[:, :2] - supp[:, :2]
trk = np.linalg.norm(com[:, :2] - com_meas[:, :2], axis=1)
print(f"mode={mode} push_y={push_y} vx={vx} S={S}")
print(f"  base_z range=[{bp[:,2].min():.3f},{bp[:,2].max():.3f}]  "
      f"min up={up.min():.3f}  finite={np.isfinite(bp).all()}")
print(f"  base_x travel={bp[-1,0]-bp[0,0]:+.3f}  max|base_y|={np.abs(bp[:,1]).max():.3f}")
print(f"  max|com-supp|_xy={np.abs(rel).max(0).round(3)}  max track_err={trk.max():.3f}")
lean = np.asarray(tel.base_act_lean)  # [S,2]: world-z of base x/y axes
fz = np.asarray(tel.fz_act)  # [S,2]
zd = np.asarray(tel.zmp_des)
zm = np.asarray(tel.zmp_meas)
print("  t      base_z  up      leanx   leany   fzL    fzR   zdx     zmx     zdy     zmy")
for t in np.arange(0, S, max(1, S // 28)):
    print(f"  {t*cfg.wbc_dt:4.2f}  {bp[t,2]:.3f}  {up[t]:+.3f}  {lean[t,0]:+.3f}  "
          f"{lean[t,1]:+.3f}  {fz[t,0]:5.0f}  {fz[t,1]:5.0f}  {zd[t,0]:+.3f}  {zm[t,0]:+.3f}"
          f"  {zd[t,1]:+.3f}  {zm[t,1]:+.3f}")
