"""Inspect one pushed episode: does the robot fall, or sidestep and keep
walking (CoM relative to the stance feet is the honest fall signal)?

Usage: python tools/diag_push.py [push_y] [adjust|noadjust] [sqp_iters] [admm_iters]

The optional iteration overrides separate "the dynamics are unrecoverable"
from "the fixed-trip-count SQP under-converged on a state far from the warm
start" — if a push survives at sqp=6 but falls at the default, the limit is
solver effort, not physics.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import sys
import numpy as np
import jax
import jax.numpy as jnp

from cmw_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()

from cmw_tpu.cmpc.formulation import no_adjust
from cmw_tpu.core import kinematics as kin
from cmw_tpu.mann.network import load_mann_weights
from cmw_tpu.runtime.config import ergocub_gazebo_v1
from cmw_tpu.runtime.loop import WalkingController, constant_inputs

MANN = ("/root/reference/src/centroidal-mpc-walking/config/robots/"
        "ergoCubGazeboV1/onnx_50_mann4_smaller_steps.onnx")

push_y = float(sys.argv[1]) if len(sys.argv) > 1 else 3.5
mode = sys.argv[2] if len(sys.argv) > 2 else "adjust"

cfg = ergocub_gazebo_v1()
mpc = no_adjust(cfg.mpc) if mode == "noadjust" else cfg.mpc
if len(sys.argv) > 3:
    mpc = dataclasses.replace(mpc, sqp_iters=int(sys.argv[3]), refactor_every_sqp=True)
if len(sys.argv) > 4:
    mpc = dataclasses.replace(mpc, admm_iters=int(sys.argv[4]))
cfg = ergocub_gazebo_v1(mpc=mpc)
ctl = WalkingController(cfg, kin.ergocub_approx(), load_mann_weights(MANN))

S = 1500  # 3.0 s
base = constant_inputs(S, (0.8, 0.0, 1.0, 0.0))
i0, i1 = int(0.6 / cfg.wbc_dt), int(1.0 / cfg.wbc_dt)
push = jnp.zeros((S, 3)).at[i0:i1, 1].set(push_y)
inputs = base._replace(ext_force=push)

sN, tel = ctl.run_episode_blocked(ctl.initial_state(), inputs)
com = np.asarray(tel.com_mpc)
feet = np.asarray(tel.foot_pos_des)  # [S, nc, 3]
fc = np.asarray(tel.foot_contact)  # [S, nc]
prim = np.asarray(tel.mpc_prim)
cost = np.asarray(tel.mpc_cost)
# support center: mean of feet in contact
w = fc / np.maximum(fc.sum(1, keepdims=True), 1e-6)
supp = (w[..., None] * feet).sum(1)  # [S, 3]
rel = com[:, :2] - supp[:, :2]
print(f"mode={mode} push_y={push_y} sqp={mpc.sqp_iters} admm={mpc.admm_iters} "
      f"refactor={mpc.refactor_every_sqp}")
print(f"  max|com_y|={np.abs(com[:,1]).max():.3f}  final com={com[-1].round(3)}")
print(f"  max|com-supp|_xy={np.abs(rel).max(0).round(3)}  final rel={rel[-1].round(3)}")
print(f"  com_z range=[{com[:,2].min():.3f},{com[:,2].max():.3f}] finite={np.isfinite(com).all()}")
print(f"  max prim_res={prim.max():.3e}  max cost={cost.max():.1f}")
ts = np.arange(0, S, 120)
print("  t      com_y    supp_y   rel_y    com_z    prim      cost")
for t in ts:
    print(f"  {t*0.002:4.2f}  {com[t,1]:+.3f}  {supp[t,1]:+.3f}  {rel[t,1]:+.3f}  "
          f"{com[t,2]:.3f}  {prim[t]:.2e}  {cost[t]:8.1f}")
