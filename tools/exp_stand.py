"""Pure-standing isolation test: WBC stage only (no MANN, no MPC tick),
constant double-support plan + initial references. Separates the
stabilizer/IK/servo/contact loop from gait-plan effects.

Usage: python tools/exp_stand.py [seconds] [--kw ...] [--rbkw ...]
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
from cmw_tpu.runtime.loop import WalkingController, constant_inputs
from cmw_tpu.sim.rigid_body import RigidBodyConfig

MANN = ("/root/reference/src/centroidal-mpc-walking/config/robots/"
        "ergoCubGazeboV1/onnx_50_mann4_smaller_steps.onnx")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--kw", nargs="*", default=[])
    ap.add_argument("--rbkw", nargs="*", default=[])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    def parse_kw(items):
        out = {}
        for it in items:
            k, v = it.split("=", 1)
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
        return out

    import dataclasses as _dc
    from cmw_tpu.wbc.com_zmp import CoMZMPGains
    kw = parse_kw(args.kw)
    g = {}
    if "gains_com" in kw:
        v = kw.pop("gains_com"); g["com_gain"] = (v, v)
    if "gains_zmp" in kw:
        v = kw.pop("gains_zmp"); g["zmp_gain"] = (v, v)
    if g:
        kw["gains"] = CoMZMPGains(**{**_dc.asdict(CoMZMPGains()), **g})
    rb = RigidBodyConfig(**parse_kw(args.rbkw))
    cfg = ergocub_gazebo_v1(rigid=rb, **kw)
    model = kin.ergocub_approx()
    ctl = WalkingController(cfg, model, load_mann_weights(MANN))
    s0 = ctl.initial_state()

    S = int(args.seconds / cfg.wbc_dt)
    inputs = constant_inputs(S)

    # WBC-only episode: never run _mpc_stage; forces0/zmp_des stay at the
    # balanced initial guess, the plan stays the initial double support.
    @jax.jit
    def episode(s, inp):
        return jax.lax.scan(ctl._wbc_stage, s, inp)

    sN, tel = episode(s0, inputs)
    fz = np.asarray(tel.fz_act)
    up = np.asarray(tel.base_act_up)
    ca = np.asarray(tel.com_act)
    ci = np.asarray(tel.com_ik_target)
    cm = np.asarray(tel.com_meas)
    zm = np.asarray(tel.zmp_meas)
    dtw = cfg.wbc_dt
    dfz = fz[:, 0] - fz[:, 1]
    print(f"min_up={up.min():+.3f} max|dfz|={np.abs(dfz).max():5.0f} "
          f"max|cy_act|={np.abs(ca[:,1]).max():.4f} "
          f"stable={bool(up.min() > 0.98 and np.abs(dfz[-200:]).max() < 100)}")
    print("  t     up     fzL   fzR  cy_ik   cy_act  cy_meas zmy")
    for t in np.arange(0, S, max(1, S // 30)):
        print(f"  {t*dtw:4.2f} {up[t]:+.3f} {fz[t,0]:5.0f} {fz[t,1]:5.0f} "
              f"{ci[t,1]:+.4f} {ca[t,1]:+.4f} {cm[t,1]:+.4f} {zm[t,1]:+.4f}")


if __name__ == "__main__":
    main()
