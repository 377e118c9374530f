#!/usr/bin/env python
"""Stand-mode threshold sweep (VERDICT r3 item 9): how far can the
shipped MANN nets be trusted at low commanded speed?

The stand-mode departure (config.stand_mode docstring) freezes the
autoregression below `stand_threshold` because the shipped nets drift at
standstill. This tool measures where that trust boundary actually is:
for each commanded motion magnitude, run the ADHERENT closed loop with
stand-mode DISABLED and record

  * drift rate of the CoM command once the transient settles (a standing
    robot should hold station; the net's standstill drift shows up here),
  * contact churn (plan lift/land edges — phantom stepping),
  * survival (finite states, support never empty).

Usage: python tools/exp_standmode.py [--seconds 8] [--cpu]
       [--levels 0 0.01 0.02 0.05 0.1 0.2 0.4]
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

MANN = ("/root/reference/src/centroidal-mpc-walking/config/robots/"
        "ergoCubGazeboV1/onnx_50_mann4_smaller_steps.onnx")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--levels", nargs="*", type=float,
                    default=[0.0, 0.01, 0.02, 0.05, 0.1, 0.2, 0.4])
    ap.add_argument("--mann8", action="store_true",
                    help="use the mann8 net instead of mann4")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    mann = MANN.replace(
        "onnx_50_mann4_smaller_steps",
        "onnx_50_mann8_smaller_steps_wider_legs_and_arms",
    ) if args.mann8 else MANN
    cfg = ergocub_gazebo_v1(stand_mode=False)
    model = kin.ergocub_approx()
    ctl = WalkingController(cfg, model, load_mann_weights(mann))

    S = int(args.seconds / cfg.wbc_dt)
    S -= S % cfg.mpc_every
    half = S // 2  # judge drift on the settled second half

    print(f"net={'mann8' if args.mann8 else 'mann4'} stand_mode=OFF "
          f"seconds={args.seconds} device={jax.devices()[0]}")
    print(" level | drift m/s | edges/s | max|com-feet| | finite")
    for lv in args.levels:
        inputs = constant_inputs(S, (lv, 0.0, 1.0, 0.0))
        sN, tel = ctl.run_episode_blocked(ctl.initial_state(), inputs)
        com = np.asarray(tel.com_mpc)
        fc = np.asarray(tel.foot_contact)
        fin = bool(np.isfinite(com).all() and (fc.sum(1) >= 1).all())
        # settled-half drift of the commanded CoM (xy speed of the fit line)
        t2 = np.arange(S - half) * cfg.wbc_dt
        drift = np.hypot(
            *np.polyfit(t2, com[half:, 0:2], 1)[0]
        ) if fin else float("nan")
        edges = float(np.abs(np.diff(fc, axis=0)).sum() / args.seconds)
        # support-relative excursion: CoM distance to the stance centroid
        feet = np.asarray(tel.foot_pos_des)
        w = fc / np.maximum(fc.sum(1, keepdims=True), 1.0)
        mid = (feet[..., 0:2] * w[..., None]).sum(1)
        exc = float(np.abs(com[:, 0:2] - mid).max()) if fin else float("nan")
        print(f" {lv:5.2f} | {drift:9.4f} | {edges:7.2f} | {exc:13.3f} | {fin}")


if __name__ == "__main__":
    main()
