"""Hardware-parity diagnostic: run one zero-push walking episode with the
flat and blocked episode paths and print the CoM trace.

Run `python tools/diag_drift.py cpu` and `python tools/diag_drift.py` (TPU)
and compare: the platforms must agree to ~1e-2 on every printed number
(CPU is true f32; any TPU-only divergence means a hardware-numerics bug in
a kernel — this script found the under-converged Newton-Schulz pivot
inverse in ops/spd_inverse.py that CPU/interpret tests cannot see).
Healthy output: max|com_y| ~ 0.03, final com ~ [0.89, -0.01, 0.76],
max_prim ~ 5e-3.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import numpy as np
import jax

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from cmw_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp

from cmw_tpu.core import kinematics as kin
from cmw_tpu.mann.network import load_mann_weights
from cmw_tpu.runtime.config import ergocub_gazebo_v1
from cmw_tpu.runtime.loop import WalkingController, constant_inputs

MANN = ("/root/reference/src/centroidal-mpc-walking/config/robots/"
        "ergoCubGazeboV1/onnx_50_mann4_smaller_steps.onnx")

ctl = WalkingController(ergocub_gazebo_v1(), kin.ergocub_approx(), load_mann_weights(MANN))
S = 990  # 1.98 s, divisible by mpc_every=30
inputs = constant_inputs(S, (0.8, 0.0, 1.0, 0.0))
s0 = ctl.initial_state()

for name, fn in (("flat", ctl.run_episode), ("blocked", ctl.run_episode_blocked)):
    sN, tel = fn(s0, inputs)
    com = np.asarray(tel.com_mpc)
    cm = np.asarray(tel.com_meas)
    prim = np.asarray(tel.mpc_prim)
    print(f"[{name}] dev={jax.devices()[0].platform} "
          f"max|com_y|={np.abs(com[:,1]).max():.4f} "
          f"final com={com[-1].round(3)} max_prim={prim.max():.3e} "
          f"max|meas-des|xy={np.abs(com[:,:2]-cm[:,:2]).max():.4f}")
    ts = np.arange(0, S, 100)
    print("  com_y @100-tick marks:", com[ts, 1].round(4))
    print("  com_x @100-tick marks:", com[ts, 0].round(4))
