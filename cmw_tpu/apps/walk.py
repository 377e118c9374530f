"""Closed-loop walking demo — the `cmw-walking` equivalent.

Runs the full MANN -> CentroidalMPC -> WBC loop for a scripted joystick
schedule and writes telemetry (npz). The reference's interactive
SDL joypad (cmw-FakeJoypad, SURVEY.md R4-R6) maps to `--joystick`
segments: "t0:mx,my,fx,fy" changes the command at time t0.

Example:
  python -m cmw_tpu.apps.walk --seconds 4 --joystick 0:1,0,1,0 2:0,1,1,0
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seconds", type=float, default=3.0)
    p.add_argument("--robot", default="ergoCubGazeboV1", choices=["ergoCubGazeboV1", "ergoCubSN000"])
    p.add_argument(
        "--robot-dir",
        default=None,
        help="load the WalkingConfig from a reference-style ini config dir "
        "(e.g. .../config/robots/ergoCubGazeboV1); overrides --robot",
    )
    p.add_argument(
        "--mann",
        default=(
            "/root/reference/src/centroidal-mpc-walking/config/robots/"
            "ergoCubGazeboV1/onnx_50_mann4_smaller_steps.onnx"
        ),
    )
    p.add_argument("--urdf", default=None, help="optional robot URDF (default: built-in model)")
    p.add_argument("--joystick", nargs="*", default=["0:1,0,1,0"], help="t0:mx,my,fx,fy segments")
    p.add_argument("--push", default=None, help="t0,t1,fx,fy,fz external push window")
    p.add_argument("--out", default="walk_telemetry.npz")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument(
        "--interactive",
        action="store_true",
        help="drive with the terminal joypad on the native real-time scheduler "
        "(the reference's cmw-FakeJoypad + AdvanceableRunner mode)",
    )
    p.add_argument(
        "--time-scale",
        type=float,
        default=0.05,
        help="interactive virtual-clock rate vs wall time (the Gazebo "
        "real_time_factor analog, worlds/*/world:7)",
    )
    p.add_argument("--save-state", default=None, help="write a loop-state checkpoint here")
    p.add_argument("--resume-state", default=None, help="resume from a loop-state checkpoint")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from cmw_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from cmw_tpu.core import kinematics as kin
    from cmw_tpu.mann.network import load_mann_weights
    from cmw_tpu.runtime import telemetry
    from cmw_tpu.runtime.config import ergocub_gazebo_v1, ergocub_sn000
    from cmw_tpu.runtime.loop import TickInput, WalkingController

    if args.robot_dir:
        from cmw_tpu.runtime.ini import load_robot_config

        cfg = load_robot_config(args.robot_dir)
    else:
        cfg = ergocub_gazebo_v1() if args.robot == "ergoCubGazeboV1" else ergocub_sn000()
    if args.urdf:
        from cmw_tpu.core.kinematics import ergocub_urdf

        # "builtin" loads the checked-in cmw_tpu/models/ergocub.urdf; any
        # other value is a path to an ergoCub-convention URDF (sole/chest
        # frame links per tools/gen_ergocub_urdf.py)
        model = ergocub_urdf(None if args.urdf == "builtin" else args.urdf)
    else:
        model = kin.ergocub_approx()
    ctl = WalkingController(cfg, model, load_mann_weights(args.mann))

    if args.interactive:
        from cmw_tpu.apps.joypad import TerminalJoypad
        from cmw_tpu.runtime.realtime import RealtimeWalker

        rw = RealtimeWalker(ctl, time_scale=args.time_scale)
        if args.resume_state:
            from cmw_tpu.runtime import checkpoint

            rw.state = checkpoint.load(args.resume_state, rw.state)
        jp = TerminalJoypad(rw.set_joypad)
        jp.start()
        print(
            "interactive walk: w/s fwd/back, a/d left/right, q/e yaw, "
            "space stop, x quit (Ctrl-C to end)",
            flush=True,
        )
        try:
            stats = rw.run(args.seconds / args.time_scale, install_signals=True)
        finally:
            jp.stop()
        if args.save_state:
            from cmw_tpu.runtime import checkpoint

            checkpoint.save(args.save_state, rw.state, meta={"t": float(rw.state.t)})
        print(json.dumps(stats))
        return

    S = int(round(args.seconds / cfg.wbc_dt))
    joy = np.zeros((S, 4), np.float32)
    segs = []
    for seg in args.joystick:
        t0, vals = seg.split(":")
        segs.append((float(t0), [float(v) for v in vals.split(",")]))
    for t0, vals in sorted(segs):
        joy[int(t0 / cfg.wbc_dt) :] = vals
    ext = np.zeros((S, 3), np.float32)
    if args.push:
        t0, t1, fx, fy, fz = [float(v) for v in args.push.split(",")]
        ext[int(t0 / cfg.wbc_dt) : int(t1 / cfg.wbc_dt)] = [fx, fy, fz]

    inputs = TickInput(
        joypad=jnp.asarray(joy), ext_force=jnp.asarray(ext), ext_torque=jnp.zeros((S, 3))
    )
    s0 = ctl.initial_state()
    if args.resume_state:
        from cmw_tpu.runtime import checkpoint

        s0 = checkpoint.load(args.resume_state, s0)
    t = time.perf_counter()
    sN, tel = ctl.run_episode(s0, inputs)
    com = np.asarray(tel.com_mpc)  # also blocks
    wall = time.perf_counter() - t
    if args.save_state:
        from cmw_tpu.runtime import checkpoint

        checkpoint.save(args.save_state, sN, meta={"t": float(sN.t)})

    telemetry.save(args.out, tel, cfg.wbc_dt, extra={"robot": args.robot})
    summary = {
        "ticks": S,
        "sim_seconds": args.seconds,
        "wall_seconds": round(wall, 2),
        "realtime_factor": round(args.seconds / wall, 2),
        "com_travel_xy": [round(float(com[-1, i] - com[0, i]), 3) for i in (0, 1)],
        "com_z_range": [round(float(com[:, 2].min()), 3), round(float(com[:, 2].max()), 3)],
        "finite": bool(np.isfinite(com).all()),
        "mpc_prim_max": float(np.asarray(tel.mpc_prim).max()),
        "telemetry": args.out,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
