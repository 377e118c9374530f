"""Tracking-lag diagnostic (VERDICT r4 item 1c): attribute the lateral
weight-transfer lag to plant servo dynamics vs controller scheduling.

Two modes on a saved episode npz (exp_rigid/exp_grid --save):

1. Default — pure analysis of the recorded closed loop:
   - per-joint command->actual lag + RMS error (cross-correlation of
     q[t] vs q_act[t] over the walking window),
   - CoM-y transfer lag: com_ik_target[1] vs com_act[1] (the measured
     ~0.2 s lateral lag every failure chain since round 2 traces to),
   - ZMP des vs meas lag.

2. --openloop — re-simulate the PLANT ALONE (sim/rigid_body.dynamics_step)
   from the controller's initial state under the RECORDED q command
   stream: if the open-loop plant reproduces the same joint lag, the lag
   is a servo property (gains/inertia), not an artifact of the estimator/
   stabilizer feedback. The reference's Gazebo plant is the behavioral
   target: 1 kHz ODE with the icub-models PID patch
   (dockerfiles/icub-models.patch:40-44).

Usage:
  python tools/diag_tracking.py /tmp/ep.npz [--item i] [--openloop]
      [--t0 1.0] [--t1 0] [--kw ...plant kw matching the episode...]
"""
import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def xcorr_lag(cmd, act, dt, max_lag_s=0.5):
    """Lag (s) maximizing correlation of act vs cmd (act assumed delayed);
    both detrended. Returns (lag_s, peak_corr, rms_err)."""
    c = cmd - cmd.mean()
    a = act - act.mean()
    n = len(c)
    max_l = int(max_lag_s / dt)
    denom = np.sqrt((c * c).sum() * (a * a).sum()) + 1e-12
    corrs = [
        (c[: n - l] * a[l:]).sum() / denom for l in range(0, max_l)
    ]
    li = int(np.argmax(corrs))
    return li * dt, float(corrs[li]), float(np.sqrt(np.mean((cmd - act) ** 2)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("--item", type=int, default=-1,
                    help="grid item (npz from exp_grid); -1 = single episode")
    ap.add_argument("--t0", type=float, default=1.0)
    ap.add_argument("--t1", type=float, default=0.0,
                    help="window end (0 = auto: fall time - 0.3 s)")
    ap.add_argument("--openloop", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--kw", nargs="*", default=[
        "perfect_state=True", "com_height_drop=0.10", "swing_height=0.07"])
    ap.add_argument("--rbdynkw", nargs="*", default=[],
                    help="plant overrides matching the episode (e.g. servo_kd=75)")
    ap.add_argument("--urdf", action="store_true")
    args = ap.parse_args()

    d = np.load(args.npz, allow_pickle=True)
    pick = (lambda x: x[args.item]) if args.item >= 0 else (lambda x: x)
    q = pick(d["q"])           # [S, nj] commanded (PositionDirect stream)
    qa = pick(d["q_act"])      # [S, nj] plant joints
    ci = pick(d["com_ik_target"])
    ca = pick(d["com_act"])
    zd = pick(d["zmp_des"])
    zm = pick(d["zmp_meas"])
    up = pick(d["base_act_up"])
    bp = pick(d["base_act_pos"])
    S = q.shape[0]
    dt = 0.002  # wbc_dt (ergoCubGazeboV1 preset)

    fallen = (up < 0.7) | (bp[:, 2] < 0.45)
    fell_i = int(np.argmax(fallen)) if fallen.any() else S
    i0 = int(args.t0 / dt)
    i1 = int(args.t1 / dt) if args.t1 > 0 else max(fell_i - int(0.3 / dt), i0 + 250)
    i1 = min(i1, S)
    print(f"window [{i0*dt:.2f}, {i1*dt:.2f}] s  (fell at {fell_i*dt:.2f})")

    print("\n== closed-loop recorded lags ==")
    lag, corr, rms = xcorr_lag(ci[i0:i1, 1], ca[i0:i1, 1], dt)
    print(f"com_y  ik_target->act : lag {lag*1e3:5.0f} ms  corr {corr:.3f}  rms {rms*1e3:.1f} mm")
    lag, corr, rms = xcorr_lag(ci[i0:i1, 0], ca[i0:i1, 0], dt)
    print(f"com_x  ik_target->act : lag {lag*1e3:5.0f} ms  corr {corr:.3f}  rms {rms*1e3:.1f} mm")
    lag, corr, rms = xcorr_lag(zd[i0:i1, 1], zm[i0:i1, 1], dt)
    print(f"zmp_y  des->meas      : lag {lag*1e3:5.0f} ms  corr {corr:.3f}  rms {rms*1e3:.1f} mm")

    # the lateral-authority joints: hip roll L/R (indices per
    # kinematics joint order: 1 = l_hip_roll, 7 = r_hip_roll on the
    # 26-joint ergoCub order), knees (3, 9), ankle rolls (5, 11)
    names = {1: "l_hip_roll", 7: "r_hip_roll", 3: "l_knee", 9: "r_knee",
             5: "l_ankle_roll", 11: "r_ankle_roll"}
    print("\njoint    (cmd->act)      lag_ms  corr   rms_deg")
    for j, nm in names.items():
        lag, corr, rms = xcorr_lag(q[i0:i1, j], qa[i0:i1, j], dt)
        print(f"{nm:22s} {lag*1e3:6.0f}  {corr:.3f}  {np.degrees(rms):7.2f}")

    if not args.openloop:
        return

    # ---- open-loop plant drive under the recorded command stream ----
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cmw_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from cmw_tpu.core import kinematics as kin
    from cmw_tpu.mann.network import load_mann_weights
    from cmw_tpu.runtime.config import ergocub_gazebo_v1
    from cmw_tpu.runtime.loop import WalkingController
    from cmw_tpu.sim import rigid_body as RB

    MANN = ("/root/reference/src/centroidal-mpc-walking/config/robots/"
            "ergoCubGazeboV1/onnx_50_mann4_smaller_steps.onnx")

    def parse_kw(items):
        out = {}
        for it in items:
            k, v = it.split("=", 1)
            out[k] = (v == "True") if v in ("True", "False") else (
                int(v) if v.lstrip("-").isdigit() else float(v))
        return out

    kw = parse_kw(args.kw)
    if "swing_height" in kw:
        from cmw_tpu.wbc.swing_foot import SwingFootConfig
        kw["swing"] = SwingFootConfig(step_height=float(kw.pop("swing_height")))
    from cmw_tpu.sim.rigid_body import RigidBodyConfig
    kw.setdefault("rigid", RigidBodyConfig())
    cfg = ergocub_gazebo_v1(**kw)
    model = kin.ergocub_urdf() if args.urdf else kin.ergocub_approx()
    ctl = WalkingController(cfg, model, load_mann_weights(MANN))
    s0 = ctl.initial_state()
    rb0 = s0.rb
    rdk = parse_kw(args.rbdynkw)
    if rdk:
        rb0 = rb0._replace(params=rb0.params._replace(
            **{k: jnp.asarray(float(v), jnp.float32) for k, v in rdk.items()}))

    qs = jnp.asarray(q, jnp.float32)

    def step(rb, q_cmd):
        rb = RB.dynamics_step(cfg.rigid, model, rb, q_cmd, cfg.wbc_dt)
        link_R, link_p = kin.fk(model, rb.q, rb.base_rot, rb.base_pos)
        return rb, (rb.q, kin.com(model, link_R, link_p), rb.base_rot[2, 2])

    run = jax.jit(lambda rb, qq: jax.lax.scan(step, rb, qq))
    _, (q_ol, com_ol, up_ol) = run(rb0, qs)
    q_ol = np.asarray(q_ol)
    com_ol = np.asarray(com_ol)
    up_ol = np.asarray(up_ol)

    fall_ol = up_ol < 0.7
    fell_ol = int(np.argmax(fall_ol)) if fall_ol.any() else S
    j1 = min(i1, max(fell_ol - int(0.3 / dt), i0 + 250))
    print(f"\n== open-loop plant (recorded q stream) ==")
    print(f"open-loop upright until {fell_ol*dt:.2f} s (closed loop fell {fell_i*dt:.2f})")
    print("joint    (cmd->act_ol)   lag_ms  corr   rms_deg")
    for j, nm in names.items():
        lag, corr, rms = xcorr_lag(q[i0:j1, j], q_ol[i0:j1, j], dt)
        print(f"{nm:22s} {lag*1e3:6.0f}  {corr:.3f}  {np.degrees(rms):7.2f}")
    lag, corr, rms = xcorr_lag(ci[i0:j1, 1], com_ol[i0:j1, 1], dt)
    print(f"com_y ik_target->open-loop com: lag {lag*1e3:.0f} ms corr {corr:.3f} rms {rms*1e3:.1f} mm")
    # divergence of the open-loop base path from the recorded one tells
    # how long the plant stays on the closed-loop trajectory without the
    # estimator/stabilizer feedback
    div = np.linalg.norm(com_ol[: i1] - ca[: i1], axis=1)
    for thr in (0.01, 0.03, 0.10):
        k = np.argmax(div > thr) if (div > thr).any() else i1
        print(f"open-loop CoM diverges >{thr*100:.0f} cm at t={k*dt:.2f} s")


if __name__ == "__main__":
    main()
