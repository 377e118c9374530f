"""Rigid-plant walking experiment harness: one episode per invocation with
the knobs under test as CLI args, printing a compact stability summary.

Usage:
  python tools/exp_rigid.py [--q0 ref|zeros] [--ramp S] [--seconds S]
      [--vx V] [--push-y A] [--noadjust] [--gain-scale G] [--csv]

Summary line: fell_t (first time base tilt > 45deg or base_z < 0.45),
steps (completed single-support phases), travel, max tilt before fall.
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

from cmw_tpu.cmpc.formulation import no_adjust
from cmw_tpu.core import kinematics as kin
from cmw_tpu.mann.network import load_mann_weights
from cmw_tpu.runtime.config import ergocub_gazebo_v1
from cmw_tpu.runtime.loop import WalkingController, constant_inputs
from cmw_tpu.sim.rigid_body import RigidBodyConfig

MANN = ("/root/reference/src/centroidal-mpc-walking/config/robots/"
        "ergoCubGazeboV1/onnx_50_mann4_smaller_steps.onnx")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q0", default="ready", choices=["ready", "zeros"],
                    help="ready = walk-ready crouch + pitched base (default)")
    ap.add_argument("--ramp", type=float, default=0.0, help="joystick ramp-in seconds")
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--vx", type=float, default=0.8)
    ap.add_argument("--push-y", type=float, default=0.0)
    ap.add_argument("--push-t", type=float, default=3.0)
    ap.add_argument("--push-dur", type=float, default=0.4)
    ap.add_argument("--noadjust", action="store_true")
    ap.add_argument("--trace", action="store_true", help="print the tick table")
    ap.add_argument("--trace-every", type=int, default=0,
                    help="trace stride in ticks (0 = ~60 rows over the episode)")
    ap.add_argument("--kw", nargs="*", default=[],
                    help="WalkingConfig override k=v (repeatable)")
    ap.add_argument("--dynkw", nargs="*", default=[],
                    help="DynConfig override k=v (traced knobs — NO recompile)")
    ap.add_argument("--rbdynkw", nargs="*", default=[],
                    help="RigidDynParams override k=v (traced plant params — "
                    "NO recompile; applied post-settle)")
    ap.add_argument("--rbkw", nargs="*", default=[],
                    help="RigidBodyConfig override k=v (repeatable)")
    ap.add_argument("--mpckw", nargs="*", default=[],
                    help="MPCConfig override k=v (repeatable)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--urdf", action="store_true",
                    help="use the checked-in ergoCub URDF model "
                    "(kin.ergocub_urdf) instead of ergocub_approx — the "
                    "inertial-model-error A/B (VERDICT r3 item 3)")
    ap.add_argument("--save", default="", help="save full telemetry npz here")
    args = ap.parse_args()

    def parse_kw(items):
        out = {}
        for it in items:
            k, v = it.split("=", 1)
            try:
                out[k] = int(v) if v.lstrip("-").isdigit() else float(v)
            except ValueError:
                out[k] = v
        return out

    rb = RigidBodyConfig(**parse_kw(args.rbkw))
    kw = parse_kw(args.kw)
    # nested overrides: gains_com=3.0 / gains_zmp=1.0 map into CoMZMPGains
    import dataclasses as _dc
    from cmw_tpu.wbc.com_zmp import CoMZMPGains
    g = {}
    if "gains_com" in kw:
        v = kw.pop("gains_com"); g["com_gain"] = (v, v)
    if "gains_zmp" in kw:
        v = kw.pop("gains_zmp"); g["zmp_gain"] = (v, v)
    if g:
        kw["gains"] = CoMZMPGains(**{**_dc.asdict(CoMZMPGains()), **g})
    if "swing_height" in kw:
        from cmw_tpu.wbc.swing_foot import SwingFootConfig
        kw["swing"] = SwingFootConfig(step_height=float(kw.pop("swing_height")))
    if "chest_weight" in kw:
        from cmw_tpu.wbc.diff_ik import IKConfig
        w = float(kw.pop("chest_weight"))
        kw["ik"] = _dc.replace(IKConfig(), chest_weight=(w, w, w))
    bbox_x = kw.pop("bbox_x", None)
    if args.mpckw or bbox_x is not None:
        from cmw_tpu.cmpc.formulation import MPCConfig
        mpc = _dc.replace(MPCConfig(), **parse_kw(args.mpckw))
        if bbox_x is not None:
            # widen the footstep-adjustment x-authority (the reference's
            # +-0.01 m, centroidal_mpc.ini:30-31,41-42) — lets the MPC
            # absorb forward momentum by stepping longer
            bx = float(bbox_x)
            mpc = _dc.replace(
                mpc,
                bbox_lower=tuple((-bx, lo[1], lo[2]) for lo in mpc.bbox_lower),
                bbox_upper=tuple((bx, hi[1], hi[2]) for hi in mpc.bbox_upper),
            )
        kw["mpc"] = mpc
    cfg = ergocub_gazebo_v1(rigid=rb, **kw)
    if args.noadjust:
        kw.pop("mpc", None)
        cfg = ergocub_gazebo_v1(rigid=rb, mpc=no_adjust(cfg.mpc), **kw)
    model = kin.ergocub_urdf() if args.urdf else kin.ergocub_approx()
    ctl = WalkingController(cfg, model, load_mann_weights(MANN))

    S = int(args.seconds / cfg.wbc_dt)
    S -= S % cfg.mpc_every
    base = constant_inputs(S, (args.vx, 0.0, 1.0, 0.0))
    if args.ramp > 0:
        t = jnp.arange(S) * cfg.wbc_dt
        r = jnp.clip(t / args.ramp, 0.0, 1.0)
        base = base._replace(joypad=base.joypad * jnp.stack(
            [r, r, jnp.ones(S), jnp.ones(S)], axis=1))
    if args.push_y != 0.0:
        i0 = int(args.push_t / cfg.wbc_dt)
        i1 = int((args.push_t + args.push_dur) / cfg.wbc_dt)
        base = base._replace(
            ext_force=base.ext_force.at[i0:i1, 1].set(args.push_y))

    if args.q0 == "zeros":
        s0 = ctl.initial_state(q0=jnp.zeros(model.nj), base_rot0=jnp.eye(3))
    else:
        s0 = ctl.initial_state()
    dk = parse_kw(args.dynkw)
    if dk:
        s0 = s0._replace(dyn=s0.dyn._replace(
            **{k: jnp.asarray(float(v), jnp.float32) for k, v in dk.items()}
        ))
    rdk = parse_kw(args.rbdynkw)
    if rdk:
        s0 = s0._replace(rb=s0.rb._replace(params=s0.rb.params._replace(
            **{k: jnp.asarray(float(v), jnp.float32) for k, v in rdk.items()}
        )))
    sN, tel = ctl.run_episode_blocked(s0, base)
    if args.save:
        from cmw_tpu.runtime import telemetry as _tm
        _tm.save(args.save, tel, cfg.wbc_dt)
        print(f"saved telemetry -> {args.save}")

    bp = np.asarray(tel.base_act_pos)
    up = np.asarray(tel.base_act_up)
    fz = np.asarray(tel.fz_act)
    fc = np.asarray(tel.foot_contact)
    dtw = cfg.wbc_dt

    fallen = (up < 0.7) | (bp[:, 2] < 0.45) | ~np.isfinite(bp).all(1)
    fell_i = int(np.argmax(fallen)) if fallen.any() else S
    fell_t = fell_i * dtw if fallen.any() else float("inf")
    # completed steps: count planned single-support phases fully executed
    # before the fall (transitions of which foot is in swing)
    ss = (fc.sum(1) < 1.5)[:fell_i]  # single support mask
    swing_id = np.where(ss, np.argmin(fc[:fell_i], axis=1), -1)
    steps = int(np.sum((swing_id[1:] != swing_id[:-1]) & (swing_id[1:] >= 0)))
    tilt_deg = np.degrees(np.arccos(np.clip(up[:max(fell_i, 1)], -1, 1)))
    hold = np.asarray(tel.gait_hold)[:fell_i]
    print(
        f"RESULT fell_t={fell_t if np.isfinite(fell_t) else -1:.2f} "
        f"steps={steps} travel={bp[min(fell_i, S - 1), 0] - bp[0, 0]:+.2f} "
        f"max_tilt={tilt_deg.max():.1f}deg "
        f"survived={not fallen.any()} S={S} "
        f"hold_frac={hold.mean() if hold.size else 0.0:.3f}"
    )
    if args.trace:
        lean = np.asarray(tel.base_act_lean)
        zd = np.asarray(tel.zmp_des)
        zm = np.asarray(tel.zmp_meas)
        com = np.asarray(tel.com_mpc)
        cm = np.asarray(tel.com_meas)
        ci = np.asarray(tel.com_ik_target)
        ca = np.asarray(tel.com_act)
        fp = np.asarray(tel.foot_pos_des)
        lean = np.asarray(tel.base_act_lean)
        hld = np.asarray(tel.gait_hold)
        vc = np.asarray(tel.vcom_zmp)
        ft = np.asarray(tel.ft_act)
        qc = np.asarray(tel.q)
        qa = np.asarray(tel.q_act)
        print("  t     bz    up    leanx  leany  fzL   fzR  fyL   fyR  cx_des cx_act | cy_des cy_ik  cy_est cy_act zdy    zmy    vcmdy | kLc   kLa   kRc   kRa  | fLz_d fRz_d cL cR H")
        stride = args.trace_every if args.trace_every > 0 else max(1, S // 60)
        for t in np.arange(0, S, stride):
            print(f"  {t*dtw:4.2f} {bp[t,2]:.3f} {up[t]:+.3f} "
                  f"{lean[t,0]:+.3f} {lean[t,1]:+.3f} "
                  f"{fz[t,0]:5.0f} {fz[t,1]:5.0f} "
                  f"{ft[t,0,1]:+5.0f} {ft[t,1,1]:+5.0f} "
                  f"{com[t,0]:+.3f} {ca[t,0]:+.3f} | "
                  f"{com[t,1]:+.3f} {ci[t,1]:+.3f} {cm[t,1]:+.3f} {ca[t,1]:+.3f} "
                  f"{zd[t,1]:+.3f} {zm[t,1]:+.3f} {vc[t,1]:+.3f} | "
                  f"{qc[t,3]:+.2f} {qa[t,3]:+.2f} {qc[t,9]:+.2f} {qa[t,9]:+.2f} | "
                  f"{fp[t,0,2]:+.3f} {fp[t,1,2]:+.3f} "
                  f"{fc[t,0]:.0f}  {fc[t,1]:.0f}  {hld[t]:.0f}")


if __name__ == "__main__":
    main()
