#!/usr/bin/env python
"""Vmapped rigid-gait knob grid: run K traced-knob settings as ONE batched
episode on the TPU — compile once, sweep everything.

The round-4 sweep workflow ran one `exp_rigid` process per knob setting
(~9 min each with cache load); the DynConfig/RigidDynParams knobs are
TRACED, so they can instead ride the batch axis of a single vmapped
`run_episode_blocked` call: K settings cost one compile + one batched
run (~minutes total).

Usage:
  python tools/exp_grid.py --seconds 10 --vx 0.8 --ramp 1.0 \
      --kw perfect_state=True com_height_drop=0.10 swing_height=0.07 \
      --grid "" "ang_mom_w=2000" "rush_gain=8 rush_margin=0.02" ...

Each --grid entry is a space-separated dynkw set ("" = defaults).
Plant-parameter overrides use the rb: prefix (e.g. "rb:servo_kd=200").
Per-item vx override: "vx=0.5" inside a grid entry (input, not a knob).
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


def parse_kw(items):
    out = {}
    for it in items:
        k, v = it.split("=", 1)
        try:
            out[k] = int(v) if v.lstrip("-").isdigit() else float(v)
        except ValueError:
            out[k] = v == "True" if v in ("True", "False") else v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--vx", type=float, default=0.8)
    ap.add_argument("--ramp", type=float, default=1.0)
    ap.add_argument("--kw", nargs="*", default=[])
    ap.add_argument("--rbkw", nargs="*", default=[])
    ap.add_argument("--grid", nargs="*", default=[""],
                    help="each entry: space-separated k=v dynkw set; "
                    "'rb:' prefix for plant params; 'vx=' for command")
    ap.add_argument("--urdf", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save", default="", help="save batched telemetry npz")
    ap.add_argument("--push-t0", type=float, default=1.5,
                    help="per-item push window start [s] (push=/pushy= keys)")
    ap.add_argument("--push-dur", type=float, default=0.4,
                    help="per-item push window length [s]")
    ap.add_argument("--no-adjust", action="store_true",
                    help="the paper's ablation arm: pin the MPC footsteps "
                    "to nominal (cmpc.formulation.no_adjust) AND zero the "
                    "WBC capture-step extension (step adjustment by "
                    "another mechanism)")
    args = ap.parse_args()

    kw = parse_kw(args.kw)
    if "swing_height" in kw:
        from cmw_tpu.wbc.swing_foot import SwingFootConfig
        kw["swing"] = SwingFootConfig(step_height=float(kw.pop("swing_height")))
    if args.no_adjust:
        kw["step_ext_max"] = 0.0
    cfg = ergocub_gazebo_v1(rigid=RigidBodyConfig(**parse_kw(args.rbkw)), **kw)
    if args.no_adjust:
        import dataclasses

        from cmw_tpu.cmpc.formulation import no_adjust

        cfg = dataclasses.replace(cfg, mpc=no_adjust(cfg.mpc))
    model = kin.ergocub_urdf() if args.urdf else kin.ergocub_approx()
    ctl = WalkingController(cfg, model, load_mann_weights(MANN))

    S = int(args.seconds / cfg.wbc_dt)
    S -= S % cfg.mpc_every
    t = jnp.arange(S) * cfg.wbc_dt
    r = jnp.clip(t / max(args.ramp, 1e-6), 0.0, 1.0) if args.ramp > 0 else jnp.ones(S)

    settings = []
    for entry in args.grid:
        d = parse_kw([tok for tok in entry.split() if tok])
        settings.append(d)
    K = len(settings)

    s0 = ctl.initial_state()
    s0b = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (K,) + a.shape).copy(), s0
    )
    # per-item dyn / plant overrides + per-item vx
    dyn = s0b.dyn
    rbp = s0b.rb.params
    vxs = np.full(K, args.vx, np.float32)
    push_xy = np.zeros((K, 2), np.float32)  # push=/pushy= keys [m/s^2]
    for i, d in enumerate(settings):
        for k, v in d.items():
            if k == "push":
                push_xy[i, 0] = float(v)
            elif k == "pushy":
                push_xy[i, 1] = float(v)
            elif k == "vx":
                vxs[i] = float(v)
            elif k.startswith("rb:"):
                f = k[3:]
                rbp = rbp._replace(
                    **{f: getattr(rbp, f).at[i].set(float(v))}
                )
            else:
                dyn = dyn._replace(**{k: getattr(dyn, k).at[i].set(float(v))})
    s0b = s0b._replace(dyn=dyn, rb=s0b.rb._replace(params=rbp))

    base = constant_inputs(S, (1.0, 0.0, 1.0, 0.0))
    joyb = jnp.stack(
        [
            base.joypad
            * jnp.stack([r * vxs[i], r * 0.0, jnp.ones(S), jnp.ones(S)], axis=1)
            for i in range(K)
        ]
    )
    inputs = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (K,) + a.shape), base
    )._replace(joypad=joyb)
    if push_xy.any():
        # per-item push pulse (mass-normalized, applied at the physical
        # base in rigid mode — runtime/loop ext_force_base). Pure input
        # data: reuses the compiled executable across push sweeps.
        i0 = int(args.push_t0 / cfg.wbc_dt)
        i1 = int((args.push_t0 + args.push_dur) / cfg.wbc_dt)
        win = jnp.zeros((S,)).at[i0:i1].set(1.0)
        pf = (
            win[None, :, None]
            * jnp.pad(jnp.asarray(push_xy), ((0, 0), (0, 1)))[:, None, :]
        )
        inputs = inputs._replace(ext_force=pf)

    fn = jax.jit(jax.vmap(ctl.run_episode_blocked))
    sN, tel = fn(s0b, inputs)
    up = np.asarray(tel.base_act_up)
    _ = float(up.sum())  # tunnel sync

    bp = np.asarray(tel.base_act_pos)
    fc = np.asarray(tel.foot_contact)
    hold = np.asarray(tel.gait_hold)
    dtw = cfg.wbc_dt
    for i, d in enumerate(settings):
        fallen = (up[i] < 0.7) | (bp[i, :, 2] < 0.45) | ~np.isfinite(bp[i]).all(1)
        fell_i = int(np.argmax(fallen)) if fallen.any() else S
        fell_t = fell_i * dtw if fallen.any() else float("inf")
        ss = (fc[i].sum(1) < 1.5)[:fell_i]
        swing_id = np.where(ss, np.argmin(fc[i, :fell_i], axis=1), -1)
        steps = int(np.sum((swing_id[1:] != swing_id[:-1]) & (swing_id[1:] >= 0)))
        tilt = np.degrees(np.arccos(np.clip(up[i, : max(fell_i, 1)], -1, 1)))
        print(
            f"GRID[{i:2d}] {(' '.join(f'{k}={v}' for k, v in d.items()) or 'defaults'):<52} "
            f"fell_t={fell_t if np.isfinite(fell_t) else -1:6.2f} steps={steps} "
            f"travel={bp[i, min(fell_i, S - 1), 0] - bp[i, 0, 0]:+.2f} "
            f"max_tilt={tilt.max():5.1f} hold={hold[i, :fell_i].mean() if fell_i else 0:.2f}"
        )
    if args.save:
        chans = {f: np.asarray(getattr(tel, f)) for f in tel._fields}
        np.savez(args.save, settings=np.array([str(d) for d in settings]),
                 **chans)


if __name__ == "__main__":
    main()
