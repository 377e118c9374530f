#!/usr/bin/env python
"""Print a compact per-item failure report from an exp_grid --save npz:
speed profile, support state, capture-point overshoot vs the loaded toe,
hold/rush activity, base height/tilt — the channels that discriminate the
round-4 failure modes (RESULTS.md §5d).

Usage: python tools/trace_report.py /tmp/grid3.npz [--item 0] [--dt 0.002]
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("--item", type=int, default=0)
    ap.add_argument("--dt", type=float, default=0.002)
    ap.add_argument("--win", type=float, default=0.25, help="report bin [s]")
    args = ap.parse_args()
    d = np.load(args.npz, allow_pickle=True)
    i = args.item
    print("settings:", d["settings"][i])
    up = d["base_act_up"][i]
    bp = d["base_act_pos"][i]
    com = d["com_act"][i]
    fc = d["foot_contact"][i]
    fz = d["fz_act"][i]
    hold = d["gait_hold"][i]
    rush = d["gait_rush"][i]
    fpd = d["foot_pos_des"][i]
    S = up.shape[0]
    t = np.arange(S) * args.dt
    fallen = (up < 0.7) | (bp[:, 2] < 0.45) | ~np.isfinite(bp).all(1)
    fell = int(np.argmax(fallen)) if fallen.any() else S
    print(f"fell_t={fell*args.dt:.2f}  S={S}")
    # planar speed of the true CoM (101-tap smoothed derivative)
    v = np.gradient(com[:, 0:2], args.dt, axis=0)
    k = np.ones(101) / 101
    vs = np.stack([np.convolve(v[:, j], k, mode="same") for j in range(2)], -1)
    spd = np.linalg.norm(vs, axis=-1)
    z = np.clip(com[:, 2], 0.3, None)
    cp = com[:, 0:2] + vs * np.sqrt(z / 9.80665)[:, None]
    # loaded-toe coverage along the velocity direction
    loaded = fz > 0.05 * 56.0 * 9.8
    dirv = vs / np.maximum(spd, 1e-6)[:, None]
    along = np.einsum("tcx,tx->tc", fpd[:, :, 0:2], dirv)
    toe = np.where(loaded, along + 0.08, -1e9).max(axis=1)
    cp_al = np.einsum("tx,tx->t", cp, dirv)
    over = cp_al - toe
    ds = fc.sum(1) > 1.5  # double support
    nb = int(args.win / args.dt)
    print(" t[s]  spd  com_z  up    ds%  hold rush  cp_over  fzL   fzR")
    for b in range(0, min(fell + nb, S), nb):
        e = min(b + nb, S)
        print(
            f"{t[b]:5.2f} {spd[b:e].mean():5.2f} {com[b:e,2].mean():5.2f} "
            f"{up[b:e].min():5.2f} {ds[b:e].mean():4.2f} {hold[b:e].mean():4.2f} "
            f"{rush[b:e].mean():4.2f} {over[b:e].max():+7.3f} "
            f"{fz[b:e,0].mean():5.0f} {fz[b:e,1].mean():5.0f}"
        )
    # where does speed first exceed thresholds, and what support state?
    for thr in (0.4, 0.5, 0.6, 0.8):
        idx = np.argmax(spd[:fell] > thr) if (spd[:fell] > thr).any() else -1
        if idx >= 0:
            print(
                f"spd>{thr}: t={idx*args.dt:.2f} ds={bool(ds[idx])} "
                f"hold={hold[idx]:.0f} over={over[idx]:+.3f}"
            )
        else:
            print(f"spd>{thr}: never (max {spd[:fell].max():.2f})")


if __name__ == "__main__":
    main()
