"""Batched push-recovery sweep — BASELINE config 5.

Runs B perturbed closed-loop scenarios (lateral push pulses of varying
magnitude/direction) in parallel via vmap, optionally sharded over the
device mesh (dist/). Reports survival statistics and throughput.

Example:
  python -m cmw_tpu.apps.sweep --batch 64 --seconds 2 --mesh
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--push-max", type=float, default=2.0)
    p.add_argument(
        "--push-duration",
        type=float,
        default=0.4,
        help="push window length [s]; sustained pushes (>=1.5) are the "
        "regime where footstep adjustment separates from pinned footsteps",
    )
    p.add_argument("--mesh", action="store_true", help="shard the batch over all devices")
    p.add_argument("--kkt", default=None, choices=["dense", "riccati"],
                   help="force MPCConfig.kkt_impl (A/B the solver x-update)")
    p.add_argument("--chunk", type=int, default=512, help="scenarios per lax.map chunk (bounds peak memory)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--no-adjust",
        action="store_true",
        help="pin footsteps to nominal (disable the MPC's contact-location "
        "decision variables — the paper's step-adjustment ablation)",
    )
    p.add_argument(
        "--ablation",
        action="store_true",
        help="run the sweep twice (step adjustment on/off) and report both",
    )
    p.add_argument("--per-scenario", action="store_true", help="include per-scenario masks in the JSON")
    p.add_argument(
        "--fz-max",
        type=float,
        default=None,
        help="per-corner normal-force cap in units of g (mass-normalized). "
        "The default (3g) leaves force authority effectively unconstrained; "
        "a realistic leg (~1.6x body weight => ~0.4g/corner) saturates under "
        "large pushes, which is the regime where footstep adjustment matters",
    )
    p.add_argument(
        "--vx",
        type=float,
        default=None,
        help="commanded forward velocity (default: 0.8 adherent, 0.0 rigid "
        "— the physical gait steps in place while pushed, matching the "
        "paper's push-recovery protocol)",
    )
    p.add_argument(
        "--ramp",
        type=float,
        default=None,
        help="joystick ramp-in seconds (default: 1.0 rigid, 0 adherent — "
        "the rigid plant's measured operating point, exp_rigid --ramp)",
    )
    p.add_argument(
        "--push-t0",
        type=float,
        default=0.6,
        help="push window start [s] (move past the ramp for rigid runs)",
    )
    p.add_argument(
        "--rigid",
        action="store_true",
        help="run the scenarios on the full rigid-body dynamics plant "
        "(sim/rigid_body.py — the Gazebo stand-in) instead of the adherent "
        "kinematic plant; fall criterion becomes the physical base tipping "
        "over or collapsing",
    )
    p.add_argument(
        "--op-point",
        action="store_true",
        help="apply the measured rigid-gait operating point (RESULTS.md "
        "§5d: perfect_state, com_height_drop=0.10, swing_height=0.07)",
    )
    p.add_argument(
        "--mann",
        default=(
            "/root/reference/src/centroidal-mpc-walking/config/robots/"
            "ergoCubGazeboV1/onnx_50_mann4_smaller_steps.onnx"
        ),
    )
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from cmw_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from cmw_tpu.core import kinematics as kin
    from cmw_tpu.dist.sweep import run_sweep
    from cmw_tpu.mann.network import load_mann_weights
    from cmw_tpu.runtime.config import ergocub_gazebo_v1
    from cmw_tpu.runtime.loop import WalkingController

    from cmw_tpu.cmpc.formulation import no_adjust

    model = kin.ergocub_approx()
    weights = load_mann_weights(args.mann)

    def run(adjust: bool) -> dict:
        import dataclasses

        from cmw_tpu.core.centroidal import GRAVITY

        cfg = ergocub_gazebo_v1()
        mpc = cfg.mpc
        if args.fz_max is not None:
            mpc = dataclasses.replace(mpc, fz_max=args.fz_max * GRAVITY)
        if args.kkt is not None:
            mpc = dataclasses.replace(mpc, kkt_impl=args.kkt)
        if not adjust:
            mpc = no_adjust(mpc)
        kw = {}
        if args.rigid:
            from cmw_tpu.sim.rigid_body import RigidBodyConfig

            kw["rigid"] = RigidBodyConfig()
            if args.op_point:
                from cmw_tpu.wbc.swing_foot import SwingFootConfig

                kw.update(
                    perfect_state=True,
                    com_height_drop=0.10,
                    swing=SwingFootConfig(step_height=0.07),
                )
            if not adjust:
                # the paper's ablation is "online step adjustment off":
                # on the rigid path that must also pin the WBC-side
                # capture-step extension (config.step_ext_max), which is
                # step adjustment by another mechanism — leaving it on
                # would let the 'pinned' arm keep relocating landings
                kw["step_ext_max"] = 0.0
        cfg = ergocub_gazebo_v1(mpc=mpc, **kw)
        ctl = WalkingController(cfg, model, weights)
        t = time.perf_counter()
        vx = args.vx if args.vx is not None else (0.0 if args.rigid else 0.8)
        ramp = args.ramp if args.ramp is not None else (1.0 if args.rigid else 0.0)
        stats = run_sweep(
            ctl,
            batch=args.batch,
            seconds=args.seconds,
            push_max=args.push_max,
            use_mesh=args.mesh,
            chunk=args.chunk,
            per_scenario=args.per_scenario,
            push_duration=args.push_duration,
            vx=vx,
            ramp=ramp,
            push_t0=args.push_t0,
            # commanded-walking gait criterion at the operating point
            # (dist/sweep._shard_metrics docstring)
            up_thresh=0.7 if (args.rigid and args.op_point) else 0.9,
            model_guards=not (args.rigid and args.op_point),
        )
        wall = time.perf_counter() - t
        stats.update(
            {
                "step_adjustment": adjust,
                "wall_seconds": round(wall, 2),
                "scenario_seconds_per_s": round(args.batch * args.seconds / wall, 2),
                "devices": len(jax.devices()) if args.mesh else 1,
            }
        )
        return stats

    if args.ablation:
        on, off = run(True), run(False)
        print(
            json.dumps(
                {
                    "adjust_on": on,
                    "adjust_off": off,
                    "survival_gain": round(on["survival_rate"] - off["survival_rate"], 3),
                }
            )
        )
    else:
        print(json.dumps(run(not args.no_adjust)))


if __name__ == "__main__":
    main()
