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
    p.add_argument("--mesh", action="store_true", help="shard the batch over all devices")
    p.add_argument("--chunk", type=int, default=512, help="scenarios per lax.map chunk (bounds peak memory)")
    p.add_argument("--cpu", action="store_true")
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

    cfg = ergocub_gazebo_v1()
    ctl = WalkingController(cfg, kin.ergocub_approx(), load_mann_weights(args.mann))

    t = time.perf_counter()
    stats = run_sweep(
        ctl,
        batch=args.batch,
        seconds=args.seconds,
        push_max=args.push_max,
        use_mesh=args.mesh,
        chunk=args.chunk,
    )
    wall = time.perf_counter() - t
    stats.update(
        {
            "wall_seconds": round(wall, 2),
            "scenario_seconds_per_s": round(args.batch * args.seconds / wall, 2),
            "devices": len(jax.devices()) if args.mesh else 1,
        }
    )
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
