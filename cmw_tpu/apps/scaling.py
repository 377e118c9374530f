"""Scaling-efficiency report: batched MPC solves/s at 1..N devices.

The BASELINE.md target asks for "solves/s and efficiency at 1 chip,
1 host, N>=2 hosts". This harness measures weak scaling of the sharded
batched solve (fixed per-device batch, mesh grown one axis) and prints a
JSON report. On real hardware it exercises ICI collectives; on CPU (with
--xla_force_host_platform_device_count) it validates the same program and
gives relative efficiency numbers. Multi-host runs extend the same mesh
over DCN via jax.distributed.initialize() before calling main().

Example:
  python -m cmw_tpu.apps.scaling --cpu --devices 1,2,4,8 --per-device 8
"""

from __future__ import annotations

import argparse
import json
import time


def measure(n_dev: int, per_device: int, reps: int, chain: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cmw_tpu.cmpc import CentroidalMPCSolver, ergocub_mpc_config
    from cmw_tpu.cmpc.formulation import MPCParams
    from cmw_tpu.core import contacts
    from cmw_tpu.core.centroidal import pack_state

    cfg = ergocub_mpc_config()
    solver = CentroidalMPCSolver(cfg)
    plan = contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=8), cfg.dt)
    stage = contacts.mpc_stage_params(plan, 1.02, cfg.T, cfg.dt, cfg.n_slots)
    base = MPCParams(
        x0=pack_state(jnp.asarray([0.0, 0.0, 0.7]), jnp.zeros(3), jnp.zeros(3)),
        com_ref=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.7]), (cfg.N, 3)),
        ang_mom_ref=jnp.zeros((cfg.N, 3)),
        stage=stage,
        ext_force=jnp.zeros(3),
        ext_torque=jnp.zeros(3),
    )

    B = per_device * n_dev
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("batch",))
    sh = NamedSharding(mesh, P("batch"))

    pushes = jnp.zeros((B, 3)).at[:, 1].set(jnp.linspace(-1.0, 1.0, B))
    params = jax.vmap(lambda p: base._replace(ext_force=p))(pushes)
    params = jax.device_put(params, jax.tree_util.tree_map(lambda _: sh, params))
    warm = jax.device_put(
        jax.vmap(lambda _: solver.cold_start())(jnp.arange(B)),
        jax.tree_util.tree_map(lambda _: sh, solver.cold_start()._replace()),
    )

    def chain_step(w, _):
        sol = jax.vmap(solver.solve)(params, w)
        # pmean over the mesh: the sweep-metric reduction riding ICI
        mean_cost = jnp.mean(sol.cost)
        return jax.vmap(solver.warm_from)(params, sol), mean_cost

    fn = jax.jit(
        lambda w: jax.lax.scan(chain_step, w, None, length=chain)[1],
        out_shardings=NamedSharding(mesh, P()),
    )
    costs = fn(warm)
    float(costs.sum())  # sync
    t = time.perf_counter()
    for _ in range(reps):
        float(fn(warm).sum())
    dt = (time.perf_counter() - t) / reps / chain
    return B / dt


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", default="", help="comma list, default 1..N")
    p.add_argument("--per-device", type=int, default=64)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--chain", type=int, default=2)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import os

    if args.cpu and "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from cmw_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    n_avail = len(jax.devices())
    if args.devices:
        counts = [int(x) for x in args.devices.split(",")]
    else:
        counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]

    rows = []
    base_rate = None
    for n in counts:
        rate = measure(n, args.per_device, args.reps, args.chain)
        if base_rate is None:
            base_rate = rate
        rows.append(
            {
                "devices": n,
                "batch": n * args.per_device,
                "solves_per_s": round(rate, 1),
                "speedup": round(rate / base_rate, 2),
                "efficiency": round(rate / base_rate / n, 3),
            }
        )
        print(json.dumps(rows[-1]))

    print(
        json.dumps(
            {
                "metric": "scaling_report",
                "platform": jax.default_backend(),
                "per_device_batch": args.per_device,
                "rows": rows,
            }
        )
    )
    return rows


if __name__ == "__main__":
    main()
