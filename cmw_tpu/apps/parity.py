"""Solver parity check — JAX SQP vs the independent scipy-f64 oracle.

The reference validated its controller end-to-end in simulation
(SURVEY.md §4); this tool is the quantitative equivalent for the solver
core: identical OCPs solved by two disjoint implementations.

Example: python -m cmw_tpu.apps.parity --horizon 0.6
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--horizon", type=float, default=0.6)
    p.add_argument("--sqp-iters", type=int, default=10)
    p.add_argument("--admm-iters", type=int, default=150)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from cmw_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from cmw_tpu.cmpc import CentroidalMPCSolver, MPCParams, ergocub_mpc_config
    from cmw_tpu.cmpc import oracle
    from cmw_tpu.core import contacts
    from cmw_tpu.core.centroidal import pack_state

    cfg = ergocub_mpc_config(
        horizon=args.horizon, sqp_iters=args.sqp_iters, admm_iters=args.admm_iters
    )
    solver = CentroidalMPCSolver(cfg)
    results = []

    def case(name, plan, t0, com0, x0=None, push=(0.0, 0.0, 0.0), drift=0.0):
        stage = contacts.mpc_stage_params(plan, t0, cfg.T, cfg.dt, cfg.n_slots)
        com_ref = jnp.broadcast_to(jnp.asarray(com0), (cfg.N, 3))
        if drift:
            com_ref = com_ref + drift * cfg.dt * jnp.arange(cfg.N)[:, None] * jnp.asarray([1.0, 0, 0])
        params = MPCParams(
            x0=pack_state(jnp.asarray(x0 if x0 is not None else com0), jnp.zeros(3), jnp.zeros(3)),
            com_ref=com_ref,
            ang_mom_ref=jnp.zeros((cfg.N, 3)),
            stage=stage,
            ext_force=jnp.asarray(push),
            ext_torque=jnp.zeros(3),
        )
        sol = solver.solve(params, solver.cold_start())
        z_o, c_o, res = oracle.solve_oracle(cfg, params)
        results.append(
            {
                "case": name,
                "jax_cost": round(float(sol.cost), 5),
                "oracle_cost": round(float(c_o), 5),
                "ratio": round(float(sol.cost) / max(c_o, 1e-9), 4),
                "oracle_status": int(res.status),
                "prim_res": float(sol.prim_res),
            }
        )

    # standing with offset
    plan = contacts.empty_plan(2, 8)
    plan = plan._replace(
        act=plan.act.at[:, 0].set(0.0),
        deact=plan.deact.at[:, 0].set(1e6),
        valid=plan.valid.at[:, 0].set(1.0),
        pos=plan.pos.at[0, 0, 1].set(0.08).at[1, 0, 1].set(-0.08),
    )
    case("standing_offset", plan, 0.0, [0.0, 0.0, 0.7], x0=[0.03, 0.01, 0.69])
    gait = contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=8), cfg.dt)
    case("walking", gait, 0.9, [0.0, 0.0, 0.7], drift=0.1)
    case("walking_push", gait, 1.02, [0.0, 0.0, 0.7], push=(0.0, 1.0, 0.0), drift=0.08)

    ok = all(r["ratio"] <= 1.02 and r["oracle_status"] == 0 for r in results)
    print(json.dumps({"parity_ok": ok, "cases": results}))


if __name__ == "__main__":
    main()
