#!/usr/bin/env python
"""Benchmark: batched centroidal-MPC solves/s on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference solves one 555-var CasADi/IPOPT NLP per MPC tick on a
CPU within a 60 ms budget (16.7 solves/s, BASELINE.md "implied per-solve
budget"); vs_baseline is our TPU solves/s relative to that.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cmw_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

from cmw_tpu.cmpc import CentroidalMPCSolver, ergocub_mpc_config
from cmw_tpu.core import contacts
from cmw_tpu.core.centroidal import pack_state
from cmw_tpu.cmpc.formulation import MPCParams

BASELINE_SOLVES_PER_S = 1.0 / 0.06  # reference: one solve per 60 ms MPC tick


def make_params(cfg, plan, t0, push):
    stage = contacts.mpc_stage_params(plan, t0, cfg.T, cfg.dt, cfg.n_slots)
    N = cfg.N
    com_ref = jnp.asarray([0.0, 0.0, 0.7]) + 0.08 * cfg.dt * jnp.arange(N)[:, None] * jnp.asarray(
        [1.0, 0.0, 0.0]
    )
    return MPCParams(
        x0=pack_state(jnp.asarray([0.0, 0.0, 0.7]), jnp.zeros(3), jnp.zeros(3)),
        com_ref=com_ref,
        ang_mom_ref=jnp.zeros((N, 3)),
        stage=stage,
        ext_force=push,
        ext_torque=jnp.zeros(3),
    )


def main():
    # CMW_PROFILE=<dir>: capture a jax.profiler trace of the batched section
    # (SURVEY §5.1 — the reference only has manual chrono spans; we get the
    # full XLA op timeline).
    profile_dir = os.environ.get("CMW_PROFILE", "")
    cfg = ergocub_mpc_config()
    solver = CentroidalMPCSolver(cfg)
    plan = contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=8), cfg.dt)

    base = make_params(cfg, plan, 1.02, jnp.zeros(3))

    # NB: under the axon tunnel block_until_ready does not imply completion;
    # pulling a scalar to the host is the reliable sync.
    sync = lambda out: float(out.cost.sum())

    # --- single-solve on-device latency: chain K warm-started solves in one
    # dispatch (receding-horizon shape), divide out the tunnel round-trip ----
    K = 10

    def chain(warm, _):
        sol = solver.solve(base, warm)
        return solver.warm_from(base, sol), sol.cost

    chained = jax.jit(lambda w: jax.lax.scan(chain, w, None, length=K)[1])
    w0 = solver.cold_start()
    float(chained(w0).sum())
    lat = []
    for _ in range(20):
        t = time.perf_counter()
        float(chained(w0).sum())
        lat.append((time.perf_counter() - t) / K)
    lat = np.array(lat)
    warm = solver.cold_start()

    # --- batched throughput ---------------------------------------------------
    # Chain KB warm-started batched solves inside ONE dispatch (each item is a
    # receding-horizon chain — the production shape) so the ~24 ms axon-tunnel
    # round trip is amortized out and the number reflects device time.
    B = 512
    KB = 4
    pushes = jnp.zeros((B, 3)).at[:, 1].set(jnp.linspace(-1.0, 1.0, B))
    batched_params = jax.vmap(lambda p: base._replace(ext_force=p))(pushes)
    warm_b = jax.vmap(lambda _: solver.cold_start())(jnp.arange(B))

    def chain_b(warm, _):
        sol = jax.vmap(solver.solve)(batched_params, warm)
        return jax.vmap(solver.warm_from)(batched_params, sol), sol.cost

    batched = jax.jit(lambda w: jax.lax.scan(chain_b, w, None, length=KB)[1])
    sync_b = lambda out: float(out.sum())
    sync_b(batched(warm_b))
    reps = 5
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            sync_b(batched(warm_b))
    t = time.perf_counter()
    for _ in range(reps):
        sync_b(batched(warm_b))
    dt_batch = (time.perf_counter() - t) / reps / KB
    solves_per_s = B / dt_batch

    # --- bf16-KKT throughput option (kkt_dtype="bf16") --------------------
    # halves the dominant HBM traffic; documented trade-off in
    # formulation.py (neighboring fixed point; push boundary -7%), so it is
    # NOT the default — reported here as the measured headroom
    import dataclasses as _dc

    solver16 = CentroidalMPCSolver(_dc.replace(cfg, kkt_dtype="bf16"))

    def chain_b16(warm, _):
        sol = jax.vmap(solver16.solve)(batched_params, warm)
        return jax.vmap(solver16.warm_from)(batched_params, sol), sol.cost

    batched16 = jax.jit(lambda w: jax.lax.scan(chain_b16, w, None, length=KB)[1])
    sync_b(batched16(warm_b))
    t = time.perf_counter()
    for _ in range(reps):
        sync_b(batched16(warm_b))
    solves_per_s_bf16 = B / ((time.perf_counter() - t) / reps / KB)

    # hardware-numerics sentinel: the Pallas KKT-inverse path must agree
    # with the XLA cholesky path ON REAL HARDWARE (CPU/interpret tests can't
    # see TPU numerics; an under-converged Newton-Schulz once passed tests
    # while destabilizing the closed loop)
    solver_x = CentroidalMPCSolver(ergocub_mpc_config(inverse_impl="xla"))
    sol_p = solver.solve(base, solver.cold_start())
    sol_x = solver_x.solve(base, solver_x.cold_start())
    cost_p, cost_x = float(sol_p.cost), float(sol_x.cost)
    numerics_ok = bool(
        abs(cost_p - cost_x) <= 0.02 * (abs(cost_x) + 1.0)
        and float(sol_p.prim_res) < 5e-2
    )

    result = {
        "metric": "batched_mpc_solves_per_s",
        "value": round(float(solves_per_s), 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(float(solves_per_s / BASELINE_SOLVES_PER_S), 2),
        "extra": {
            "batch": B,
            "single_solve_p50_ms": round(float(np.percentile(lat, 50) * 1e3), 3),
            "single_solve_p99_ms": round(float(np.percentile(lat, 99) * 1e3), 3),
            "sqp_iters": cfg.sqp_iters,
            "admm_iters": cfg.admm_iters,
            "numerics_ok": numerics_ok,
            "bf16_kkt_solves_per_s": round(float(solves_per_s_bf16), 2),
            "cost_pallas_vs_xla": [round(cost_p, 2), round(cost_x, 2)],
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
