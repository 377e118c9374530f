#!/usr/bin/env python
"""Benchmark: batched centroidal-MPC solves/s on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Baseline: the reference solves one 555-var CasADi/IPOPT NLP per MPC tick on a
CPU within a 60 ms budget (16.7 solves/s, BASELINE.md "implied per-solve
budget"); vs_baseline is our TPU solves/s relative to that.

Structure (round-2 fix, VERDICT.md item 1): the headline JSON line is printed
immediately after the single batched measurement — ONE cold compile before any
output, everything else (latency chain, bf16 option, Pallas-vs-XLA numerics
sentinel) runs AFTER the line is out and only under CMW_BENCH_FULL=1, appended
to the same line's file copy `BENCH_EXTRA.json` instead of stdout. A timeout
mid-extras can no longer erase the scoreboard.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from cmw_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

from cmw_tpu.cmpc import CentroidalMPCSolver, ergocub_mpc_config
from cmw_tpu.core import contacts
from cmw_tpu.core.centroidal import pack_state
from cmw_tpu.cmpc import formulation as F
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
    profile_dir = os.environ.get("CMW_PROFILE", "")
    full = os.environ.get("CMW_BENCH_FULL", "") == "1"
    cfg = ergocub_mpc_config()
    solver = CentroidalMPCSolver(cfg)
    plan = contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=8), cfg.dt)
    base = make_params(cfg, plan, 1.02, jnp.zeros(3))

    # --- headline: batched throughput (the ONLY cold compile before output) ---
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
    # NB: under the axon tunnel block_until_ready does not imply completion;
    # pulling a scalar to the host is the reliable sync.
    sync_b = lambda out: float(out.sum())
    t_compile = time.perf_counter()
    sync_b(batched(warm_b))
    compile_s = time.perf_counter() - t_compile
    reps = 5
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            sync_b(batched(warm_b))
    t = time.perf_counter()
    for _ in range(reps):
        sync_b(batched(warm_b))
    dt_batch = (time.perf_counter() - t) / reps / KB
    solves_per_s = B / dt_batch

    # hardware-numerics sentinel IN THE HEADLINE (round-4 VERDICT weak #6):
    # the Pallas KKT-inverse path must agree with the XLA cholesky path on
    # real hardware — an under-converged Newton-Schulz once passed CPU tests
    # while silently destabilizing the closed loop (RESULTS.md §4.1). Two
    # single solves; guarded so a sentinel failure can never erase the
    # throughput line (it reports numerics_ok=false instead).
    cost_p = cost_x = float("nan")
    try:
        # cross-implementation check: the DEFAULT path (riccati since
        # round 5) vs the dense XLA-cholesky path — two independent
        # factorizations of the same KKT operator must agree on hardware
        solver_x = CentroidalMPCSolver(
            ergocub_mpc_config(kkt_impl="dense", inverse_impl="xla")
        )
        sol_p = solver.solve(base, solver.cold_start())
        sol_x = solver_x.solve(base, solver_x.cold_start())
        cost_p, cost_x = float(sol_p.cost), float(sol_x.cost)
        numerics_ok = bool(
            abs(cost_p - cost_x) <= 0.005 * (abs(cost_x) + 1.0)
            and float(sol_p.prim_res) < 1e-2
        )
    except Exception:
        numerics_ok = False

    # MFU/roofline estimate for the batched solve (VERDICT item 6): count the
    # dominant dense-linear-algebra FLOPs per solve, counted AS IMPLEMENTED
    # (round-2 VERDICT weak #9: the old model charged the inverse at
    # ns·4n³ as if Newton-Schulz ran on the full matrix — the Pallas
    # kernel (ops/spd_inverse._kernel) runs block-LDL with NS only on the
    # nb 128-wide pivot blocks: ~nb·2·ns + nb³ panel matmuls of 2P³ FLOPs,
    # ~10x less). With refactor_every_sqp=False there is ONE factorization
    # per solve; per-ADMM-iteration work is the n² inverse apply + the
    # structured constraint matvecs.
    n, m = cfg.n_vars, cfg.n_con
    nr = int(
        sum(np.prod(s.shape) for s in jax.tree_util.tree_leaves(
            jax.eval_shape(lambda z: F.residuals(cfg, base, z), jnp.zeros(n))
        ))
    )
    P_BLK = 128
    nb = -(-n // P_BLK)  # padded block count
    use_riccati = cfg.kkt_impl in ("riccati", "auto")
    if use_riccati:
        # riccati path (cmpc/riccati.py): per-stage gain matrices replace
        # the dense inverse. Per-apply per-stage reads: K(24x33) KP(24,24)
        # D1(24,24) SW(33,24) VP(24,24) A(9,9) B(9,24) C(9,24) ~ 3.8k
        # floats; factor = T stages of ~12 small (<=33^3) matmuls + the
        # stage jacfwd (57 tangents through the interval step).
        T = cfg.T
        stage_floats = 2 * (24 * 33) + 3 * (24 * 24) + 81 + 2 * (9 * 24)
        flops_per_solve = (
            T * 12 * 2 * 33**3                         # riccati factor
            + 57 * T * 600                             # stage jacobians
            + cfg.sqp_iters * cfg.admm_iters
            * (T * 2 * 2 * stage_floats + 4 * m * (n // 8))
        )
        bytes_per_solve = (
            cfg.sqp_iters * cfg.admm_iters * T * stage_floats * 4
            + T * stage_floats * 4 * 3                 # factor build traffic
        )
    else:
        inv_matmuls = nb * 2 * cfg.ns_iters + nb**3
        flops_per_solve = (
            inv_matmuls * 2 * P_BLK**3            # block-LDL + block-NS inverse
            + 2 * nr * n * n                      # H = JᵀJ
            + cfg.sqp_iters * cfg.admm_iters * (2 * n * n + 4 * m * (n // 8))
        )
        kkt_bytes = 4 if cfg.kkt_dtype == "f32" else 2  # "auto" -> bf16 on TPU
        bytes_per_solve = (
            cfg.sqp_iters * cfg.admm_iters * (nb * P_BLK) ** 2 * kkt_bytes
            + 3 * n * n * 4  # H build + factorization traffic (one pass each)
        )
    model_flops_per_s = flops_per_solve * solves_per_s
    peak = 394e12 if "v5 lite" in str(jax.devices()[0]) else 459e12  # bf16 peak
    mfu = model_flops_per_s / peak
    peak_bw = 819e9 if "v5 lite" in str(jax.devices()[0]) else 1200e9
    bw_util = bytes_per_solve * solves_per_s / peak_bw

    result = {
        "metric": "batched_mpc_solves_per_s",
        "value": round(float(solves_per_s), 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(float(solves_per_s / BASELINE_SOLVES_PER_S), 2),
        "extra": {
            "batch": B,
            "sqp_iters": cfg.sqp_iters,
            "admm_iters": cfg.admm_iters,
            "compile_s": round(compile_s, 1),
            "model_flops_per_solve": int(flops_per_solve),
            "mfu_est": round(float(mfu), 4),
            "hbm_bytes_per_solve": int(bytes_per_solve),
            "hbm_bw_util_est": round(float(bw_util), 4),
            "numerics_ok": numerics_ok,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result), flush=True)
    if not full:
        return

    # ======== extras (CMW_BENCH_FULL=1 only; never printed to stdout) ========
    extra = dict(result)

    # single-solve on-device latency: chain K warm-started solves in one
    # dispatch (receding-horizon shape), divide out the tunnel round-trip.
    # 200 dispatches -> a real p99 (VERDICT item 8).
    K = 10

    def chain(warm, _):
        sol = solver.solve(base, warm)
        return solver.warm_from(base, sol), sol.cost

    chained = jax.jit(lambda w: jax.lax.scan(chain, w, None, length=K)[1])
    w0 = solver.cold_start()
    float(chained(w0).sum())
    lat = []
    for _ in range(200):
        t = time.perf_counter()
        float(chained(w0).sum())
        lat.append((time.perf_counter() - t) / K)
    lat = np.array(lat)
    extra["extra"]["single_solve_p50_ms"] = round(float(np.percentile(lat, 50) * 1e3), 3)
    extra["extra"]["single_solve_p99_ms"] = round(float(np.percentile(lat, 99) * 1e3), 3)
    extra["extra"]["latency_samples"] = len(lat)

    # bf16-KKT throughput option (kkt_dtype="bf16"): halves the dominant HBM
    # traffic; measured trade-off (push boundary -7%, formulation.py) keeps
    # f32 the default — reported as headroom.
    import dataclasses as _dc

    # bf16 is a dense-path knob; force kkt_impl=dense so the measurement
    # stays meaningful under the riccati default
    solver16 = CentroidalMPCSolver(
        _dc.replace(cfg, kkt_dtype="bf16", kkt_impl="dense")
    )

    def chain_b16(warm, _):
        sol = jax.vmap(solver16.solve)(batched_params, warm)
        return jax.vmap(solver16.warm_from)(batched_params, sol), sol.cost

    batched16 = jax.jit(lambda w: jax.lax.scan(chain_b16, w, None, length=KB)[1])
    sync_b(batched16(warm_b))
    t = time.perf_counter()
    for _ in range(reps):
        sync_b(batched16(warm_b))
    extra["extra"]["bf16_kkt_solves_per_s"] = round(
        float(B / ((time.perf_counter() - t) / reps / KB)), 2
    )

    # hardware-numerics sentinel: now computed in the headline (above);
    # the extras just record the raw costs for the file copy.
    extra["extra"]["cost_pallas_vs_xla"] = [round(cost_p, 2), round(cost_x, 2)]

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_EXTRA.json"), "w") as f:
        json.dump(extra, f, indent=1)
    print("full bench extras -> BENCH_EXTRA.json", file=sys.stderr)


if __name__ == "__main__":
    main()
