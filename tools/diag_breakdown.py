"""Stage-level time breakdown of the batched MPC solve on the current
backend (VERDICT r2 item 4 groundwork): where do the ~120 ms of a
batch-512 solve go?

Times, at batch B:
  - the full solve at (sqp_iters, admm_iters) = (2, 24), (2, 1), (1, 24)
    -> per-ADMM-iteration and per-SQP-iteration marginal costs
  - the KKT inverse alone (Pallas path and XLA path)
  - the Gauss-Newton build (residual jacfwd + JtJ) alone
Run on TPU:  python tools/diag_breakdown.py [--batch 512]
"""
import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cmw_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

from cmw_tpu.cmpc import CentroidalMPCSolver, ergocub_mpc_config
from cmw_tpu.cmpc import formulation as F
from cmw_tpu.cmpc.qp import spd_inverse
from cmw_tpu.core import contacts
from cmw_tpu.core.centroidal import pack_state
from cmw_tpu.cmpc.formulation import MPCParams


def make_params(cfg, plan, t0, push):
    stage = contacts.mpc_stage_params(plan, t0, cfg.T, cfg.dt, cfg.n_slots)
    N = cfg.N
    com_ref = jnp.asarray([0.0, 0.0, 0.7]) + 0.08 * cfg.dt * jnp.arange(N)[
        :, None
    ] * jnp.asarray([1.0, 0.0, 0.0])
    return MPCParams(
        x0=pack_state(jnp.asarray([0.0, 0.0, 0.7]), jnp.zeros(3), jnp.zeros(3)),
        com_ref=com_ref,
        ang_mom_ref=jnp.zeros((N, 3)),
        stage=stage,
        ext_force=push,
        ext_torque=jnp.zeros(3),
    )


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync = float(jax.tree_util.tree_leaves(out)[0].sum())  # tunnel-safe sync
    t = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        sync = float(jax.tree_util.tree_leaves(out)[0].sum())
    del sync
    return (time.perf_counter() - t) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()
    B = args.batch

    base_cfg = ergocub_mpc_config()
    plan = contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=8), base_cfg.dt)

    pushes = jnp.zeros((B, 3)).at[:, 1].set(jnp.linspace(-1.0, 1.0, B))

    def batched_params(cfg):
        base = make_params(cfg, plan, 1.02, jnp.zeros(3))
        return jax.vmap(lambda p: base._replace(ext_force=p))(pushes)

    results = {}
    for name, kw in [
        ("full(2,24)", {}),
        ("sqp2_admm1", dict(admm_iters=1)),
        ("sqp1_admm24", dict(sqp_iters=1)),
        ("sqp1_admm1", dict(sqp_iters=1, admm_iters=1)),
    ]:
        cfg = ergocub_mpc_config(**kw)
        solver = CentroidalMPCSolver(cfg)
        bp = batched_params(cfg)
        warm = jax.vmap(lambda _: solver.cold_start())(jnp.arange(B))
        fn = jax.jit(lambda p, w, s=solver: jax.vmap(s.solve)(p, w).cost)
        dt = timeit(fn, bp, warm)
        results[name] = dt
        print(f"{name:14s}: {dt*1e3:8.2f} ms  ({B/dt:8.0f} solves/s)", flush=True)

    # marginal costs
    admm_iter_ms = (results["full(2,24)"] - results["sqp2_admm1"]) / (2 * 23) * 1e3
    sqp_ms = (results["full(2,24)"] - results["sqp1_admm24"]) * 1e3
    print(f"per-ADMM-iteration: {admm_iter_ms:.3f} ms  (x48 = {admm_iter_ms*48:.1f} ms)")
    print(f"second SQP iteration total: {sqp_ms:.1f} ms")

    # KKT inverse alone
    cfg = ergocub_mpc_config()
    bp = batched_params(cfg)
    solver = CentroidalMPCSolver(cfg)

    def build_kkt(p):
        z0 = jnp.zeros(cfg.n_vars)
        l, u, rho = F.constraint_bounds(cfg, p.stage, jnp.float32)
        ata = F.ata_blockdiag(cfg, p.stage, rho, jnp.float32)
        res_fn = lambda zz: F.residuals(cfg, p, zz)
        J = jax.jacfwd(res_fn)(z0)
        H = J.T @ J + cfg.levenberg * jnp.eye(cfg.n_vars)
        return H + cfg.admm_sigma * jnp.eye(cfg.n_vars) + ata

    kkts = jax.jit(jax.vmap(build_kkt))(bp)
    kkts = jax.block_until_ready(kkts)
    dt_gn = timeit(jax.jit(jax.vmap(build_kkt)), bp)
    print(f"GN build (jacfwd+JtJ+ata): {dt_gn*1e3:8.2f} ms", flush=True)

    from cmw_tpu.ops.spd_inverse import spd_inverse_pallas

    dt_pal = timeit(
        jax.jit(lambda M: spd_inverse_pallas(M, ns_iters=cfg.ns_iters)), kkts
    )
    print(f"KKT inverse (pallas):      {dt_pal*1e3:8.2f} ms", flush=True)
    dt_xla = timeit(jax.jit(jax.vmap(spd_inverse)), kkts)
    print(f"KKT inverse (xla chol):    {dt_xla*1e3:8.2f} ms", flush=True)

    # residual eval + line-search style ops
    z0 = jnp.zeros((B, cfg.n_vars))
    res_b = jax.jit(jax.vmap(lambda p, z: F.residuals(cfg, p, z)))
    dt_res = timeit(res_b, bp, z0)
    print(f"residual eval (batched):   {dt_res*1e3:8.2f} ms", flush=True)

    accounted = dt_gn + dt_pal + 48 * admm_iter_ms / 1e3
    print(
        f"accounted: GN {dt_gn*1e3:.1f} + inv {dt_pal*1e3:.1f} + admm {admm_iter_ms*48:.1f}"
        f" = {accounted*1e3:.1f} ms of {results['full(2,24)']*1e3:.1f} ms"
    )


if __name__ == "__main__":
    main()
