#!/usr/bin/env python
"""ADMM x-update strategy race on real TPU (VERDICT r3 item 5).

The batched solve's dominant HBM traffic is re-reading each item's
[n, n] KKT inverse on every ADMM iteration (~24x1.3 MB x batch per SQP
iteration). This tool measures, on identical REAL solver data (the
bench.py problem at batch 512):

  xla        — the production path: vmapped qp.admm_solve scan
  fused      — ops/admm_fused.py, matrices VMEM-resident across all
               iterations, exact f32 matmuls
  fused_bf16 — same kernel, loop-invariant matrices + vector operands
               cast to bf16 once per cell (f32 accumulation)
  fused_b2   — bf16x2 Dekker-split matrices (near-f32 matrix operands)

and reports time per (2 SQP x 24 ADMM) block plus max |x - x_ref| /
cost deviation against the f32 XLA reference, so speed and numerics are
judged together.

Usage: python tools/exp_admm.py [--batch 512] [--iters 24] [--reps 10]
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
from cmw_tpu.cmpc.qp import ADMMState, admm_solve, spd_inverse
from cmw_tpu.core import contacts
from cmw_tpu.core.centroidal import pack_state
from cmw_tpu.ops.admm_fused import admm_fused_pallas


def build_problem(cfg, B):
    """Reproduce solver.solve() internals up to the first ADMM call, for a
    batch of B push-perturbed items (the bench.py scenario)."""
    solver = CentroidalMPCSolver(cfg)
    plan = contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=8), cfg.dt)
    stage = contacts.mpc_stage_params(plan, 1.02, cfg.T, cfg.dt, cfg.n_slots)
    N = cfg.N
    com_ref = jnp.asarray([0.0, 0.0, 0.7]) + 0.08 * cfg.dt * jnp.arange(N)[
        :, None
    ] * jnp.asarray([1.0, 0.0, 0.0])
    base = F.MPCParams(
        x0=pack_state(jnp.asarray([0.0, 0.0, 0.7]), jnp.zeros(3), jnp.zeros(3)),
        com_ref=com_ref,
        ang_mom_ref=jnp.zeros((N, 3)),
        stage=stage,
        ext_force=jnp.zeros(3),
        ext_torque=jnp.zeros(3),
    )
    pushes = jnp.zeros((B, 3)).at[:, 1].set(jnp.linspace(-1.0, 1.0, B))
    params_b = jax.vmap(lambda p: base._replace(ext_force=p))(pushes)

    def prep(params):
        warm = solver.cold_start()
        z0 = solver._initial_z(params, warm)
        dtype = z0.dtype
        stage = params.stage
        l, u, rho = F.constraint_bounds(cfg, stage, dtype)
        ata = F.ata_blockdiag(cfg, stage, rho, dtype)
        con_op = F.constraint_op(cfg, stage, dtype)
        matvec = lambda v: F.op_matvec(cfg, con_op, v)
        res_fn = lambda zz: F.residuals(cfg, params, zz)
        r = res_fn(z0)
        J = jax.jacfwd(res_fn)(z0)
        g = J.T @ r
        eye = jnp.eye(cfg.n_vars, dtype=dtype)
        H = J.T @ J + cfg.levenberg * eye
        minv = spd_inverse(H + cfg.admm_sigma * eye + ata)
        q = g - H @ z0
        zc0 = jnp.clip(matvec(z0), l, u)
        y0 = jnp.zeros_like(zc0)
        A_dense = F.constraint_dense(cfg, stage, dtype)
        return minv, A_dense, q, l, u, rho, z0, zc0, y0, con_op

    print("building batched problem data (one-time)...", flush=True)
    out = jax.jit(jax.vmap(prep))(params_b)
    return tuple(jax.block_until_ready(o) for o in out[:9]), out[9]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--sqp", type=int, default=2)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    cfg = ergocub_mpc_config()
    (minv, A, q, l, u, rho, z0, zc0, y0), con_op = build_problem(cfg, args.batch)
    print(
        f"n={cfg.n_vars} m={cfg.n_con} batch={args.batch} "
        f"iters={args.sqp}x{args.iters} device={jax.devices()[0]}",
        flush=True,
    )

    sigma, alpha = cfg.admm_sigma, cfg.admm_alpha

    # --- xla reference ------------------------------------------------------
    def xla_block(minv, q, l, u, rho, z0, zc0, y0, cop):
        matvec = lambda v: F.op_matvec(cfg, cop, v)
        rmatvec = lambda v: F.op_rmatvec(cfg, cop, v)
        st = ADMMState(z0, zc0, y0)
        for _ in range(args.sqp):
            st, _ = admm_solve(
                minv, q, matvec, rmatvec, l, u, rho, st,
                iters=args.iters, sigma=sigma, alpha=alpha,
            )
        return st.x

    xla_fn = jax.jit(
        jax.vmap(xla_block, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0))
    )

    def timed(fn, *a):
        out = jax.block_until_ready(fn(*a))
        _ = float(np.asarray(out).sum())  # tunnel sync
        t = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
            _ = float(np.asarray(jax.block_until_ready(out)).sum())
        return (time.perf_counter() - t) / args.reps, out

    t_xla, x_ref = timed(xla_fn, minv, q, l, u, rho, z0, zc0, y0, con_op)
    print(f"xla        : {t_xla*1e3:8.2f} ms  (reference)", flush=True)

    # --- fused variants -----------------------------------------------------
    interp = jax.default_backend() not in ("tpu",)

    for name, mxu in (("fused", "f32"), ("fused_bf16", "bf16"), ("fused_b2", "bf16x2")):

        def fused_block(minv, A, q, l, u, rho, z0, zc0, y0, _mxu=mxu):
            x, zc, y = z0, zc0, y0
            for _ in range(args.sqp):
                x, zc, y = admm_fused_pallas(
                    minv, A, q, l, u, rho, x, zc, y,
                    iters=args.iters, sigma=sigma, alpha=alpha,
                    interpret=interp, mxu_dtype=_mxu,
                )
            return x

        fn = jax.jit(fused_block)
        try:
            t, x = timed(fn, minv, A, q, l, u, rho, z0, zc0, y0)
        except Exception as e:  # keep the race going on a broken variant
            print(f"{name:<11}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        dx = float(jnp.max(jnp.abs(x - x_ref)))
        rel = float(
            jnp.max(jnp.abs(x - x_ref)) / (jnp.max(jnp.abs(x_ref)) + 1e-9)
        )
        print(
            f"{name:<11}: {t*1e3:8.2f} ms  speedup x{t_xla/t:5.2f}  "
            f"max|dx|={dx:.3e} rel={rel:.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
