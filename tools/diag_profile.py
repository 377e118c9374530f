"""Stage-level timing of the batched MPC solve on the current backend.

Times, at batch B: (a) GN linearization (jacfwd + J^T J), (b) KKT inverse,
(c) one full solve, (d) solve minus its pieces => ADMM + line-search share.
Used to target kernel work where the microseconds actually are.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import sys
import numpy as np
import jax
import jax.numpy as jnp

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from cmw_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()

from cmw_tpu.cmpc import CentroidalMPCSolver, ergocub_mpc_config
from cmw_tpu.cmpc import formulation as F
from cmw_tpu.core import contacts
from cmw_tpu.core.centroidal import pack_state

B = int(sys.argv[sys.argv.index("-b") + 1]) if "-b" in sys.argv else 512
cfg = ergocub_mpc_config()
solver = CentroidalMPCSolver(cfg)
plan = contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=8), cfg.dt)
stage = contacts.mpc_stage_params(plan, 1.02, cfg.T, cfg.dt, cfg.n_slots)
base = F.MPCParams(
    x0=pack_state(jnp.asarray([0.0, 0.0, 0.7]), jnp.zeros(3), jnp.zeros(3)),
    com_ref=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.7]), (cfg.N, 3)),
    ang_mom_ref=jnp.zeros((cfg.N, 3)),
    stage=stage,
    ext_force=jnp.zeros(3),
    ext_torque=jnp.zeros(3),
)
params = jax.vmap(lambda s: base._replace(ext_force=jnp.zeros(3) + 0 * s))(
    jnp.arange(B, dtype=jnp.float32)
)
warm = jax.vmap(lambda _: solver.cold_start())(jnp.arange(B))
z0 = jax.vmap(lambda p, w: solver._initial_z(p, w))(params, warm)


def timeit(name, fn, *a):
    out = fn(*a)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32)), out
    )
    reps = 5
    t = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32)), out
    )
    dt = (time.perf_counter() - t) / reps
    print(f"{name:28s} {dt*1e3:9.2f} ms   ({B/dt:9.0f} items/s)")
    return dt


def gn_one(p, z):
    res_fn = lambda zz: F.residuals(cfg, p, zz)
    r = res_fn(z)
    J = jax.jacfwd(res_fn)(z)
    return J.T @ r, J.T @ J


def inv_one(H):
    from cmw_tpu.cmpc.qp import spd_inverse
    from cmw_tpu.ops.spd_inverse import spd_inverse_pallas

    if jax.default_backend() == "tpu":
        return spd_inverse_pallas(H[None], ns_iters=cfg.ns_iters)[0]
    return spd_inverse(H)


solve = jax.jit(jax.vmap(solver.solve))
t_solve = timeit("full solve", solve, params, warm)
res = jax.jit(jax.vmap(lambda p, z: F.residuals(cfg, p, z)))
t_res = timeit("residual eval", res, params, z0)
grad = jax.jit(jax.vmap(lambda p, z: jax.grad(lambda zz: 0.5 * jnp.sum(F.residuals(cfg, p, zz) ** 2))(z)))
t_grad = timeit("gradient (reverse)", grad, params, z0)

if cfg.kkt_impl in ("riccati", "auto"):
    from cmw_tpu.cmpc.riccati import riccati_apply, riccati_factor

    lam_sig = cfg.levenberg + cfg.admm_sigma

    def fac_one(p, z):
        _, _, rho = F.constraint_bounds(cfg, p.stage, z.dtype)
        return riccati_factor(cfg, p, z, rho, lam_sig)

    fac_fn = jax.jit(jax.vmap(fac_one))
    facs = fac_fn(params, z0)
    t_fac = timeit("riccati factor", fac_fn, params, z0)

    app = jax.jit(jax.vmap(lambda f, r: riccati_apply(cfg, f, r)))
    rhs = jnp.ones((B, cfg.n_vars), jnp.float32)
    t_app1 = timeit("riccati apply x1", app, facs, rhs)
    n_apply = cfg.sqp_iters * cfg.admm_iters
    print(
        f"{'apply x sqp*admm (scaled)':28s} {t_app1*n_apply*1e3:9.2f} ms   "
        f"(standalone; in-solve fusion is tighter)"
    )
    # line-search machinery per sqp iter: 1 jvp (~2 res) + 1 res + 1 grad
    print(
        f"{'line-search model (~3res+grad)/sqp x2':28s} "
        f"{(3*t_res + t_grad)*cfg.sqp_iters*1e3:9.2f} ms"
    )
else:
    gn = jax.jit(jax.vmap(gn_one))
    g, H = gn(params, z0)
    eye = jnp.eye(cfg.n_vars)
    Hs = H + (cfg.levenberg + cfg.admm_sigma) * eye
    inv = jax.jit(jax.vmap(inv_one))
    t_gn = timeit("GN linearize (jacfwd+JtJ)", gn, params, z0)
    t_inv = timeit("KKT inverse", inv, Hs)
    print(f"{'rest (ADMM+merit+unpack)':28s} {max(t_solve - t_gn - t_inv - t_grad, 0)*1e3:9.2f} ms")
