"""Measure Pallas SPD-inverse error on a real walking KKT matrix (TPU).

Prints ||I - M X||_inf for the XLA cholesky path and for the Pallas
block-LDL kernel at several Newton-Schulz iteration counts, plus the
effect of full-matrix NS polish steps. Reference numbers on v5e:
xla 3e-6; pallas ns=8 5e-2 (NOT converged), ns=12 2e-6 (converged).
Run this on real hardware whenever ops/spd_inverse.py or the ADMM rho
structure changes — interpret-mode tests cannot see TPU numerics.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cmw_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()

from cmw_tpu.cmpc import formulation as F
from cmw_tpu.cmpc.qp import spd_inverse
from cmw_tpu.cmpc.solver import CentroidalMPCSolver
from cmw_tpu.core import contacts
from cmw_tpu.core.centroidal import pack_state
from cmw_tpu.ops.spd_inverse import spd_inverse_pallas

cfg = F.ergocub_mpc_config()
plan = contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=8), cfg.dt)
stage = contacts.mpc_stage_params(plan, 1.02, cfg.T, cfg.dt, cfg.n_slots)
params = F.MPCParams(
    x0=pack_state(jnp.asarray([0.0, 0.0, 0.7]), jnp.zeros(3), jnp.zeros(3)),
    com_ref=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.7]), (cfg.N, 3)),
    ang_mom_ref=jnp.zeros((cfg.N, 3)),
    stage=stage,
    ext_force=jnp.zeros(3),
    ext_torque=jnp.zeros(3),
)

solver = CentroidalMPCSolver(cfg)
z0 = solver._initial_z(params, solver.cold_start())
res_fn = lambda zz: F.residuals(cfg, params, zz)
J = jax.jacfwd(res_fn)(z0)
eye = jnp.eye(cfg.n_vars, dtype=jnp.float32)
l, u, rho = F.constraint_bounds(cfg, stage, jnp.float32)
ata = F.ata_blockdiag(cfg, stage, rho, jnp.float32)
M = J.T @ J + cfg.levenberg * eye + cfg.admm_sigma * eye + ata

Mn = np.asarray(M, np.float64)
print("n =", M.shape, " cond =", f"{np.linalg.cond(Mn):.3e}",
      " diag range:", float(Mn.diagonal().min()), float(Mn.diagonal().max()))

def err(X):
    X = np.asarray(X, np.float64)
    R = np.eye(Mn.shape[0]) - Mn @ X
    return float(np.abs(R).max())

Xx = spd_inverse(M)
print("xla cholesky         err:", f"{err(Xx):.3e}")

for ns in (8, 12, 16):
    for tail in (3, 6):
        if tail > ns: continue
        Xp = spd_inverse_pallas(M[None], ns_iters=ns, f32_tail=tail)[0]
        e0 = err(Xp)
        # full-matrix NS polish in plain f32 JAX
        Xp1 = Xp @ (2.0 * eye - M @ Xp)
        Xp2 = Xp1 @ (2.0 * eye - M @ Xp1)
        print(f"pallas ns={ns} tail={tail} err: {e0:.3e}  polished1: {err(Xp1):.3e}  polished2: {err(Xp2):.3e}")
