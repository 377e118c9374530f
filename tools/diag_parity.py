"""Diagnose the full-horizon parity gap (VERDICT r2 item 3): per-knot
CoM-z difference between the JAX GN-SQP and the f64 SLSQP oracle on the
T=20 walking problem, as a function of solver iteration budget.

Prints, for each (sqp_iters, admm_iters) setting: cost vs oracle cost,
max |z - z_oracle| and its knot index, and the curvature-implied z
tolerance per knot (how far z can move while changing the cost by no more
than the solvers' cost agreement).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(_sys.argv[0]))))
_os.environ["XLA_FLAGS"] = (
    _os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from cmw_tpu.cmpc import CentroidalMPCSolver, ergocub_mpc_config
from cmw_tpu.cmpc import oracle
from cmw_tpu.core import contacts

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(_sys.argv[0])), "..", "tests"))
from test_cmpc import make_params  # noqa: E402


def main():
    cfg0 = ergocub_mpc_config()
    plan = contacts.snap_to_grid(contacts.make_alternating_gait(n_steps=10), cfg0.dt)

    def params_for(cfg):
        p = make_params(cfg, plan, 1.02, [0.0, 0.0, 0.7], com_ref_xy_drift=0.08)
        return p._replace(ext_force=jnp.asarray([0.0, 1.0, 0.0]))

    # oracle once
    cfg_o = ergocub_mpc_config()
    p_o = params_for(cfg_o)
    z_o, c_o, res = oracle.solve_oracle(cfg_o, p_o)
    print(f"oracle: cost={c_o:.6f} status={res.status} nit={res.nit}", flush=True)
    Fo, Po = oracle._unpack(cfg_o, z_o)
    Xo = oracle.rollout_np(cfg_o, p_o, Fo, Po)

    for si, ai in [(10, 150), (20, 300), (40, 600)]:
        cfg = ergocub_mpc_config(sqp_iters=si, admm_iters=ai)
        solver = CentroidalMPCSolver(cfg)
        p = params_for(cfg)
        sol = solver.solve(p, solver.cold_start())
        z = np.asarray(sol.states[:, 2])
        dz = np.abs(z - Xo[:, 2])
        print(
            f"sqp={si:3d} admm={ai:3d}: cost={float(sol.cost):.6f} "
            f"dcost={(float(sol.cost) - c_o):+.3e} prim={float(sol.prim_res):.2e} "
            f"max|dz|={dz.max()*1e3:.2f}mm @knot {int(dz.argmax())} "
            f"n>2mm={int((dz > 2e-3).sum())} "
            f"dxy={np.abs(np.asarray(sol.states[:, 0:2]) - Xo[:, 0:2]).max()*1e3:.1f}mm",
            flush=True,
        )
        dP = np.abs(np.asarray(sol.positions) - Po).max()
        print(f"   max|dP|={dP*1e3:.2f}mm  per-knot dz[mm]: "
              + " ".join(f"{v*1e3:.1f}" for v in dz), flush=True)


if __name__ == "__main__":
    main()
